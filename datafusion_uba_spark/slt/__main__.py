"""CLI for the sqllogictest runner — the conformance loop as a command,
mirroring the reference's test binary (tests/sqllogictests/src/main.rs:
file args + `--complete` to regenerate expected blocks in place).

    python -m datafusion_uba_spark.slt FILE [FILE...]
    python -m datafusion_uba_spark.slt --complete FILE

Exit code 0 iff every query in every file matched (or, in complete
mode, every file was rewritten successfully).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m datafusion_uba_spark.slt",
        description="Run .slt conformance files against the Spark engine",
    )
    ap.add_argument("files", nargs="+", help=".slt files to run")
    ap.add_argument(
        "--complete",
        action="store_true",
        help="regenerate expected result blocks in place (reference "
        "main.rs --complete)",
    )
    ap.add_argument(
        "--cpus", type=int, default=4, help="local[] parallelism (default 4)"
    )
    ap.add_argument(
        "--engine",
        choices=("spark", "duckdb"),
        default="spark",
        help="engine to run against: the Spark engine (default) or the "
        "alternate DuckDB conformance engine — the reference's "
        "PG_COMPAT=true switch for pg_compat_*.slt scripts "
        "(tests/sqllogictests/README.md:112-140)",
    )
    args = ap.parse_args(argv)

    from datafusion_uba_spark.slt.runner import DuckDBEngine, run_file

    spark = None
    engine = None
    if args.engine == "duckdb":
        engine = DuckDBEngine()
    else:
        from datafusion_uba_spark.session import get_spark

        spark = get_spark(
            app_name="uba-slt", cpus=args.cpus, shuffle_partitions=args.cpus
        )
    rc = 0
    for path in args.files:
        if args.complete:
            # run_file rewrites the file in place in complete mode
            run_file(spark, path, complete=True, engine=engine)
            print(f"completed: {path}")
        else:
            failures = run_file(spark, path, engine=engine)
            for f in failures:
                print(f"{path}:{f.line}: {f.sql}\n{f.message}\n")
            status = "ok" if not failures else f"{len(failures)} FAILED"
            print(f"{path}: {status}")
            if failures:
                rc = 1
    if spark is not None:
        spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
