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
    args = ap.parse_args(argv)

    from datafusion_uba_spark.session import get_spark
    from datafusion_uba_spark.slt.runner import run_file

    spark = get_spark(
        app_name="uba-slt", cpus=args.cpus, shuffle_partitions=args.cpus
    )
    rc = 0
    for path in args.files:
        if args.complete:
            failures, completed = run_file(spark, path, complete=True)
            with open(path, "w") as fh:
                fh.write(completed)
            print(f"completed: {path}")
        else:
            failures = run_file(spark, path)
            for f in failures:
                print(f"{path}:{f.line}: {f.sql}\n{f.message}\n")
            status = "ok" if not failures else f"{len(failures)} FAILED"
            print(f"{path}: {status}")
            if failures:
                rc = 1
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
