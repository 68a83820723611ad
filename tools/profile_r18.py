"""Per-query profiler for the r18 optimization round (guide §1).

For each named registry row (or the TOP slowest from a BENCH_RUNS.json),
in ONE session:
  - untimed warmup execution,
  - N timed reps split into CONSTRUCTION time (the ``fns[name](spark,
    sf_dir)`` call — eager work: injectivity proofs, localCheckpoint
    fixpoints, index builds) and EXECUTION time (the noop write),
  - Spark job count per rep (statusTracker delta) — the "how many
    sequential job barriers does this row pay" number,
  - ``explain("formatted")`` dumped to plans/r18/<name>_<tag>.txt.

Usage:
    python tools/profile_r18.py [--tag before] [--top N | name ...]

Writes a JSON summary to /tmp/profile_r18_<tag>.json and prints a
sorted table to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    top_n = 0
    if "--top" in args:
        i = args.index("--top")
        top_n = int(args[i + 1])
        del args[i : i + 2]
    reps = int(os.environ.get("PROFILE_REPS", "2"))

    from datafusion_uba_spark.queries import queries
    from datafusion_uba_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    fns = queries()
    names = args
    if top_n:
        with open(os.path.join(REPO, "BENCH_RUNS.json")) as f:
            best = json.load(f)["best"]
        names = [
            n for n, _ in sorted(best.items(), key=lambda kv: -kv[1])[:top_n]
        ]
    if not names:
        print("no queries named", file=sys.stderr)
        return

    spark = get_spark(app_name="uba-profile")
    sc = spark.sparkContext
    # JVM/codegen + python-worker warmup (mirrors bench.py)
    spark.range(1_000_000).selectExpr("sum(id) AS s").write.format(
        "noop"
    ).mode("overwrite").save()

    plans_dir = os.path.join(REPO, "plans", "r18")
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        if name not in fns:
            print(f"unknown query {name!r}", file=sys.stderr)
            continue
        sc.setJobDescription(f"profile:{name}")
        try:
            df = fns[name](spark, sf_dir)  # warmup (also builds plan)
            df.write.format("noop").mode("overwrite").save()
            plan_txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(plans_dir, f"{name}_{tag}.txt"), "w"
            ) as f:
                f.write(plan_txt)
            construct, execute, jobs = [], [], []
            for _ in range(reps):
                j0 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
                t0 = time.perf_counter()
                df = fns[name](spark, sf_dir)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                j1 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
                construct.append(round(t1 - t0, 4))
                execute.append(round(t2 - t1, 4))
                jobs.append(j1 - j0)
            out[name] = {
                "construct_best": min(construct),
                "execute_best": min(execute),
                "total_best": min(
                    c + e for c, e in zip(construct, execute)
                ),
                "construct": construct,
                "execute": execute,
                "jobs_per_rep": jobs,
            }
            import gc

            gc.collect()
        except Exception as exc:
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
            print(f"profile: {name} failed: {exc}", file=sys.stderr)
        finally:
            sc.setJobDescription(None)

    path = f"/tmp/profile_r18_{tag}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    rows = sorted(
        (
            (v.get("total_best", 99), n, v)
            for n, v in out.items()
        ),
        reverse=True,
    )
    print(f"\n{'total':>7} {'constr':>7} {'exec':>7} {'jobs':>5}  name",
          file=sys.stderr)
    for tot, n, v in rows:
        if "error" in v:
            print(f"{'ERR':>7} {n}: {v['error']}", file=sys.stderr)
            continue
        print(
            f"{tot:7.2f} {v['construct_best']:7.2f} "
            f"{v['execute_best']:7.2f} {min(v['jobs_per_rep']):5d}  {n}",
            file=sys.stderr,
        )
    print(f"profile written to {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
