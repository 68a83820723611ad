"""Stage-level profiler for the r18 optimization round (guide §1/§7.1).

Runs ONE registry query in a session with the UI enabled, then pulls
per-stage metrics (executor run time, shuffle read/write bytes, task
count, name) from the UI REST API — the "which operator is the time
going to" answer that wall-clock per query cannot give.

Usage:
    python tools/stageprof_r18.py <query> [<query> ...]

Prints, per query, the stages of its timed execution sorted by executor
run time, with shuffle bytes.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: stageprof_r18.py <query> ...", file=sys.stderr)
        return

    from datafusion_uba_spark.queries import queries
    from datafusion_uba_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="uba-stageprof",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"},
    )
    fns = queries()
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id) AS s").write.format(
        "noop"
    ).mode("overwrite").save()
    app_id = sc.applicationId
    base = f"http://localhost:4099/api/v1/applications/{app_id}"

    def stages_snapshot() -> dict[int, dict]:
        with urllib.request.urlopen(f"{base}/stages?status=complete") as r:
            data = json.loads(r.read())
        return {s["stageId"]: s for s in data}

    for name in names:
        if name not in fns:
            print(f"unknown query {name!r}", file=sys.stderr)
            continue
        # warmup (plan/codegen/persist prime)
        df = fns[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        before = stages_snapshot()
        sc.setJobDescription(f"stageprof:{name}")
        t0 = time.perf_counter()
        tc0 = time.perf_counter()
        df = fns[name](spark, sf_dir)
        tc1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t1 = time.perf_counter()
        sc.setJobDescription(None)
        time.sleep(0.5)
        after = stages_snapshot()
        new = [s for sid, s in after.items() if sid not in before]
        new.sort(key=lambda s: -s.get("executorRunTime", 0))
        print(
            f"\n=== {name}: wall {t1 - t0:.2f}s "
            f"(construct {tc1 - tc0:.2f}s), {len(new)} stages"
        )
        print(
            f"{'runtime_s':>9} {'cpu_s':>7} {'tasks':>5} {'sh_read':>9} "
            f"{'sh_write':>9} {'input':>9}  name"
        )
        for s in new[:18]:
            rt = s.get("executorRunTime", 0) / 1000.0
            cpu = s.get("executorCpuTime", 0) / 1e9
            print(
                f"{rt:9.2f} {cpu:7.2f} {s.get('numCompleteTasks', 0):5d} "
                f"{s.get('shuffleReadBytes', 0):9d} "
                f"{s.get('shuffleWriteBytes', 0):9d} "
                f"{s.get('inputBytes', 0):9d}  "
                f"{s.get('name', '')[:90]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
