"""Benchmark harness: times every registry query end-to-end.

Prints exactly ONE compact JSON line on stdout:

    {"metric": "registry_total_wall", "value": <sec>, "unit": "sec",
     "queries": {"<name>": <sec>, ...}, "nqueries": N,
     "detail": "BENCH_RUNS.json", "sf": <float>, "contended": bool}

``contended`` summarizes a host-contention snapshot taken before the
Spark session starts (full detail in the sidecar's "contention" key:
load averages, process count, available memory) — see
_contention_sentinel for the rule and why (r15: an 18% driver-vs-local
headline gap was unattributable from the artifacts alone).

The stdout line is kept deliberately small: the driver captures only a
short (~2 KB) tail of stdout, and round 6's line — which carried the
per-rep ``runs`` arrays — outgrew that capture and left the bench gate
with no machine-readable number despite a clean run. Round 8's line
was back to 1,821/1,900 bytes purely from registry growth, so since
round 9 the inline ``queries`` map holds only the slowest-12 queries
(bounded size at ANY registry count); ``value`` is still the total
over all ``nqueries`` rows. The complete per-query detail (best-of,
all repetitions, medians, error messages) goes to the sidecar file
``BENCH_RUNS.json`` next to this script (gitignored — the driver
regenerates it per round; BENCH_r{N}.json is the committed record) and
is echoed to stderr.

Config via env:
    SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    local[] parallelism (default 32)
    BENCH_REPEAT        timed repetitions per query, best-of (default 3:
                        one-time costs — parser/analyzer warmup, janino
                        codegen compiles, broadcast builds — otherwise
                        land on whichever query pays them first; and the
                        shared host shows multi-second contention spikes
                        (measured: a 7.5 s query's first rep at 51 s),
                        so two reps can BOTH be outliers — three keeps
                        the min representative)
    BENCH_WARMUP        UNTIMED executions per query before the timed
                        reps (default 1). The r11 verdict flagged the
                        multimodal MEDIANS as fake 5-8x regressions:
                        deep into a 165-query run the first execution
                        of a mapInPandas-heavy plan pays bench-CONTEXT
                        costs (GC of 40+ prior queries' state, python
                        worker pool churn) that an isolated run never
                        shows — measured 47.2 s in-bench first rep vs
                        3.9 s isolated first rep vs 1.3 s steady for
                        the same query. A session-start worker-pool
                        warmup does not fix it (it is not import cost),
                        so the standard warmup-then-measure discipline
                        applies per query: the cold execution runs
                        unrecorded, and best/median summarize only
                        post-warm reps.
    BENCH_ISOLATED      how many of the slowest rows get a fresh-JVM
                        isolated rerun after the sweep (default 5;
                        0 disables). Recorded in the sidecar under
                        "isolated" — diagnosis only, never the
                        headline (see below).

Sweep-order randomization (r13 verdict item 2): per-query warmup + gc
were NOT enough — a query whose reps all run at the same position in
the sweep inherits that position's JVM context (GC debt, block-store
state from the specific neighbors before it), so ALL its reps can be
inflated together and best-of-3 still lies (r13: asof_view_value
7.0 s in-bench vs 1.9 s isolated; r12: training_mix, ann_recall_lsh;
r11: image rows). Since r14 the timed reps are organized as REPEAT
full passes over the registry, each pass in a different
deterministically-seeded shuffle, and per-query best is the min
ACROSS passes — every query sees `repeat` different neighbor
contexts, so one bad neighborhood can no longer inflate all of a
query's reps. The warmup executions remain a leading untimed pass in
registry order.

Decision rule for calling per-query drift REAL (tools/
BENCH_NOTES_r14.md): a row regressed only if (a) its cross-pass best
moved ≥1.5x vs the prior round AND (b) its fresh-JVM isolated best
(sidecar "isolated", top-BENCH_ISOLATED rows) confirms the move.
Sweep-only movement is bench context, not code.

Each query is materialized with a noop-format write: the full plan
executes on the executors (no column pruning shortcut as with count(),
no driver collect bottleneck) — the same measurement you would take on
a real cluster.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _py_worker_warmup(batches):
    """Noop mapInPandas body: forces each Python worker to fork and
    pay the numpy import before any timed query runs."""
    import numpy as np  # noqa: F401 — the import IS the warmup

    yield from batches


def _contention_sentinel() -> dict:
    """Host-contention snapshot taken BEFORE the Spark session starts
    (so our own JVM contributes ~nothing): 1/5/15-min load averages,
    co-resident process count, and available memory. Recorded in the
    sidecar and summarized as a one-bit ``contended`` flag on the
    headline, so a driver-run vs builder-run headline gap (r15: 200.2 s
    driver vs 170.1 s builder final, 18% with no way to attribute it
    from the artifact) is diagnosable from the artifact instead of
    argued from variance rules.

    ``contended`` is deliberately conservative: load1 >= 25% of the
    cpus this bench is about to use means multi-core-seconds of OTHER
    work were running in the minute before the sweep — enough to
    inflate wall times on a shared host. Memory pressure flags below
    8 GiB available (a 32-thread local JVM + 32 python workers thrash
    well above that)."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out: dict = {"cpus": cpus}
    try:
        la1, la5, la15 = os.getloadavg()
        out["load_avg"] = [round(la1, 2), round(la5, 2), round(la15, 2)]
    except OSError:  # pragma: no cover - non-unix
        la1 = 0.0
    try:
        out["n_processes"] = sum(
            1 for p in os.listdir("/proc") if p.isdigit()
        )
    except OSError:  # pragma: no cover - non-linux
        out["n_processes"] = None
    mem_kb = None
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    mem_kb = int(line.split()[1])
                    break
    except OSError:  # pragma: no cover - non-linux
        pass
    out["mem_available_kb"] = mem_kb
    out["contended"] = bool(
        la1 >= 0.25 * cpus
        or (mem_kb is not None and mem_kb < 8 * 1024 * 1024)
    )
    return out


def build_artifacts(
    per_query: dict[str, float],
    per_runs: dict[str, list[float]],
    errors: dict[str, str],
    repeat: int,
    sf: float,
    warmup: int = 1,
    isolated: dict | None = None,
    sentinel: dict | None = None,
) -> tuple[dict, dict]:
    """Split results into (headline, sidecar).

    The headline is the single stdout JSON line the driver parses; it
    must stay well under the driver's ~2 KB stdout tail capture, so it
    carries only the best-of seconds per query. Everything bulky (all
    repetitions, error messages) goes to the sidecar.
    """
    # 3 decimals (1 ms) per query on the stdout line: the 4th decimal
    # is below measurement noise, and the driver's tail capture is a
    # hard byte budget — rounding here (not in main) keeps the
    # size-guard test measuring the real serialized widths
    rounded = {n: round(v, 3) for n, v in per_query.items()}
    # The stdout headline must stay under the driver's ~2 KB tail
    # capture FOREVER, at any registry size (r8 verdict: 1,821/1,900
    # bytes at 75 rows left ~3 rows of headroom). It therefore carries
    # only the slowest-K queries — the ones a perf reader looks at
    # first — and the full per-query map rides in the sidecar
    # (BENCH_RUNS.json next to this script; gitignored — the driver
    # regenerates it per round). K=12 keeps the line < 1 KB at any
    # per-query cost.
    slowest = dict(
        sorted(rounded.items(), key=lambda kv: (-kv[1], kv[0]))[:12]
    )
    headline = {
        "metric": "registry_total_wall",
        # sum over the ROUNDED per-query values for ALL queries, so
        # value still means total registry wall even though only the
        # slowest-K appear inline
        "value": round(sum(rounded.values()), 4),
        "unit": "sec",
        "queries": slowest,
        "nqueries": len(rounded),
        "detail": "BENCH_RUNS.json",
        "sf": sf,
    }
    if sentinel is not None:
        # one bit on the headline (byte budget!); the full snapshot
        # (load averages, process count, memory) rides in the sidecar
        headline["contended"] = sentinel.get("contended", False)
    if errors:
        # keep the headline parseable even on failures: a BOUNDED list
        # of names (a mass failure — e.g. a broken sf dir failing every
        # row — must not push the line past the driver's ~2 KB tail
        # capture, exactly when diagnosis matters most; r9 advice), the
        # total count, and full messages in the sidecar's errors map
        headline["failed"] = sorted(errors)[:8]
        headline["nfailed"] = len(errors)
    # median alongside min: on a shared host with multi-second
    # contention spikes, min is the truest plan cost but median shows
    # whether a spike landed (r6 verdict item #2)
    # skip empty run lists (BENCH_REPEAT=0, or a query that errored in
    # every pass) — an unguarded sorted([])[0] would lose the whole
    # artifact exactly when diagnosis matters most
    medians = {
        name: sorted(runs)[len(runs) // 2]
        for name, runs in per_runs.items()
        if runs
    }
    sidecar = {
        "best": rounded,  # the full per-query map the headline elides
        "runs": per_runs,
        "median": medians,
        "errors": errors,
        "repeat": repeat,
        "warmup": warmup,
        "sf": sf,
    }
    if isolated is not None:
        # Fresh-JVM reruns of the slowest rows: the drift adjudicator.
        # Diagnosis only — the headline stays sweep-derived so rounds
        # remain comparable; a per-row "regression" is real only if
        # this map confirms it (decision rule in the module docstring).
        sidecar["isolated"] = isolated
    if sentinel is not None:
        sidecar["contention"] = sentinel
    return headline, sidecar


def _isolated_main(names: list[str], sf_dir: str) -> None:
    """Child-process mode: time the named registry rows in THIS fresh
    JVM (warmup 1 + best-of-2), print one JSON line {name: [runs]}.
    Invoked by the parent sweep via `bench.py --isolated name1 name2`
    (space-separated argv) so the measurements carry none of the
    180-query sweep's JVM context."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from datafusion_uba_spark.queries import queries
    from datafusion_uba_spark.session import get_spark

    spark = get_spark(app_name="uba-bench-isolated")
    fns = queries()
    out: dict[str, list[float]] = {}
    for name in names:
        try:
            _materialize(fns[name](spark, sf_dir))  # untimed warmup
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                _materialize(fns[name](spark, sf_dir))
                runs.append(round(time.perf_counter() - t0, 4))
            out[name] = runs
        except Exception as exc:  # keep the batch alive
            print(f"isolated: {name} failed: {exc}", file=sys.stderr)
    print(json.dumps(out), flush=True)
    spark.stop()


def _run_isolated_reruns(
    per_query: dict[str, float], sf_dir: str, top_n: int
) -> dict | None:
    """Fork a fresh python+JVM and rerun the top_n slowest rows there
    plus the BENCH_ISOLATED_EXTRA rows (see below);
    return {name: {sweep_best, isolated_best, runs, ratio}}."""
    import subprocess

    top = [
        n
        for n, _ in sorted(per_query.items(), key=lambda kv: -kv[1])[:top_n]
    ]
    # BENCH_ISOLATED_EXTRA (r18 verdict item 8): the top-N window can
    # miss exactly the rows whose sweep numbers are DISPUTED (r18: the
    # contended run put dedup_containment and training_mix just outside
    # the top-5 in the round they regressed, so the adjudicating
    # isolated numbers were never captured). A comma-separated env list
    # adds named rows to the isolated rerun — additive and
    # sidecar-only, the headline stays sweep-derived so rounds remain
    # comparable. Defaults to the r18 perf-weak set so a plain driver
    # run records the adjudicating numbers without any env setup.
    extra_env = os.environ.get(
        "BENCH_ISOLATED_EXTRA",
        "dedup_containment,dedup_threshold_sweep,training_mix,"
        "dedup_semantic",
    )
    for name in extra_env.split(","):
        name = name.strip()
        if name and name in per_query and name not in top:
            top.append(name)
    if not top:
        return None
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--isolated"] + top,
            capture_output=True,
            text=True,
            timeout=1800,
            env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
        )
    except (subprocess.TimeoutExpired, OSError) as exc:
        # diagnosis-only step: a hung/slow child must never discard
        # the sweep's results (the headline is sweep-derived)
        print(f"bench: isolated rerun aborted: {exc}", file=sys.stderr)
        return None
    try:
        raw = json.loads(proc.stdout.strip().splitlines()[-1])
    except (IndexError, json.JSONDecodeError):
        print(
            f"bench: isolated rerun unparseable (rc={proc.returncode}): "
            f"{proc.stderr[-300:]}",
            file=sys.stderr,
        )
        return None
    out = {}
    for name, runs in raw.items():
        best = min(runs)
        out[name] = {
            "sweep_best": per_query[name],
            "isolated_best": best,
            "runs": runs,
            "sweep_over_isolated": round(per_query[name] / best, 2)
            if best > 0
            else None,
        }
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("BENCH_REPEAT", "3"))
    warmup = int(os.environ.get("BENCH_WARMUP", "1"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from datafusion_uba_spark.queries import queries
    from datafusion_uba_spark.session import get_spark

    # snapshot host contention BEFORE the session starts (our own JVM
    # must not count against the sentinel)
    sentinel = _contention_sentinel()
    print(f"bench: contention sentinel {sentinel}", file=sys.stderr)

    spark = get_spark(app_name="uba-bench")
    # JVM/codegen warmup on a trivial plan so q1 isn't charged for it
    _materialize(spark.range(1_000_000).selectExpr("sum(id) AS s"))
    # Python-worker-pool warmup: fork the 32 workers and pay the numpy
    # import before any timed query. NOTE (r12 A/B,
    # tools/BENCH_NOTES_r12.md): this alone does NOT fix the multimodal
    # first-rep penalty — that cost is bench-context (query #40+ state,
    # GC, pool churn), which the per-query BENCH_WARMUP rep absorbs —
    # but it keeps the import cost off whichever query runs first.
    _materialize(
        spark.range(0, 1 << 14, 1, 64).mapInPandas(
            _py_worker_warmup, "id long"
        )
    )

    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0

    import gc
    import random

    fns = queries()
    names = list(fns)
    per_runs: dict[str, list[float]] = {n: [] for n in names}
    errors: dict[str, str] = {}

    def _run_one(name: str, timed: bool) -> None:
        # Per-query isolation: one failing query must not blank the
        # whole artifact — record its error and stop re-running it.
        if name in errors:
            return
        try:
            t0 = time.perf_counter()
            _materialize(fns[name](spark, sf_dir))
            if timed:
                per_runs[name].append(round(time.perf_counter() - t0, 4))
            # Release this query's driver-side references so the
            # ContextCleaner can evict its localCheckpoint blocks and
            # broadcasts before the next query runs. Without it the
            # block store accumulates ~160 queries of dead checkpoint
            # state and the Arrow/mapInPandas rows measured 2-5x their
            # isolated cost late in the run (tools/BENCH_NOTES_r12.md:
            # image_resize_stats 6.65 s in-bench vs 1.3 s isolated).
            gc.collect()
        except Exception as exc:
            msg = f"{type(exc).__name__}: {exc}"
            errors[name] = msg[:500]
            per_runs.pop(name, None)
            print(f"bench: query {name!r} failed: {msg}", file=sys.stderr)

    # Untimed warmup pass(es) in registry order (see BENCH_WARMUP).
    for _ in range(warmup):
        for name in names:
            _run_one(name, timed=False)
    # REPEAT timed passes, each in a different seeded shuffle, so
    # every query's reps sample `repeat` DIFFERENT neighbor contexts
    # (see module docstring: sweep-order randomization). Seeds are
    # fixed — the schedule is reproducible run-to-run.
    for p in range(repeat):
        order = names[:]
        random.Random(1009 + p).shuffle(order)
        for name in order:
            _run_one(name, timed=True)

    per_query = {n: min(r) for n, r in per_runs.items() if r}

    # Stop the parent session BEFORE the fresh-JVM reruns: a resident
    # local-mode JVM warmed by 180 queries x 4 executions would page/GC
    # against the child whose isolation is the whole point. Nothing
    # after the sweep needs the parent session.
    spark.stop()

    top_n = int(os.environ.get("BENCH_ISOLATED", "5"))
    isolated = (
        _run_isolated_reruns(per_query, sf_dir, top_n) if top_n > 0 else None
    )
    if isolated:
        for name, d in isolated.items():
            print(
                f"bench: isolated {name}: sweep {d['sweep_best']}s vs "
                f"fresh-JVM {d['isolated_best']}s "
                f"(x{d['sweep_over_isolated']})",
                file=sys.stderr,
            )

    out, sidecar = build_artifacts(
        per_query,
        per_runs,
        errors,
        repeat,
        sf,
        warmup,
        isolated=isolated,
        sentinel=sentinel,
    )
    sidecar_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_RUNS.json"
    )
    with open(sidecar_path, "w") as f:
        json.dump(sidecar, f, indent=1)
    print(f"bench: per-rep detail written to {sidecar_path}", file=sys.stderr)
    print(json.dumps(sidecar), file=sys.stderr, flush=True)
    # compact separators: every byte of the stdout line counts against
    # the driver's ~2 KB tail capture (round-6 regression)
    print(json.dumps(out, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    if "--isolated" in sys.argv:
        _names = sys.argv[sys.argv.index("--isolated") + 1 :]
        _isolated_main(
            _names,
            os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        )
    else:
        main()
