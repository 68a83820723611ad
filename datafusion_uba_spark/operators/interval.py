"""Range (interval-containment) join — points to enclosing intervals —
composed from built-ins as a bucketized equi-join.

Spark accepts ``l.ts BETWEEN r.start AND r.end`` as a join condition,
but with no equi-key component it plans a BroadcastNestedLoopJoin —
O(|L|·|R|) and a driver OOM once the right side outgrows the
broadcast limit. The scale-safe composition:

1. Pick a bucket width W. Each interval explodes to one row per
   covered bucket (``sequence(start div W, end div W)``); each point
   maps to exactly ONE bucket (``ts div W``).
2. Equi-join on (key..., bucket) — a plain hash shuffle join that
   AQE can size and skew-split like any other.
3. Re-check the exact BETWEEN predicate on the survivors.

Because a point owns exactly one bucket, every qualifying (point,
interval) pair meets in exactly one bucket — no dedup step. Join work
is |L| + |R|·(avg_span/W + 1) rows; choose W near the typical interval
span so intervals explode to O(1) buckets. This is the same binning
strategy DuckDB's IEJoin-less engines and Spark's own
`spark.sql.join.rangeJoin` hints (Databricks) use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner-join each point row to every interval row (same key) whose
    ``[start_col, end_col]`` contains ``point_ts`` — inclusive both
    ends; timestamps must be NON-NEGATIVE integers (epoch micros by
    convention: integer division is truncation, which only equals
    floor-bucketing for non-negative values).

    Output: all point columns + the interval's non-key columns.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    keys = [on] if isinstance(on, str) else list(on)
    from datafusion_uba_spark.operators.asof import _check_reserved

    _check_reserved(points, ("__bucket", "__ivl"))
    _check_reserved(intervals, ("__bucket", "__ivl"))

    ivl_payload = [c for c in intervals.columns if c not in keys]
    # drop malformed intervals (end < start) BEFORE the bucket
    # sequence: Spark's sequence(a, b) with b < a counts DOWN with a
    # default step of -1, so one bad row would silently explode into
    # (start-end)/W bucket rows that only the exact recheck removes —
    # and a far-negative end could blow up row counts instead of
    # erroring. An empty match set is the correct output for them.
    intervals = intervals.where(F.col(end_col) >= F.col(start_col))
    ivl = intervals.select(
        *keys,
        F.struct(*ivl_payload).alias("__ivl"),
        F.explode(
            F.sequence(
                F.expr(f"`{start_col}` DIV {bucket_width}"),
                F.expr(f"`{end_col}` DIV {bucket_width}"),
            )
        ).alias("__bucket"),
    )
    pts = points.withColumn(
        "__bucket", F.expr(f"`{point_ts}` DIV {bucket_width}")
    )
    contained = (F.col(point_ts) >= F.col(f"__ivl.{start_col}")) & (
        F.col(point_ts) <= F.col(f"__ivl.{end_col}")
    )
    return (
        pts.join(ivl, [*keys, "__bucket"])
        .where(contained)
        .select(
            *points.columns,
            *[F.col(f"__ivl.{c}").alias(c) for c in ivl_payload],
        )
    )


def merge_intervals(
    df: DataFrame,
    key_col: str = "key",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Merge overlapping/touching intervals per key into maximal
    islands — the classic gaps-and-islands reduction behind coverage
    metrics (ad viewability, on-call coverage, machine uptime):
    half-open [start, end) intervals that overlap OR touch
    (next.start <= current max end) fuse; the output is the disjoint
    island set.

    Plan: one key-partition sort; island ids come from a running max
    of end over (start, end) order — a new island starts exactly when
    a start exceeds every previous end — then one hash aggregate per
    island. Zero-or-negative-length intervals raise in-plan (a
    silent end < start row would corrupt the running max).

    Output: (key, island_start, island_end, n_intervals,
    covered = island_end - island_start)."""
    b = df.select(
        F.col(key_col).alias("__k"),
        F.col(start_col).cast("long").alias("__s"),
        F.col(end_col).cast("long").alias("__e"),
    ).withColumn(
        "__e",
        F.when(
            F.col("__e") <= F.col("__s"),
            F.raise_error(
                F.concat(
                    F.lit("merge_intervals: empty or inverted interval ["),
                    F.col("__s").cast("string"),
                    F.lit(", "),
                    F.col("__e").cast("string"),
                    F.lit(")"),
                )
            ).cast("long"),
        ).otherwise(F.col("__e")),
    )
    w = Window.partitionBy("__k").orderBy("__s", "__e")
    # running max of end over all PRIOR intervals (exclude current):
    # a new island starts when this start exceeds it
    prior_max = F.max("__e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = b.withColumn(
        "__new",
        F.when(
            prior_max.isNull() | (F.col("__s") > prior_max), 1
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "__island",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        islands.groupBy("__k", "__island")
        .agg(
            F.min("__s").alias("island_start"),
            F.max("__e").alias("island_end"),
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
        )
        .select(
            F.col("__k").alias(key_col),
            "island_start",
            "island_end",
            "n_intervals",
            (F.col("island_end") - F.col("island_start")).alias("covered"),
        )
    )


def max_concurrency(
    intervals: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    bucket_us: int = 3_600_000_000,
    out_bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """Peak interval concurrency per output bucket (default: max
    concurrent sessions per day) — the sweep-line counter behind
    "peak concurrent users" dashboards, done without a global time
    sort.

    The naive sweep (sort ALL +1/-1 boundary events by time, running
    sum) needs one totally-ordered partition — a non-starter at 1e9
    sessions/day. Here every inclusive [start, end] interval is
    clipped to the fine buckets it covers (``sequence`` explode, one
    clipped piece per covered hour), and the sweep runs per bucket: a
    window partitioned by bucket whose input is bounded by the
    intervals TOUCHING that hour, never the whole day. Peak-per-day is
    then a max over its hours — exact, because every instant lies in
    some hour and a clipped piece is active exactly where its parent
    was. Tie rule: +1 sorts before -1 at the same microsecond, so
    touching/point intervals (a single-event session has end ==
    start) count as concurrent; both the operator and its DuckDB
    oracle replay pin this ordering.

    Cost: 2 x sum(hours covered) sweep rows, one shuffle on the fine
    bucket, then a |buckets|-sized rollup. Inverted intervals (end <
    start) raise in-plan; end == start is a valid point interval.
    Output: (bucket_i, max_concurrent).
    """
    if bucket_us <= 0 or out_bucket_us % bucket_us != 0:
        raise ValueError(
            "max_concurrency: out_bucket_us must be a positive multiple "
            f"of bucket_us, got {bucket_us} / {out_bucket_us}"
        )
    b = intervals.select(
        F.col(start_col).cast("long").alias("__s"),
        F.col(end_col).cast("long").alias("__e"),
    ).withColumn(
        "__e",
        F.when(
            F.col("__e") < F.col("__s"),
            F.raise_error(
                F.concat(
                    F.lit("max_concurrency: inverted interval ["),
                    F.col("__s").cast("string"),
                    F.lit(", "),
                    F.col("__e").cast("string"),
                    F.lit("]"),
                )
            ).cast("long"),
        ).otherwise(F.col("__e")),
    )
    clipped = b.select(
        "__s",
        "__e",
        F.expr(
            f"explode(sequence(__s DIV {bucket_us}, __e DIV {bucket_us}))"
        ).alias("__h"),
    ).select(
        "__h",
        F.greatest(F.col("__s"), F.col("__h") * bucket_us).alias("__cs"),
        F.least(
            F.col("__e"), (F.col("__h") + 1) * bucket_us - 1
        ).alias("__ce"),
    )
    evts = clipped.select(
        "__h",
        F.explode(
            F.array(
                F.struct(
                    F.col("__cs").alias("t"), F.lit(1).alias("d")
                ),
                F.struct(
                    F.col("__ce").alias("t"), F.lit(-1).alias("d")
                ),
            )
        ).alias("__x"),
    ).select("__h", F.col("__x.t").alias("__t"), F.col("__x.d").alias("__d"))
    w = (
        Window.partitionBy("__h")
        .orderBy(F.col("__t"), F.col("__d").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_bucket = (
        evts.withColumn("__run", F.sum("__d").over(w))
        .groupBy("__h")
        .agg(F.max("__run").alias("__peak"))
    )
    ratio = out_bucket_us // bucket_us
    return per_bucket.groupBy(
        F.expr(f"__h DIV {ratio}").cast("long").alias("bucket_i")
    ).agg(F.max("__peak").cast("long").alias("max_concurrent"))
