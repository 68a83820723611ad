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
