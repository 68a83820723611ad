"""Mergeable distinct-count sketches (Apache DataSketches HLL).

At 100 TB an exact COUNT(DISTINCT user) is the expensive shape: Spark
plans it as two shuffles (partial distinct on (keys, user), then the
final count), and the intermediate (keys, user) set is itself huge.
The production path is the HyperLogLog sketch: one shuffle, constant
(2^lgk registers) state per group, and — the property everything else
hangs off — sketches MERGE, so per-partition/per-day partials can be
stored and rolled up later without rescanning (the same
partial-aggregate contract the retention operators rely on;
`approx_distinct_rollup` is that pattern made explicit).

Spark ships the DataSketches HLL pair as built-ins (`hll_sketch_agg`
/ `hll_union_agg` / `hll_sketch_estimate`, JVM-side, SQL-standard-ish
since 3.5) — no UDF, whole-stage-codegen-friendly. The estimates are
DETERMINISTIC (same input set -> same sketch -> same estimate) but not
replayable in DuckDB (different HLL implementation), so registry rows
built on these are rows-only checked and the correctness anchor is the
exact twin next to them (`daily_active_users`) plus the pytest error /
merge-consistency pins in tests/test_llm_ops.py — the same
exact-anchor discipline as cosine_topk vs LSH and percentile vs
approx_percentile.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["approx_distinct", "approx_distinct_rollup"]


def _estimate(sketch: Column) -> Column:
    return F.hll_sketch_estimate(sketch).cast("long")


def approx_distinct(
    df: DataFrame,
    group_cols: list[str],
    target_col: str,
    lgk: int = 12,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Approximate COUNT(DISTINCT target) per group in ONE shuffle.

    ``lgk`` is the DataSketches log2(registers) accuracy knob: 12 ->
    4 KiB state per group, ~1.6% relative standard error; each +1
    halves the variance and doubles the state.
    """
    if not 4 <= lgk <= 21:
        raise ValueError(f"approx_distinct: lgk must be in [4, 21], got {lgk}")
    sk = F.hll_sketch_agg(F.col(target_col), F.lit(lgk))
    return df.groupBy(*group_cols).agg(_estimate(sk).alias(out_col))


def approx_distinct_rollup(
    df: DataFrame,
    fine_cols: list[str],
    coarse_cols: list[str],
    target_col: str,
    lgk: int = 12,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Sketch once at fine grain, MERGE up to coarse grain.

    The point of a sketch over an exact distinct: the fine-grain
    sketches (e.g. per day) are reusable partials — union them to any
    coarser rollup (e.g. per month) without touching the raw data
    again. ``coarse_cols`` must be a subset of ``fine_cols``. Plan:
    one shuffle to fine grain, one tiny shuffle of fixed-size sketch
    blobs to coarse grain; the raw corpus is scanned exactly once.
    """
    missing = [c for c in coarse_cols if c not in fine_cols]
    if missing:
        raise ValueError(
            f"approx_distinct_rollup: coarse_cols {missing} not in fine_cols"
        )
    fine = df.groupBy(*fine_cols).agg(
        F.hll_sketch_agg(F.col(target_col), F.lit(lgk)).alias("__sk")
    )
    return fine.groupBy(*coarse_cols).agg(
        _estimate(F.hll_union_agg(F.col("__sk"))).alias(out_col)
    )
