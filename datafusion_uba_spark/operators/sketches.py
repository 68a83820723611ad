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

__all__ = [
    "approx_distinct",
    "approx_distinct_rollup",
    "approx_overlap_consecutive",
    "count_min_build",
    "count_min_estimate",
]


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


def approx_overlap_consecutive(
    df: DataFrame,
    key_col: str,
    target_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Approximate overlap |A ∩ B| between CONSECUTIVE integer keys
    (day d vs day d+1: returning users) by inclusion-exclusion over
    HLL sketches: est(A) + est(B) - est(A ∪ B), where the union is the
    lossless HLL merge. This is the sketch-algebra payoff — the raw
    data is touched ONCE to build per-key sketches; any pairwise
    overlap question after that is arithmetic over 4 KiB blobs,
    instead of a (key, user)-sized self-join per question.

    Error: each estimate carries ~1.04/sqrt(2^lgk) relative standard
    error, and the subtraction AMPLIFIES relative error when the
    overlap is small vs the union — the twin's pytest pin covers the
    realistic DAU regime, and callers needing tight small-overlap
    bounds should raise lgk (state doubles per +1).

    Plan: one shuffle to (key, sketch); a self-join of the |keys|-row
    sketch table on key+1 (broadcast under AQE); no second pass over
    the data. Output: (key, next_key, est_a, est_b, est_union,
    returning = max(0, est_a + est_b - est_union))."""
    if not 4 <= lgk <= 21:
        raise ValueError(
            f"approx_overlap_consecutive: lgk must be in [4, 21], got {lgk}"
        )
    sk = df.groupBy(F.col(key_col).cast("long").alias("__k")).agg(
        F.hll_sketch_agg(F.col(target_col), F.lit(lgk)).alias("__sk")
    )
    a, b = sk.alias("a"), sk.alias("b")
    joined = a.join(b, F.col("b.__k") == F.col("a.__k") + 1)
    est_a = _estimate(F.col("a.__sk"))
    est_b = _estimate(F.col("b.__sk"))
    est_u = _estimate(F.hll_union(F.col("a.__sk"), F.col("b.__sk")))
    return joined.select(
        F.col("a.__k").alias(key_col),
        F.col("b.__k").alias(f"next_{key_col}"),
        est_a.alias("est_a"),
        est_b.alias("est_b"),
        est_u.alias("est_union"),
        F.greatest(est_a + est_b - est_u, F.lit(0).cast("long")).alias(
            "returning"
        ),
    )


# --- count-min sketch ------------------------------------------------------
#
# Heavy-hitter frequency estimation (Cormode & Muthukrishnan 2005).
# The 100 TB problem this solves: "how often does key X occur?" when
# the key cardinality itself doesn't fit anywhere — an exact
# per-key count shuffles the full distinct key set, a CMS shuffles at
# most d*w counter cells PER MAP PARTITION no matter how many keys or
# rows exist (Spark's partial hash-aggregate combines the (depth,
# bucket) cells map-side before the exchange). The sketch is mergeable
# the same way the HLL above is: cell tables from disjoint corpus
# slices ADD, so per-day partials roll up by summing cells.
#
# Guarantee: estimate >= true count always (deterministic, hash
# collisions only ever inflate); estimate <= true + eps*N with
# probability 1 - delta for w = ceil(e/eps), d = ceil(ln(1/delta)).
# tests/test_llm_ops.py pins the one-sided property for every key.


def _cms_bucket(key: Column, depth: int, w: int, hash_family: str) -> Column:
    """Bucket of ``key`` in CMS row ``depth`` — one of d pairwise
    independent hash functions, realized by salting the hash input
    with the row index (same seeding idiom as the MinHash families,
    operators/dedup.py).

    ``hash_family="xxhash64"`` is the production path (JVM-native,
    no string materialization). ``"md5"`` is the portable 60-bit
    md5-prefix family DuckDB can replay exactly
    (('0x' || substr(md5(...), 1, 15))::BIGINT), making a CMS registry
    row fully hash-verifiable — same twin discipline as
    dedup_minhash_md5 (operators/dedup.py:303).
    """
    if hash_family == "md5":
        from datafusion_uba_spark.operators.hashing import md5_prefix_int

        h = md5_prefix_int(
            F.concat(F.lit(f"{depth}:"), key.cast("string")), 15
        )
    else:
        h = F.xxhash64(key, F.lit(depth))
    return F.pmod(h, F.lit(w)).cast("int")


def count_min_build(
    df: DataFrame,
    key_col: str,
    w: int = 1024,
    d: int = 4,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Build a count-min sketch of ``key_col`` occurrences.

    Returns the cell table (depth int, bucket int, cell_count long) —
    at most d*w rows regardless of input size. Plan: a map-side
    posexplode to d (depth, bucket) cells per row, then ONE hash
    aggregate whose shuffle is capped at d*w cells per map partition
    by the partial combine; the raw corpus is scanned once and never
    re-shuffled. Sketches over disjoint inputs merge by summing
    cell_count on (depth, bucket).
    """
    if hash_family not in ("xxhash64", "md5"):
        raise ValueError(f"count_min_build: unknown hash_family {hash_family!r}")
    if w < 1 or d < 1:
        raise ValueError(f"count_min_build: need w >= 1, d >= 1, got {w=} {d=}")
    key = F.col(key_col)
    cells = df.select(
        F.posexplode(
            F.array(*[_cms_bucket(key, i, w, hash_family) for i in range(d)])
        ).alias("depth", "bucket")
    )
    return cells.groupBy("depth", "bucket").agg(
        F.count(F.lit(1)).alias("cell_count")
    )


def count_min_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    w: int = 1024,
    d: int = 4,
    hash_family: str = "xxhash64",
    out_col: str = "cms_count",
) -> DataFrame:
    """Estimate the count of each key in ``keys`` from a CMS built
    with the SAME (w, d, hash_family) — min over the key's d cells.

    Plan: the probe side explodes each key to its d (depth, bucket)
    coordinates and joins the cell table; the sketch is at most d*w
    rows, so the join is marked broadcast — the (possibly huge) key
    list never moves. Missing cells mean the key hashed only to
    never-seen buckets: count 0.

    Parameter mismatch with the build call silently yields garbage
    (the same footgun ivf_topk_from_index guards against with
    persisted metadata); if the sketch is stored, store (w, d,
    hash_family) beside it and re-pass them here.
    """
    if hash_family not in ("xxhash64", "md5"):
        raise ValueError(
            f"count_min_estimate: unknown hash_family {hash_family!r}"
        )
    key = F.col(key_col)
    probes = keys.select(
        key_col,
        F.posexplode(
            F.array(*[_cms_bucket(key, i, w, hash_family) for i in range(d)])
        ).alias("depth", "bucket"),
    )
    joined = probes.join(F.broadcast(sketch), ["depth", "bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce("cell_count", F.lit(0))).alias(out_col)
    )
