"""Deterministic sampling operators for training-data pipelines.

Training mixes are built by QUOTA, not fraction: "N documents per
language / source / quality bucket". The operators here make that
reproducible with no RNG state: the per-stratum order is
(md5(id), id) — a fixed pseudo-random permutation both Spark and the
DuckDB oracle compute identically — so the same corpus always yields
the same sample, appends don't reshuffle earlier picks' relative
order, and there is no seed to version.

Reference analog: the reference has no sampling surface; this extends
the driver-mandated pipeline family (SURVEY §2.4) with the standard
corpus-mix primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datafusion_uba_spark.operators.similarity import topk_per_key


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic quota sample: the first ``n_per_stratum`` rows of
    each stratum under the fixed (md5(id), id) permutation.

    Plan shape at 100 TB: the ranking is the salted two-stage top-k
    (``topk_per_key``) — stage 1 ranks within (stratum, salt) so no
    single reducer ever sorts a whole hot stratum (an 80%-English
    corpus would otherwise funnel 80% of rows through one task), stage
    2 ranks the surviving ``salt_buckets * n`` rows per stratum.
    Output: input columns + ``sample_rank`` (1-based within stratum).
    """
    if not strata_cols:
        raise ValueError("stratified_sample: need at least one stratum column")
    if n_per_stratum < 1:
        raise ValueError("stratified_sample: n_per_stratum must be >= 1")
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in strata_cols])
    tagged = df.withColumn("__stratum", key)
    order = [
        F.md5(F.col(id_col).cast("string")).asc(),
        F.col(id_col).asc(),
    ]
    top = topk_per_key(
        tagged, "__stratum", order, n_per_stratum, salt_col=id_col
    )
    return top.withColumnRenamed("rank", "sample_rank").drop("__stratum")


def temperature_quota_sample(
    df: DataFrame,
    source_col: str,
    total_n: int,
    id_col: str = "doc_id",
    salt_buckets: int = 16,
) -> DataFrame:
    """Temperature-flattened source mixture — the standard
    training-mix rebalance (GPT-3's dataset weights; the multilingual
    alpha-sampling of mBERT/XLM-R, p_s proportional to n_s^alpha with
    alpha < 1): small sources are UP-weighted relative to their share
    so the mix isn't dominated by the largest crawl. alpha is fixed at
    1/2 and the whole quota computation is engine-exact integer math:
    weight_s = floor(sqrt(n_s)) (sqrt is IEEE correctly-rounded and
    counts < 2^53 are exact doubles, so both engines get the same
    integer), quota_s = (total_n * weight_s) DIV sum(weights). Floor
    rationing means sum(quota) <= total_n — quotas never oversubscribe.

    Within each source the picks are the first quota_s rows of the
    fixed (md5(id), id) permutation (the module's no-RNG-state
    contract: reproducible, append-stable, no seed to version).

    Plan shape at 100 TB: the quota table is |sources| rows — one hash
    aggregate, a global window over those few rows (never the data),
    and a broadcast join back; ranking is the salted two-stage of
    ``stratified_sample`` (no single reducer sorts a hot source), with
    per-source variable k applied by filter instead of a scalar k.

    Output: input columns + sample_rank (1-based within source) +
    quota (that source's allocation)."""
    if total_n < 1:
        raise ValueError("temperature_quota_sample: total_n must be >= 1")
    counts = df.groupBy(F.col(source_col).alias("__src")).agg(
        F.count(F.lit(1)).alias("__ns")
    )
    weighted = counts.select(
        "__src",
        F.floor(F.sqrt(F.col("__ns").cast("double")))
        .cast("long")
        .alias("__w"),
    )
    # global window over the |sources|-row table (NOT the data): the
    # single-partition WindowExec is fine at this cardinality and
    # avoids a one-row nested-loop join for the scalar sum
    quota = weighted.select(
        "__src",
        F.expr(f"({total_n} * __w) DIV sum(__w) OVER ()").alias("__quota"),
    ).where(F.col("__quota") >= 1)
    tagged = df.join(
        F.broadcast(quota), F.col(source_col) == F.col("__src")
    ).drop("__src")
    order = [
        F.md5(F.col(id_col).cast("string")).asc(),
        F.col(id_col).asc(),
    ]
    salt = F.pmod(F.hash(F.col(id_col)), F.lit(salt_buckets))
    w1 = Window.partitionBy(F.col(source_col), salt).orderBy(*order)
    pruned = (
        tagged.withColumn("__rn1", F.row_number().over(w1))
        .where(F.col("__rn1") <= F.col("__quota"))
        .drop("__rn1")
    )
    w2 = Window.partitionBy(source_col).orderBy(*order)
    return (
        pruned.withColumn("sample_rank", F.row_number().over(w2))
        .where(F.col("sample_rank") <= F.col("__quota"))
        .withColumn("quota", F.col("__quota").cast("long"))
        .drop("__quota")
    )


def pps_systematic(
    df: DataFrame,
    weight_col: str,
    step: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Systematic probability-proportional-to-size sampling: walk each
    stratum in the fixed (md5(id), id) permutation, accumulate the
    weight, and pick every document whose cumulative span crosses a
    multiple of ``step`` — the classic PPS design (inclusion
    probability = weight/step, documents heavier than ``step`` are
    picked with multiplicity), fully deterministic with no RNG and
    exact integer arithmetic throughout, so the oracle replays it.

    Scale shape: one window per stratum (hash-partitioned cumulative
    sum — the strata parallelize; within a stratum the running sum is
    the same sequential pass every ordered sampler pays). Output:
    (id, stratum, weight, picks) for picks >= 1, where
    picks = floor(cw/step) - floor((cw-weight)/step).
    """
    if step <= 0:
        raise ValueError(f"pps_systematic: step={step} must be positive")
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    cum = df.select(
        F.col(id_col),
        F.col(strata_col),
        F.col(weight_col).cast("long").alias("weight"),
    ).withColumn("__cw", F.sum("weight").over(w))
    return (
        cum.selectExpr(
            f"{id_col}",
            f"{strata_col}",
            "weight",
            f"CAST(__cw div {step} - (__cw - weight) div {step} AS BIGINT)"
            " AS picks",
        )
        .where(F.col("picks") >= 1)
    )
