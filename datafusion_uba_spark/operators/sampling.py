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

from pyspark.sql import DataFrame
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
