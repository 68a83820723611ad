"""Dataset assembly operators: sequence packing and split assignment.

The last mile of a pretraining data pipeline, after cleaning/dedup:
(a) place every document into the packed token stream that fills
fixed-size context windows (``pack_token_stream``), and (b) assign
each document to train/val/test deterministically
(``assign_split``). Both are pure functions of the document id and
token counts — no RNG to version, identical on re-runs and engines,
which is what makes the dataset reproducible and the DuckDB oracles
replayable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datafusion_uba_spark.operators.hashing import md5_prefix_int

from datafusion_uba_spark.operators.text import (
    normalize_text,
    tokens_from_norm,
)

__all__ = ["pack_token_stream", "assign_split"]


def pack_token_stream(
    df: DataFrame,
    capacity: int = 2048,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Where does each document land in the packed context-window
    stream? Pretraining packs documents back-to-back into
    fixed-``capacity`` token windows, SPLITTING documents across
    window boundaries (the GPT-style packed-sequence layout;
    `chunk_documents` is the per-document view, this is the
    corpus-stream view). The answer per document: its shard, its
    token offset in that shard's stream, and the first/last window
    it occupies.

    Scale design: a single global token stream would make the running
    sum one sequential partition — the classic window scale-killer.
    Real pipelines pack per writer shard, so we do too: documents are
    assigned to ``n_shards`` deterministic shards by the leading md5
    nibbles of their id (engine-portable, no RNG), ordered within a
    shard by id, and the cumulative sum runs per shard — ``n_shards``
    independent sorted partitions, sized to the downstream writer
    count. One shuffle (the per-shard sort); everything else is
    narrow arithmetic.

    Output: (id, shard, n_tokens, start_offset, first_window,
    last_window) for documents with >= 1 token; windows are numbered
    per shard, offsets in tokens.
    """
    from pyspark.sql import Window

    if capacity <= 0:
        raise ValueError("pack_token_stream: capacity must be positive")
    if n_shards <= 0:
        raise ValueError("pack_token_stream: n_shards must be positive")
    if tokens_col is None:
        s = df.select(
            F.col(id_col), normalize_text(text_col).alias("__norm")
        ).select(
            id_col,
            F.size(tokens_from_norm(F.col("__norm"))).alias("__n"),
        )
    else:
        s = df.select(F.col(id_col), F.col(tokens_col).cast("int").alias("__n"))
    s = s.where(F.col("__n") >= 1)
    # leading 4 hex chars of md5(id) mod n_shards: deterministic,
    # uniform, and replayable verbatim in the oracle
    shard = (
        md5_prefix_int(F.col(id_col).cast("string"), 4).cast("int")
        % n_shards
    )
    s = s.withColumn("shard", shard)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s = s.withColumn(
        "start_offset", F.coalesce(F.sum("__n").over(w), F.lit(0)).cast("long")
    )
    return s.select(
        id_col,
        "shard",
        F.col("__n").cast("long").alias("n_tokens"),
        "start_offset",
        F.expr(f"start_offset div {capacity}").cast("long").alias("first_window"),
        F.expr(f"(start_offset + __n - 1) div {capacity}")
        .cast("long")
        .alias("last_window"),
    )


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_pct: int = 1,
    test_pct: int = 1,
) -> DataFrame:
    """Deterministic train/val/test assignment by id hash — the split
    that survives re-runs, engine changes, and corpus growth (a doc's
    split never depends on which other docs are present, so
    incremental ingests keep historical assignments stable; a random
    split with a seed does not survive re-partitioning).

    Buckets: the first 4 hex chars of md5(id) as an integer in
    [0, 65536); test takes the top ``test_pct`` percent of that
    space, val the next ``val_pct``, train the rest. Pure
    per-row expression — zero shuffles, composes with any scan.

    Adds a ``split`` column ('train' | 'val' | 'test') to ``df``.
    """
    if val_pct < 0 or test_pct < 0 or val_pct + test_pct >= 100:
        raise ValueError(
            "assign_split: need val_pct, test_pct >= 0 and val+test < 100"
        )
    bucket = md5_prefix_int(F.col(id_col).cast("string"), 4).cast("int")
    test_lo = 65536 - (65536 * test_pct) // 100
    val_lo = test_lo - (65536 * val_pct) // 100
    return df.withColumn(
        "split",
        F.when(bucket >= test_lo, F.lit("test"))
        .when(bucket >= val_lo, F.lit("val"))
        .otherwise(F.lit("train")),
    )
