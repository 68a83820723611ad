"""Exact-integer Lloyd's k-means over embedding columns.

The clustering twin of the ANN family (similarity.py / pq.py): where
ivf_build_index k-means-partitions vectors for *search*, this operator
exposes the clustering itself as a first-class, **hash-verifiable**
result. The standard float k-means cannot be oracle-checked — summing
floats in different orders drifts by ULPs and near-tie assignments
flip — so every quantity here is integer-exact and the whole algorithm
replays bit-for-bit on any engine:

- vectors quantize once to integer grid units ``q_i =
  round(x_i * scale)`` (int64);
- distances are exact integer sums of squared differences (dim x
  (2 * |q|max)^2 stays far under 2^63 — overflow-free at any SF);
- new centroids re-quantize to the SAME grid: ``m_i = round(S_i / n)``
  with ``S_i`` an exact int64 sum, so one IEEE division + one
  half-away-from-zero round is the only float arithmetic, and both
  engines compute it identically;
- ties (equal distance to two centroids) break to the lowest centroid
  id, pinned by the (dist2, cid) struct ordering.

Initialization is deterministic: the ``k`` vectors with the smallest
ids seed centroids 0..k-1 (no RNG — the registry contract).

Scale shape: assignment is **shuffle-free** — the k centroids fold
into ONE row holding an array<struct<cid, vec>>, broadcast cross-join,
and the argmin is `array_min` over a `transform` (all JVM codegen, no
UDF, no groupBy); cost is O(n * k * dim) map-side. The centroid
update posexplodes assigned vectors to (cluster, dim) rows and
hash-aggregates exact component sums — map-combinable partial sums,
k * dim result rows, the only shuffle per round. DuckDB replays the
identical pipeline relationally (queries_llm._ORACLE_KMEANS).

Reference parity: the reference has no clustering operator (its
surface is the two retention UDAFs, src/retention/mod.rs:30-107); this
extends the engine's LLM-pipeline family per the build brief (corpus
clustering for mixture curation, the upstream step of the
cluster-balanced sampling in source_temperature_sample).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "quantize_vectors",
    "kmeans_assign",
    "lloyd_rounds",
    "lloyd_fit",
]


def quantize_vectors(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1000,
) -> DataFrame:
    """(id, q) with q = round(x * scale) per component, int64."""
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x * F.lit(int(scale))).cast("long"),
        ).alias("q"),
    )


def _dist2(q: Column, c: Column) -> Column:
    """Exact integer squared euclidean distance between two int64
    arrays — zip_with + aggregate, JVM-side, no UDF."""
    return F.aggregate(
        F.zip_with(q, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kmeans_assign(quantized: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign every (vec_id, q) row to its nearest centroid.

    ``centroids`` is a small (cid int64, q array<int64>) frame. It is
    folded into a single array-of-structs row and broadcast, so the
    assignment adds NO shuffle: per input row, `transform` computes
    the k exact distances and `array_min` picks (dist2, cid) — struct
    ordering = lowest distance, ties to lowest cid. Returns
    (vec_id, q, cluster, dist2)."""
    packed = centroids.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("cid"), F.col("q").alias("cq")))
        ).alias("__cents")
    )
    best = F.array_min(
        F.transform(
            F.col("__cents"),
            lambda c: F.struct(
                _dist2(F.col("q"), c["cq"]).alias("dist2"),
                c["cid"].alias("cid"),
            ),
        )
    )
    return (
        quantized.crossJoin(F.broadcast(packed))
        .withColumn("__best", best)
        .select(
            "vec_id",
            "q",
            F.col("__best.cid").alias("cluster"),
            F.col("__best.dist2").alias("dist2"),
        )
    )


def _update_centroids(assigned: DataFrame) -> DataFrame:
    """Grid-requantized new centroids from an assignment: exact int64
    component sums (posexplode -> map-combinable hash agg, the round's
    one shuffle), then m_i = round(S_i / n) back onto the integer
    grid. Returns (cid, q)."""
    comp = (
        assigned.select("cluster", F.posexplode("q").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "cluster",
            "pos",
            F.round(F.col("s").cast("double") / F.col("n"))
            .cast("long")
            .alias("m"),
        )
    )
    return comp.groupBy("cluster").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "m"))),
            lambda pm: pm["m"],
        ).alias("q")
    ).select(F.col("cluster").alias("cid"), "q")


def lloyd_fit(
    df: DataFrame,
    k: int = 8,
    rounds: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1000,
) -> tuple[DataFrame, DataFrame]:
    """``rounds`` full Lloyd iterations from the deterministic
    smallest-id seeds; returns (assignment, centroids) where
    assignment is the final (vec_id, cluster, dist2) frame and
    centroids is the (cid, q) frame the FINAL assignment used — the
    trained model an incremental pipeline persists so later batches
    assign against the same geometry (semantic_index_* in dedup.py)
    without re-clustering the corpus. rounds=1 is pure seed
    assignment; each further round is one centroid update +
    reassignment."""
    if k < 1 or rounds < 1:
        raise ValueError(f"lloyd_fit: k={k} rounds={rounds} must be >= 1")
    qdf = quantize_vectors(df, vec_col, id_col, scale).localCheckpoint(
        eager=False
    )
    from pyspark.sql import Window

    seeds = (
        qdf.orderBy("vec_id")
        .limit(k)
        .select(
            (
                F.row_number().over(Window.orderBy("vec_id")) - 1
            ).cast("long").alias("cid"),
            "q",
        )
    )
    cents = seeds
    assigned = kmeans_assign(qdf, cents)
    for _ in range(rounds - 1):
        cents = _update_centroids(assigned)
        assigned = kmeans_assign(qdf, cents)
    return assigned.select("vec_id", "cluster", "dist2"), cents


def lloyd_rounds(
    df: DataFrame,
    k: int = 8,
    rounds: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1000,
) -> DataFrame:
    """Assignment-only face of :func:`lloyd_fit`."""
    return lloyd_fit(df, k, rounds, vec_col, id_col, scale)[0]
