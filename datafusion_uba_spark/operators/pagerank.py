"""Exact-integer weighted PageRank over an aggregated edge table.

Graph centrality for event-flow analysis: which event types sit at the
center of user journeys. The reference has no graph operator (its
surface is the two retention UDAFs, src/retention/mod.rs:30-107); this
extends the engine's UBA family — the ranking twin of
``event_transitions`` (the Markov transition matrix), consuming the
same consecutive-pair edge stream.

Why exact integers: float PageRank sums contributions in shuffle order
— non-deterministic last-ULP results that cannot be hash-verified. Here
every quantity is a scaled int64 and every division truncates, so the
power iteration replays bit-for-bit on any engine:

- edge transition probability  p_ppm(u,v) = (w(u,v) * 10^6) div W(u)
  with W(u) the node's total out-weight (exact int64 sums);
- rank scale 10^12:            r_0(v) = 10^12 div N
- per-iteration update:
    r_{k+1}(v) = (15 * 10^12) div (100 * N)
               + sum_u ( (85 * ((r_k(u) * p_ppm(u,v)) div 10^6)) div 100 )

The inner product r * p_ppm <= 10^12 * 10^6 < 2^63 — overflow-free for
ANY graph size because ranks are normalized (total mass <= 10^12).
Truncation loses mass (standard integer-PageRank leak, ~N ULPs per
round); dangling nodes likewise leak their damped mass — both are part
of the pinned spec the DuckDB oracle replays exactly.

Scale shape: the data-sized work is building the aggregated edge table
(caller's one shuffle over event pairs). The iteration itself runs on
the |node|^2-bounded edge table — O(event-type cardinality squared),
tiny at any event volume — as ``iters`` chained broadcast-joined hash
aggregates. No collect, no Python row work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["pagerank_integer", "RANK_SCALE", "PROB_SCALE"]

RANK_SCALE = 10**12
PROB_SCALE = 10**6
DAMP_PCT = 85


def pagerank_integer(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    iters: int = 10,
    max_driver_nodes: int = 1024,
) -> DataFrame:
    """``iters`` exact-integer power-iteration rounds over weighted
    edges (one row per (src, dst) with positive int64 weight).

    Returns (node, rank_scaled) with rank on the 10^12 grid.

    AUTO-DISPATCH on graph size (the ann_topk_auto pattern): the input
    is the already-AGGREGATED edge table — O(|nodes|^2) rows, driver
    metadata by the same O(cells) allowance as the k-means means
    collect — so when the node count fits ``max_driver_nodes`` the
    iteration runs as a driver loop over the collected cells (the 10
    chained tiny join stages cost ~4 s of pure scheduling/codegen at
    any data size, ~30x the arithmetic). Bigger graphs (user-level
    follow graphs, not event-type graphs) take the distributed
    broadcast-join loop. Both paths compute the identical integer
    recurrence — dispatch can never change a result, pinned by
    tests/test_stats_ops.py::test_pagerank_paths_agree.
    """
    if iters < 1:
        raise ValueError(f"pagerank_integer: iters={iters} must be >= 1")
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("long").alias("w"),
    )
    if max_driver_nodes > 0:
        cells = e.localCheckpoint(eager=False)
        n_nodes = (
            cells.select(F.col("src").alias("n"))
            .union(cells.select(F.col("dst").alias("n")))
            .distinct()
            .count()
        )
        if n_nodes == 0:
            return _empty_ranks(e)
        if n_nodes <= max_driver_nodes:
            return _pagerank_driver(cells, iters)
        e = cells
    elif e.isEmpty():
        # The distributed recurrence divides by _N; an empty edge
        # table must short-circuit to an empty result, not NULL ranks.
        return _empty_ranks(e)
    # Edge transition probabilities on the ppm grid; the window sum is
    # over the already-aggregated edge table (|nodes|^2 rows max).
    tot = Window.partitionBy("src")
    ep = e.withColumn("_W", F.sum("w").over(tot)).select(
        "src",
        "dst",
        F.expr(f"(w * {PROB_SCALE}) div _W").alias("p_ppm"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_row = nodes.agg(F.count(F.lit(1)).alias("_N"))
    nodes = nodes.crossJoin(F.broadcast(n_row)).localCheckpoint(eager=False)
    ep = ep.localCheckpoint(eager=False)

    ranks = nodes.select(
        "node",
        "_N",
        F.expr(f"CAST({RANK_SCALE} AS BIGINT) div _N").alias("r"),
    )
    for _ in range(iters):
        contrib = (
            ep.join(F.broadcast(ranks.select("node", "r")),
                    ep["src"] == F.col("node"))
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"({DAMP_PCT} * ((r * p_ppm) div {PROB_SCALE})) div 100"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                "_N",
                (
                    F.expr(
                        f"CAST({100 - DAMP_PCT} * {RANK_SCALE} AS BIGINT)"
                        " div (100 * _N)"
                    )
                    + F.coalesce(F.col("inflow"), F.lit(0).cast("long"))
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))


def _empty_ranks(e: DataFrame) -> DataFrame:
    """Empty (node, rank_scaled) frame, node typed like the edge src."""
    node_type = dict(e.dtypes)["src"]
    return e.sparkSession.createDataFrame(
        [], f"node {node_type}, rank_scaled long"
    )


def _pagerank_driver(cells: DataFrame, iters: int) -> DataFrame:
    """Driver replay of the identical integer recurrence over the
    collected O(|nodes|^2) edge cells; results re-parallelize via
    createDataFrame. Same truncating divisions, same ordering-free
    integer sums — bit-equal to the distributed loop by construction."""
    rows = cells.collect()
    out_w: dict = {}
    edges_list = []
    nodes = set()
    for r in rows:
        s, d, w = r["src"], r["dst"], int(r["w"])
        nodes.add(s)
        nodes.add(d)
        out_w[s] = out_w.get(s, 0) + w
        edges_list.append((s, d, w))
    p_ppm = [
        (s, d, (w * PROB_SCALE) // out_w[s]) for s, d, w in edges_list
    ]
    n = len(nodes)
    teleport = ((100 - DAMP_PCT) * RANK_SCALE) // (100 * n)
    r = {v: RANK_SCALE // n for v in nodes}
    for _ in range(iters):
        nxt = {v: teleport for v in nodes}
        for s, d, p in p_ppm:
            nxt[d] += (DAMP_PCT * ((r[s] * p) // PROB_SCALE)) // 100
        r = nxt
    spark = cells.sparkSession
    node_type = dict(cells.dtypes)["src"]
    return spark.createDataFrame(
        sorted(r.items()), f"node {node_type}, rank_scaled long"
    )
