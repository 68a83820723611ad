"""Hypertable-style rollup cascade: coarser time tiers computed from
the FINER ROLLUP, never from raw events.

The 100 TB pattern (TimescaleDB continuous aggregates, Druid/Pinot
rollup segments): raw events are scanned ONCE into the finest rollup
(hour x key — |hours x keys| rows, orders of magnitude smaller than
the events it summarizes), and every coarser tier (day, week, ...) is
an aggregate OVER THE PREVIOUS TIER. Additive aggregates (count, sum)
make the cascade lossless — tier N from tier N-1 equals tier N from
raw, which is exactly what the registry row's DuckDB oracle proves by
computing each tier directly from events.

Plan shape: one raw scan + one hash aggregate per tier, each tier's
input being the (lazily localCheckpointed) previous tier — without
the checkpoint, the multi-tier output union re-runs every upstream
aggregate per branch (the ReuseExchange gap measured on the
engagement operators; pinned here by
tests/test_uba_ops.py::test_rollup_cascade_single_raw_scan). The
per-tier shuffle rides on rollup rows, never on events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["rollup_cascade", "TIER_SECONDS"]

# tier -> seconds per bucket; each tier must divide the next (epoch
# alignment keeps integer bucket math exact and engine-portable)
TIER_SECONDS = {"hour": 3600, "day": 86400, "week": 7 * 86400}


def _bucket(col: str, sec: int):
    # integer-exact epoch-aligned bucketing: (s DIV sec) * sec
    return F.expr(f"({col} DIV {sec}) * {sec}")


def rollup_cascade(
    events: DataFrame,
    time_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    tiers: tuple[str, ...] = ("hour", "day", "week"),
) -> DataFrame:
    """(tier, bucket_start_us, key, n_events, value_cents) for every
    tier: the finest from raw events, each coarser tier from the one
    before it. Buckets are epoch-aligned integer divisions of epoch
    seconds (week = epoch DIV 604800 — NOT calendar ISO weeks, so the
    arithmetic replays identically in any engine). Values are exact
    integer cents, so every tier's sums are order-independent and the
    cascade is bit-lossless."""
    secs = [TIER_SECONDS[t] for t in tiers]
    for finer, coarser in zip(secs, secs[1:]):
        if coarser % finer != 0:
            raise ValueError(f"rollup_cascade: tiers must nest, got {tiers}")

    base = events.select(
        F.expr(f"unix_micros(`{time_col}`) DIV 1000000").alias("__es"),
        F.col(key_col).alias("key"),
        F.round(F.col(value_col) * 100).cast("long").alias("__cents"),
    )
    frames: list[tuple[str, DataFrame]] = []
    cur = (
        base.groupBy(_bucket("__es", secs[0]).alias("__bs"), "key")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("__cents").alias("value_cents"),
        )
        .localCheckpoint(eager=False)
    )
    frames.append((tiers[0], cur))
    for name, sec in zip(tiers[1:], secs[1:]):
        cur = (
            cur.groupBy(_bucket("__bs", sec).alias("__bs"), "key")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("value_cents").alias("value_cents"),
            )
            .localCheckpoint(eager=False)
        )
        frames.append((name, cur))
    outs = [
        f.select(
            F.lit(name).alias("tier"),
            (F.col("__bs") * 1_000_000).alias("bucket_start_us"),
            "key",
            "n_events",
            "value_cents",
        )
        for name, f in frames
    ]
    result = outs[0]
    for t in outs[1:]:
        result = result.unionByName(t)
    return result
