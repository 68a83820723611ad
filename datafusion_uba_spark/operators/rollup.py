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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "rollup_cascade",
    "gapfill",
    "hour_rollup_cells",
    "rollup_init",
    "rollup_refresh",
    "m4_downsample",
    "time_weighted_avg",
    "counter_increase",
    "TIER_SECONDS",
]

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


def hour_rollup_cells(
    events: DataFrame,
    time_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """The hour-tier cells of rollup_cascade as a standalone frame
    (pday partition column = epoch day of the bucket): the unit of
    storage for the PERSISTED continuous aggregate below."""
    base = events.select(
        F.expr(f"unix_micros(`{time_col}`) DIV 1000000").alias("__es"),
        F.col(key_col).alias("key"),
        F.round(F.col(value_col) * 100).cast("long").alias("__cents"),
    )
    return (
        base.groupBy(_bucket("__es", 3600).alias("bucket_s"), "key")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("__cents").alias("value_cents"),
        )
        .select(
            "bucket_s", "key", "n_events", "value_cents",
            F.expr("bucket_s DIV 86400").alias("pday"),
        )
    )


def rollup_init(
    events: DataFrame,
    table: str,
    time_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> None:
    """Materialize the hour-tier rollup as a catalog parquet table
    PARTITIONED BY pday (epoch day) — the continuous-aggregate store
    rollup_refresh maintains incrementally."""
    cells = hour_rollup_cells(events, time_col, key_col, value_col)
    spark = events.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    from datafusion_uba_spark.sources import save_table_recovering_orphan

    save_table_recovering_orphan(
        lambda: cells.write.mode("overwrite")
        .format("parquet")
        .partitionBy("pday")
        .saveAsTable(table),
        spark,
        table,
    )


def rollup_refresh(
    increment: DataFrame,
    table: str,
    time_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> list[int]:
    """Incrementally fold a batch of NEW events into the persisted
    hour-tier rollup — the TimescaleDB continuous-aggregate refresh /
    Druid segment-replace pattern: aggregate the increment, merge it
    with the stored cells of ONLY the affected pday partitions (sums
    are additive, so merge = union + re-sum), and rewrite ONLY those
    partitions via dynamic partition overwrite. Untouched days' files
    are never read or written — at 100 TB a daily refresh touches one
    day's partitions, not three years of history. Returns the affected
    pday list (driver-side: O(days in the increment), bounded).

    Correctness contract (pinned in tests/test_uba_ops.py): after any
    sequence of disjoint-increment refreshes, the stored table equals
    hour_rollup_cells over the concatenation of all increments —
    including increments that land in EXISTING buckets (late events)."""
    spark = increment.sparkSession
    inc = hour_rollup_cells(increment, time_col, key_col, value_col)
    inc = inc.localCheckpoint(eager=False)
    days = [r["pday"] for r in inc.select("pday").distinct().collect()]
    if not days:
        return []
    stored = spark.table(table).where(F.col("pday").isin(days))
    merged = (
        stored.unionByName(inc)
        .groupBy("bucket_s", "key", "pday")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_cents").alias("value_cents"),
        )
        .select("bucket_s", "key", "n_events", "value_cents", "pday")
    )
    from datafusion_uba_spark.sources import dynamic_partition_overwrite

    with dynamic_partition_overwrite(spark):
        # dynamic mode: overwrite replaces ONLY the partitions present
        # in `merged` (exactly the affected days), never the others
        merged.write.mode("overwrite").insertInto(table)
    return sorted(days)


def gapfill(
    observed: DataFrame,
    start_s: int,
    end_s: int,
    bucket_seconds: int,
    bucket_col: str = "bucket_s",
    key_col: str = "key",
    value_col: str = "value",
    fill: str = "locf",
) -> DataFrame:
    """TimescaleDB-style ``time_bucket_gapfill``: densify a rolled-up
    series to EVERY bucket in ``[start_s, end_s)`` per key, filling
    the holes (TimescaleDB gapfill/locf/interpolate docs; the
    reference has no gapfill — this extends the hypertable family its
    retention/rollup semantics sit in).

    ``observed`` holds (bucket_col: epoch-second bucket start,
    key_col, value_col) rows with gaps — typically a rollup_cascade
    tier or any groupBy-bucket aggregate. Fill strategies:

    - ``"null"``: missing buckets appear with NULL value
    - ``"zero"``: missing buckets get 0 (the right fill for counts)
    - ``"locf"``: last observation carried forward per key; buckets
      before a key's first observation stay NULL
    - ``"linear"``: linear interpolation between the neighboring
      observations, computed in integer micro-units with TRUNCATING
      integer division — Spark's ``DIV`` and DuckDB's ``//`` both
      truncate toward zero on integers, so the arithmetic replays
      exactly; before-first/after-last buckets stay NULL

    Scale shape: the dense frame is |keys| x |buckets| rows built
    from a per-key ``sequence`` explode (never a driver loop), the
    join back to observations is a shuffle on (key, bucket) over
    ROLLUP rows (not raw events), and the fill windows partition by
    key — bounded state per key, no global window. An
    out-of-tier-alignment observation (bucket_col not a multiple of
    bucket_seconds from epoch) raises downstream of a cheap
    validation aggregate rather than silently landing between grid
    points.
    """
    if fill not in ("null", "zero", "locf", "linear"):
        raise ValueError(f"gapfill: unknown fill strategy {fill!r}")
    if bucket_seconds <= 0 or end_s <= start_s:
        raise ValueError("gapfill: need bucket_seconds > 0 and end > start")

    obs = observed.select(
        F.col(bucket_col).cast("long").alias("__b"),
        F.col(key_col).alias("__k"),
        F.col(value_col).alias("__v"),
    ).where((F.col("__b") >= start_s) & (F.col("__b") < end_s))
    # validation is part of the returned plan: a misaligned bucket
    # poisons the join grid, so fail the query instead of dropping it
    n_checked = F.when(
        F.pmod(F.col("__b") - start_s, F.lit(bucket_seconds)) == 0,
        F.col("__b"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("gapfill: observation bucket "),
                F.col("__b").cast("string"),
                F.lit(f" is not aligned to the {bucket_seconds}s grid"),
            )
        )
    )
    obs = obs.select(n_checked.alias("__b"), "__k", "__v")

    keys = obs.select("__k").distinct()
    # long-typed bounds: a bare int literal under ~2^31 would make the
    # whole sequence (and the output bucket column) int32
    dense = keys.select(
        "__k",
        F.explode(
            F.sequence(
                F.lit(start_s).cast("long"),
                F.lit(end_s - 1).cast("long"),
                F.lit(bucket_seconds).cast("long"),
            )
        ).alias("__b"),
    )
    joined = dense.join(obs, ["__k", "__b"], "left")

    if fill == "zero":
        filled = joined.select(
            "__k", "__b", F.coalesce("__v", F.lit(0).cast("long")).alias("__v")
        )
    elif fill == "null":
        filled = joined
    elif fill == "locf":
        w = (
            Window.partitionBy("__k")
            .orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = joined.select(
            "__k", "__b", F.last("__v", ignorenulls=True).over(w).alias("__v")
        )
    else:  # linear
        wp = (
            Window.partitionBy("__k")
            .orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wn = (
            Window.partitionBy("__k")
            .orderBy("__b")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        pb = F.last(
            F.when(F.col("__v").isNotNull(), F.col("__b")), ignorenulls=True
        ).over(wp)
        pv = F.last("__v", ignorenulls=True).over(wp)
        nb = F.first(
            F.when(F.col("__v").isNotNull(), F.col("__b")), ignorenulls=True
        ).over(wn)
        nv = F.first("__v", ignorenulls=True).over(wn)
        # exact integer micro-units: value_u = pv*1e6 + ((nv-pv)*1e6 *
        # (b-pb)) DIV (nb-pb) — truncating integer division (identical
        # in Spark DIV and DuckDB // on integers, negatives included);
        # no float rounding decides a cell
        neighbors = joined.select(
            "__k",
            "__b",
            "__v",
            pb.alias("__pb"),
            pv.cast("long").alias("__pv"),
            nb.alias("__nb"),
            nv.cast("long").alias("__nv"),
        )
        interp = F.col("__pv") * F.lit(1_000_000) + F.expr(
            "((__nv - __pv) * 1000000 * (__b - __pb)) DIV (__nb - __pb)"
        )
        filled = neighbors.select(
            "__k",
            "__b",
            F.when(
                F.col("__v").isNotNull(),
                F.col("__v").cast("long") * F.lit(1_000_000),
            )
            .when(F.col("__pv").isNotNull() & F.col("__nv").isNotNull(), interp)
            .alias("__v"),
        )
    return filled.select(
        F.col("__k").alias(key_col),
        F.col("__b").alias(bucket_col),
        F.col("__v").alias(
            value_col if fill != "linear" else value_col + "_u"
        ),
    )


def m4_downsample(
    series: DataFrame,
    bucket_seconds: int,
    ts_col: str = "ts_s",
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """M4 downsampling (Jugel et al., "M4: A Visualization-Oriented
    Time Series Data Aggregation", VLDB 2014): per (key, bucket) emit
    min / max / first / last — the four values that make a
    width-bounded line rendering pixel-exact, the canonical way to
    ship a billion-point series to a dashboard as O(pixels) rows.

    Deterministic tie rules (engines disagree on arg_min/min_by ties,
    so neither is used): first = MIN value among rows at the bucket's
    earliest timestamp, last = MIN value at the latest. Plan: one hash
    aggregate computes the bucket envelope (t_min/t_max/v_min/v_max),
    a self-equi-join on (key, bucket) re-reads only the two boundary
    rows' candidates, and a second small aggregate resolves ties —
    two shuffles on (key, bucket), both over bucket-sized frames.
    """
    base = series.select(
        F.col(key_col).alias("__k"),
        _bucket(ts_col, bucket_seconds).alias("__b"),
        F.col(ts_col).cast("long").alias("__t"),
        F.col(value_col).cast("long").alias("__v"),
    )
    env = base.groupBy("__k", "__b").agg(
        F.min("__t").alias("__t_min"),
        F.max("__t").alias("__t_max"),
        F.min("__v").alias("v_min"),
        F.max("__v").alias("v_max"),
        F.count(F.lit(1)).alias("n_points"),
    )
    boundary = base.join(env, ["__k", "__b"]).where(
        (F.col("__t") == F.col("__t_min")) | (F.col("__t") == F.col("__t_max"))
    )
    resolved = boundary.groupBy("__k", "__b").agg(
        F.min(
            F.when(F.col("__t") == F.col("__t_min"), F.col("__v"))
        ).alias("v_first"),
        F.min(
            F.when(F.col("__t") == F.col("__t_max"), F.col("__v"))
        ).alias("v_last"),
    )
    return (
        env.join(resolved, ["__k", "__b"])
        .select(
            F.col("__k").alias(key_col),
            F.col("__b").alias("bucket_s"),
            "v_min",
            "v_max",
            "v_first",
            "v_last",
            "n_points",
        )
    )


def time_weighted_avg(
    series: DataFrame,
    start_s: int,
    end_s: int,
    ts_col: str = "ts_s",
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """Time-weighted average over an IRREGULAR series (the TimescaleDB
    `time_weight('LOCF', ...)` aggregate): each observation holds its
    value until the next one (last-observation-carried-forward), so
    the average weights every value by its holding duration instead of
    letting dense bursts dominate a plain avg.

    Exact integer formulation, replayable in any engine: per key, the
    weighted sum is sum(v_i * (t_{i+1} - t_i)) with the last
    observation held to ``end_s``, over observations clamped to
    [start_s, end_s); rows before a key's first observation contribute
    nothing (NULL until first sample, exactly gapfill's LOCF rule).
    Output: (key, weighted_sum = that integral in value*seconds,
    covered_s = end_s - first_t, and twa_micro = the average in
    micro-units via truncating division). One window (lead) over the
    per-key series + one hash aggregate — no densification needed,
    the integral is exact on the irregular points themselves.
    """
    if end_s <= start_s:
        raise ValueError("time_weighted_avg: need end > start")
    obs = series.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).cast("long").alias("__t"),
        F.col(value_col).cast("long").alias("__v"),
    ).where((F.col("__t") >= start_s) & (F.col("__t") < end_s))
    w = Window.partitionBy("__k").orderBy("__t", "__v")
    stepped = obs.select(
        "__k",
        "__t",
        "__v",
        F.coalesce(F.lead("__t", 1).over(w), F.lit(end_s).cast("long")).alias(
            "__t_next"
        ),
    )
    return (
        stepped.groupBy("__k")
        .agg(
            F.sum(
                F.col("__v") * (F.col("__t_next") - F.col("__t"))
            ).alias("weighted_sum"),
            (F.lit(end_s).cast("long") - F.min("__t")).alias("covered_s"),
        )
        .select(
            F.col("__k").alias(key_col),
            "weighted_sum",
            "covered_s",
            F.expr("(weighted_sum * 1000000) DIV covered_s").alias(
                "twa_micro"
            ),
        )
    )


def counter_increase(
    series: DataFrame,
    bucket_s: int,
    ts_col: str = "ts_s",
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """Reset-aware counter delta per (key, bucket) — the TimescaleDB
    ``counter_agg``/PromQL ``increase`` semantics for monotonic
    counters that occasionally restart (process restarts, device
    reboots): consecutive samples normally contribute ``cur - prev``;
    a sample BELOW its predecessor is a reset, contributing the
    post-reset reading itself (the counter restarted near zero, so the
    whole new reading is growth since the reset; negative readings
    clamp to 0). The first sample of a key contributes nothing — there
    is no interval to measure yet.

    Determinism contract: samples order by (t, value) per key, so ties
    at the same timestamp diff identically in any engine; a boundary-
    crossing interval attributes to the bucket of its LATER sample
    (the row that carries the diff).

    Plan shape at 100 TB: ONE shuffle (partition by key for the lag
    window — at real scale partition by (key, coarse time range) to
    bound per-task state), then a hash aggregate onto the (key,
    bucket) grid whose cardinality is |keys| x |buckets|, independent
    of sample volume. Output: (key, bucket_s, n_samples, resets,
    increase) — exact integers throughout."""
    if bucket_s <= 0:
        raise ValueError("counter_increase: bucket_s must be positive")
    obs = series.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).cast("long").alias("__t"),
        F.col(value_col).cast("long").alias("__v"),
    )
    w = Window.partitionBy("__k").orderBy("__t", "__v")
    stepped = obs.select(
        "__k",
        "__t",
        "__v",
        F.lag("__v", 1).over(w).alias("__prev"),
    )
    contrib = (
        F.when(F.col("__prev").isNull(), F.lit(0))
        .when(F.col("__v") >= F.col("__prev"), F.col("__v") - F.col("__prev"))
        .otherwise(F.greatest(F.col("__v"), F.lit(0)))
    )
    reset = (
        F.col("__prev").isNotNull() & (F.col("__v") < F.col("__prev"))
    ).cast("long")
    return (
        stepped.select(
            "__k",
            _bucket("__t", bucket_s).alias("__b"),
            contrib.alias("__inc"),
            reset.alias("__r"),
        )
        .groupBy("__k", "__b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_samples"),
            F.sum("__r").cast("long").alias("resets"),
            F.sum("__inc").cast("long").alias("increase"),
        )
        .select(
            F.col("__k").alias(key_col),
            F.col("__b").cast("long").alias("bucket_s"),
            "n_samples",
            "resets",
            "increase",
        )
    )
