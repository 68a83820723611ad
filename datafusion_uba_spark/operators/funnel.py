"""Ordered funnel analysis over an event stream.

The reference's one composite query is a two-stage retention funnel
(examples/retention.rs:22-44); this operator generalizes the UBA-side
idea to N ordered steps: a user converts step k when they fire step k's
event AT OR AFTER their step-(k-1) conversion time, within a conversion
window anchored at their step-1 time. Output is the per-step converted
user count — the classic funnel chart input.

Scale design: each step is filter → hash-aggregate(min) → equi-join on
the user key. Every shuffle is on the same key, so after the first
exchange the join inputs are co-partitioned and AQE keeps the small
(later-step) sides broadcast-able as the funnel narrows. Per-user state
is O(1) timestamps — no event-list collection, no window-function sort
over whole partitions.

All timestamps are compared as epoch-micros int64, so semantics are
timezone-free and the DuckDB oracle (queries_uba.py) is exact.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "funnel_steps",
    "funnel_steps_any_anchor",
    "funnel_steps_excluding",
    "funnel_user_times",
]


def funnel_user_times(
    events: DataFrame,
    steps: list[tuple[str, Column]],
    user_col: str = "user_id",
    ts_col: str = "ts",
    conversion_window_days: int = 7,
) -> list[DataFrame]:
    """Per-step (user, first-conversion-micros) tables.

    Returns one DataFrame per step: ``[u, t<k>, t1]`` where ``t<k>`` is
    the user's earliest valid step-k time and ``t1`` anchors the
    conversion window.
    """
    window_us = conversion_window_days * 86_400 * 1_000_000
    base = events.select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col)).alias("tus"),
        *[pred.alias(f"__p{i}") for i, (_, pred) in enumerate(steps)],
    )
    out: list[DataFrame] = []
    prev: DataFrame | None = None
    for i in range(len(steps)):
        cur = base.where(F.col(f"__p{i}")).select("u", "tus")
        if prev is None:
            step_df = cur.groupBy("u").agg(
                F.min("tus").alias("t1")
            ).withColumn("t_step", F.col("t1"))
        else:
            step_df = (
                cur.join(prev.select("u", "t_step", "t1").withColumnRenamed(
                    "t_step", "t_prev"
                ), "u")
                .where(
                    (F.col("tus") >= F.col("t_prev"))
                    & (F.col("tus") <= F.col("t1") + F.lit(window_us))
                )
                .groupBy("u")
                .agg(F.min("tus").alias("t_step"), F.min("t1").alias("t1"))
            )
        out.append(step_df)
        prev = step_df
    return out


def funnel_steps(
    events: DataFrame,
    steps: list[tuple[str, Column]],
    user_col: str = "user_id",
    ts_col: str = "ts",
    conversion_window_days: int = 7,
) -> DataFrame:
    """Funnel conversion counts: one row per step ``(step, step_name,
    users)`` where ``users`` is the number of users who reached that
    step in order within the conversion window.

    SINGLE-ANCHOR semantics, deliberately: the conversion window is
    anchored at each user's globally EARLIEST step-1 event (t1 =
    min over all step-1 events), not re-tried per qualifying anchor. A
    user whose first view is stale but who completes view->click->
    purchase inside the window of a LATER view does not count. This is
    stricter than the any-qualifying-anchor definition some UBA tools
    use; the DuckDB oracle (queries_uba.py) encodes the same rule, and
    it keeps the operator one min-agg + k co-partitioned joins instead
    of a per-anchor backtracking search."""
    per_step = funnel_user_times(
        events, steps, user_col, ts_col, conversion_window_days
    )
    rows = [
        df.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(i + 1).alias("step"),
            F.lit(name).alias("step_name"),
            "users",
        )
        for i, ((name, _), df) in enumerate(zip(steps, per_step))
    ]
    return reduce(lambda a, b: a.unionAll(b), rows)


def funnel_steps_any_anchor(
    events: DataFrame,
    steps: list[tuple[str, Column]],
    user_col: str = "user_id",
    ts_col: str = "ts",
    conversion_window_days: int = 7,
) -> DataFrame:
    """``funnel_steps`` with ANY-QUALIFYING-ANCHOR semantics (the
    ClickHouse-windowFunnel-style definition funnel_steps's docstring
    contrasts itself against): a user converts step k if ANY chain
    e1 <= e2 <= ... <= ek of step events exists with ek within the
    conversion window of e1 — every step-1 event is a candidate anchor,
    not just the globally earliest.

    Not a per-anchor backtracking search: the maximal-anchor chain is
    computed in ONE pass over each user's time-ordered events. Let
    m_i(e) = the best (latest) achievable anchor over all chains ending
    at some step-(i+1) event at-or-before e; then m_0 is a running max
    of step-1 times and m_i is a running max of m_{i-1} sampled at
    step-(i+1) events. A user converts step k iff some step-k event e
    has m_{k-2}(e) >= t(e) - window (choosing the latest anchor is
    optimal because the window constraint only involves the anchor and
    the chain's LAST event — times in between are monotone). Running
    maxes use RANGE windows so same-instant events chain non-strictly,
    matching funnel_steps's ``tus >= t_prev`` rule; DuckDB replays the
    identical RANGE windows in the oracle (queries_uba.py).

    Scale: one shuffle on the user key + one per-partition sort feeds
    all k running maxes and the final per-user flag aggregate — O(1)
    state per row, no event-list collection, vs the k co-partitioned
    joins of funnel_steps. Output: (step, step_name, users) like
    funnel_steps; step-k counts are >= the single-anchor counts by
    construction.
    """
    window_us = conversion_window_days * 86_400 * 1_000_000
    n = len(steps)
    base = events.select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col)).alias("tus"),
        *[pred.alias(f"__p{i}") for i, (_, pred) in enumerate(steps)],
    )
    w = (
        Window.partitionBy("u")
        .orderBy("tus")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = base
    for i in range(n):
        anchor = F.col("tus") if i == 0 else F.col(f"__m{i - 1}")
        df = df.withColumn(f"__b{i}", F.when(F.col(f"__p{i}"), anchor))
        if i < n - 1:  # the last step's running max is never consumed
            df = df.withColumn(f"__m{i}", F.max(f"__b{i}").over(w))
    per_user = df.groupBy("u").agg(
        *[
            F.max(
                F.when(
                    F.col(f"__b{i}") >= F.col("tus") - F.lit(window_us), 1
                ).otherwise(0)
            ).alias(f"__c{i}")
            for i in range(n)
        ]
    )
    counts = per_user.agg(
        *[F.sum(f"__c{i}").alias(f"__n{i}") for i in range(n)]
    )
    out_rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(name).alias("step_name"),
                F.col(f"__n{i}").cast("long").alias("users"),
            )
            for i, (name, _) in enumerate(steps)
        ]
    )
    return counts.select(F.explode(out_rows).alias("r")).select("r.*")


def funnel_steps_excluding(
    events: DataFrame,
    step_a: Column,
    step_c: Column,
    excluded: Column,
    user_col: str = "user_id",
    ts_col: str = "ts",
    conversion_window_days: int = 7,
) -> DataFrame:
    """Two-step funnel with an EXCLUSION step — "did A then C within
    the window, with no B strictly in between" (Amplitude/Mixpanel's
    "did not perform" clause): the organic-conversion question ("
    purchased after a view without clicking the promo") that plain
    funnels can't ask.

    Semantics (single-anchor, matching funnel_steps): t_a = the user's
    first A; t_c = their first C with t_a <= t_c <= t_a + window; the
    conversion is CLEAN when no excluded event falls strictly inside
    (t_a, t_c). Endpoints don't exclude — an excluded event at exactly
    t_a or t_c is outside the open interval, pinned by the oracle and
    the crafted goldens.

    Plan: three filtered scans, each reduced per user before or right
    after an equi-join on the user key — min-agg for A, windowed min
    for C, then ONE anti-join against the excluded events (the
    between-predicate rides as a join residual on co-partitioned user
    keys). All
    shuffles share the user key, so everything downstream of the first
    exchange is co-partitioned; per-user state is two timestamps.
    Output: (day_i of t_a, n_converted, n_clean) per cohort day —
    days since 2024-01-01, the repo convention."""
    window_us = conversion_window_days * 86_400 * 1_000_000
    base = events.select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col)).alias("tus"),
        step_a.alias("__a"),
        step_c.alias("__c"),
        excluded.alias("__x"),
    )
    a = base.where("__a").groupBy("u").agg(F.min("tus").alias("t_a"))
    c = (
        base.where("__c")
        .join(a, "u")
        .where(
            (F.col("tus") >= F.col("t_a"))
            & (F.col("tus") <= F.col("t_a") + F.lit(window_us))
        )
        .groupBy("u")
        .agg(F.min("tus").alias("t_c"), F.min("t_a").alias("t_a"))
    )
    x = base.where("__x").select(
        F.col("u").alias("xu"), F.col("tus").alias("xt")
    )
    clean = c.join(
        x,
        (F.col("u") == F.col("xu"))
        & (F.col("xt") > F.col("t_a"))
        & (F.col("xt") < F.col("t_c")),
        "left_anti",
    )
    day = "CAST(t_a DIV 86400000000 - 19723 AS BIGINT) AS day_i"
    conv = c.selectExpr(day, "u").groupBy("day_i").agg(
        F.count(F.lit(1)).alias("n_converted")
    )
    cln = clean.selectExpr(day, "u").groupBy("day_i").agg(
        F.count(F.lit(1)).alias("n_clean")
    )
    return conv.join(cln, "day_i", "left").select(
        "day_i",
        "n_converted",
        F.coalesce("n_clean", F.lit(0)).cast("long").alias("n_clean"),
    )
