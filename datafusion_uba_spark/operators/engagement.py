"""Rolling-distinct engagement operators: stickiness (DAU / trailing
WAU) and weekly churn.

The shared scale problem: COUNT(DISTINCT) is not algebraic over a
sliding frame, so a window aggregate can't express "distinct users in
the trailing 7 days" and a day-range band join would plan a
nested-loop. The operators here use the two shapes that stay
equi-keyed at any scale:

- **explode-to-anchors** (stickiness): each deduped (day, user) row is
  exploded into the <= W anchor days it contributes to, then a plain
  hash aggregate counts distinct users per anchor. The xW blowup rides
  on |days x users| — the already-deduped frame, ~1e9 rows/year at
  1e8 MAU — never on raw events.
- **shifted anti-join** (churn): activity in week w left-anti-joined
  against itself shifted by one week, all on (wk, user) equi-keys.

Both dedup the raw activity ONCE into a lazily localCheckpointed
frame: the deduped table feeds several consumers and ReuseExchange
does not fire across those branches (measured: 6-8 raw scans per
query without it — see the registry rows' history).

Consumed by the batch registry rows (queries_uba.q_stickiness_wau /
q_churned_weekly, DuckDB-oracle-checked at sf0.01) and pinned against
naive Python set models on generated activity in
tests/test_properties.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "growth_accounting",
    "retention_bitmap",
    "stickiness_wau",
    "stickiness_wau_hll",
    "weekly_churn",
]


def stickiness_wau(
    activity: DataFrame,
    day_col: str = "di",
    id_col: str = "user_id",
    window: int = 7,
) -> DataFrame:
    """(di, dau, wau, stickiness_pm) per active day: exact DAU,
    exact trailing-``window``-day distinct actives, and the integer
    milli-ratio dau*1000 DIV wau (exact across engines — no float
    division). ``activity`` is (integer day index, user id) rows,
    duplicates welcome; only days present in the data are reported."""
    if window < 1:
        raise ValueError(f"stickiness_wau: window must be >= 1, got {window}")
    du = (
        activity.select(
            F.col(day_col).cast("long").alias("di"),
            F.col(id_col).alias("__u"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    # du is already distinct on (di, __u): a plain count IS the
    # distinct count, without the extra distinct-aggregate expansion
    # countDistinct would plan over the |days x users| frame
    dau = du.groupBy("di").agg(F.count(F.lit(1)).alias("dau"))
    wau = (
        du.withColumn(
            "adi", F.explode(F.expr(f"sequence(di, di + {int(window) - 1})"))
        )
        .groupBy("adi")
        .agg(F.countDistinct("__u").alias("wau"))
    )
    days = du.select("di").distinct()
    return (
        days.join(dau, "di")
        .join(wau, days.di == wau.adi)
        .selectExpr(
            "di", "dau", "wau",
            "CAST((dau * 1000) DIV wau AS BIGINT) AS stickiness_pm",
        )
    )


def stickiness_wau_hll(
    activity: DataFrame,
    day_col: str = "di",
    id_col: str = "user_id",
    window: int = 7,
    lgk: int = 12,
) -> DataFrame:
    """The 100 TB stickiness path: ONE pass builds a 4 KiB DataSketches
    HLL per day (`hll_sketch_agg` — mergeable partial state, so the
    raw events map-combine down to |days| sketch rows), then the
    trailing-``window`` WAU is `hll_union_agg` over a RANGE frame on
    the day index — sketches union losslessly, and the RANGE frame
    (not ROWS) keeps calendar semantics across gapped days. The
    windowed union runs over the |days|-row sketch table (365
    rows/year — driver-trivial no matter the event volume), which is
    the whole point: the exact twin's explode-to-anchors rides on
    |days x users|, this rides on |days|.

    Same exact-vs-approx discipline as daily_active_users_hll: the
    exact twin (stickiness_wau) is the correctness anchor, the <2%
    error pin lives in tests/test_llm_ops.py, and the registry row is
    rows-only (DuckDB has no DataSketches twin)."""
    from pyspark.sql import Window

    if window < 1:
        raise ValueError(
            f"stickiness_wau_hll: window must be >= 1, got {window}"
        )
    per_day = (
        activity.select(
            F.col(day_col).cast("long").alias("di"),
            F.col(id_col).alias("__u"),
        )
        .groupBy("di")
        .agg(F.hll_sketch_agg("__u", F.lit(lgk)).alias("__sk"))
    )
    w = Window.orderBy("di").rangeBetween(-(int(window) - 1), 0)
    return per_day.select(
        "di",
        F.hll_sketch_estimate("__sk").alias("dau"),
        F.hll_sketch_estimate(F.hll_union_agg("__sk").over(w)).alias("wau"),
    ).selectExpr(
        "di", "dau", "wau",
        "CAST((dau * 1000) DIV wau AS BIGINT) AS stickiness_pm",
    )


def growth_accounting(
    activity: DataFrame,
    week_col: str = "wk",
    id_col: str = "user_id",
) -> DataFrame:
    """Weekly growth accounting (the a16z/Amplitude MAU-accounting
    decomposition): per activity week, every active user is exactly one
    of **new** (first-ever active week), **retained** (also active the
    previous week), or **resurrected** (active before, but not the
    previous week); **churned** counts users active the PREVIOUS week
    with no activity this week (the week-w negative flow, so
    new + resurrected - churned = net change in weekly actives).
    ``quick_ratio_pm`` is the integer milli-Quick-Ratio
    ``(n_new + n_resurrected) * 1000 DIV n_churned`` (NULL when nothing
    churned) — integer division, so engines agree bit-for-bit.

    Classification needs no first-seen aggregate: after deduping to
    (wk, user), ``lag(wk)`` over the per-user week sequence is NULL
    exactly on the first-ever week, ``wk - 1`` exactly when retained,
    anything else is a resurrection. Scale shape: ONE dedup shuffle of
    the |weeks x users| frame, reused (lazy localCheckpoint — the
    dedup must not rerun per consumer) by the user-partitioned lag
    window, the per-week rollup, and the shifted churn anti-join — the
    weekly_churn discipline. Only weeks present in the activity are
    reported. ``activity`` is (integer week index, user id) rows,
    duplicates welcome."""
    from pyspark.sql import Window

    au = (
        activity.select(
            F.col(week_col).cast("long").alias("wk"),
            F.col(id_col).alias("__u"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev = F.lag("wk").over(Window.partitionBy("__u").orderBy("wk"))
    per_wk = (
        au.withColumn("__prev", prev)
        .groupBy("wk")
        .agg(
            F.sum(
                F.when(F.col("__prev").isNull(), 1).otherwise(0)
            ).alias("n_new"),
            F.sum(
                F.when(F.col("__prev") == F.col("wk") - 1, 1).otherwise(0)
            ).alias("n_retained"),
            F.sum(
                F.when(
                    F.col("__prev").isNotNull()
                    & (F.col("__prev") != F.col("wk") - 1),
                    1,
                ).otherwise(0)
            ).alias("n_resurrected"),
        )
    )
    shifted = au.select((F.col("wk") + 1).alias("wk"), "__u")
    n_churned = (
        shifted.join(au, ["wk", "__u"], "left_anti")
        .groupBy("wk")
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    return (
        per_wk.join(n_churned, "wk", "left")
        .select(
            "wk",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce("n_churned", F.lit(0)).alias("n_churned"),
        )
        .selectExpr(
            "*",
            "CASE WHEN n_churned > 0 THEN CAST((n_new + n_resurrected) "
            "* 1000 DIV n_churned AS BIGINT) END AS quick_ratio_pm",
        )
    )


def weekly_churn(
    activity: DataFrame,
    week_col: str = "wk",
    id_col: str = "user_id",
) -> DataFrame:
    """(wk, n_active, n_churned) per activity week: how many of the
    week's active users have NO activity in the following week. Only
    weeks with a successor week in the data are reported (the trailing
    week has no churn signal yet). ``activity`` is (integer week
    index, user id) rows, duplicates welcome."""
    au = (
        activity.select(
            F.col(week_col).cast("long").alias("wk"),
            F.col(id_col).alias("__u"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    nxt = au.select((F.col("wk") - 1).alias("wk"), "__u")
    churned = au.join(nxt, ["wk", "__u"], "left_anti")
    n_active = au.groupBy("wk").agg(F.count(F.lit(1)).alias("n_active"))
    n_churned = churned.groupBy("wk").agg(
        F.count(F.lit(1)).alias("n_churned")
    )
    weeks_with_next = au.select((F.col("wk") - 1).alias("wk")).distinct()
    return (
        n_active.join(weeks_with_next, "wk", "left_semi")
        .join(n_churned, "wk", "left")
        .select(
            "wk",
            "n_active",
            F.coalesce("n_churned", F.lit(0)).alias("n_churned"),
        )
    )


def retention_bitmap(
    activity: DataFrame,
    day_col: str = "di",
    id_col: str = "user_id",
    window: int = 28,
) -> DataFrame:
    """N-day retention from per-user int64 activity bitmaps — the
    bitmap-index trick behind ClickHouse's retention() and Druid
    theta-sketch retention, here with EXACT counts: each user's first
    ``window`` days of activity (offsets from their own first active
    day) fold into ONE 64-bit mask via ``bit_or(1 << offset)``, and
    the whole retention curve is ``window`` bit-tests over |users|
    single-long rows — no (born x target) pair explosion, no
    per-offset self-joins, per-user state that never grows with
    activity volume.

    Plan: dedup (user, day) once, per-user first day via a user-
    partitioned window, then the mask aggregate rides the SAME hash
    partitioning (no second exchange); the curve is one explode of
    ``window`` offsets over the mask frame plus a window-sized rollup.
    Everyone is active at offset 0 by construction, so the k=0 row IS
    the cohort size; retained_pm is the exact milli-ratio n_k*1000
    DIV n_0 (a max-window over the ``window``-row result, not a data-
    sized one).

    Output: (day_offset, n_users, retained_pm), one row per offset
    with at least one retained user. ``window`` is capped at 63 (the
    sign bit of the long mask stays clear).
    """
    if not 1 <= window <= 63:
        raise ValueError(
            f"retention_bitmap: window must be in [1, 63], got {window}"
        )
    du = activity.select(
        F.col(day_col).cast("long").alias("__di"),
        F.col(id_col).alias("__u"),
    ).distinct()
    w = Window.partitionBy("__u")
    masks = (
        du.withColumn("__d0", F.min("__di").over(w))
        .withColumn("__off", (F.col("__di") - F.col("__d0")).cast("int"))
        .filter(F.col("__off") < window)
        .groupBy("__u")
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), __off)")
            ).alias("__mask")
        )
    )
    curve = (
        masks.select(
            F.explode(
                F.sequence(F.lit(0), F.lit(window - 1))
            ).alias("day_offset"),
            "__mask",
        )
        .filter(F.expr("(shiftright(__mask, day_offset) & 1) = 1"))
        .groupBy(F.col("day_offset").cast("long").alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    cohort = F.max(
        F.when(F.col("day_offset") == 0, F.col("n_users"))
    ).over(Window.partitionBy())
    return curve.withColumn("__cohort", cohort).selectExpr(
        "day_offset",
        "n_users",
        "CAST(n_users * 1000 DIV __cohort AS BIGINT) AS retained_pm",
    )
