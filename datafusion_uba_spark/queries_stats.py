"""Statistical-analytics inventory: survival analysis, graph
centrality, time-series autocorrelation, and experiment significance.

These extend the engine's UBA family (queries_uba.py) with the four
standard *statistical* readouts a product-analytics deployment computes
from the same event stream: how long users survive (Kaplan-Meier),
which event types anchor user journeys (PageRank over the transition
graph), how self-similar the revenue series is (lag-k autocorrelation),
and whether an experiment moved a metric (chi-square). The reference
has none of these (its surface is the two retention UDAFs,
src/retention/mod.rs:30-107); they are driver-mandated extensions.

Determinism contract (the registry's hash gate): every row is either
pure int64 (survival, pagerank — truncating scaled-integer recurrences)
or doubles derived from *exact integer moments* by IEEE-deterministic
operations only (cast, +, -, *, /, sqrt — all correctly rounded per
IEEE-754, unlike ln/exp), so Spark and DuckDB produce bit-identical
values with no float tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datafusion_uba_spark.operators.pagerank import (
    PROB_SCALE,
    RANK_SCALE,
    pagerank_integer,
)
from datafusion_uba_spark.operators.survival import km_curve
from datafusion_uba_spark.sources import load_table

_CENSOR_DAYS = 14  # lifetimes ending within 14d of corpus end are censored
_N_LAGS = 7
_CHI2_CRIT_95 = 3.841459  # chi-square df=1 alpha=0.05


# ---------------------------------------------------------------------------
# Kaplan-Meier survival over user lifetimes
# ---------------------------------------------------------------------------


def q_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier churn curve (operators/survival.py): a user's
    lifetime is first-to-last active day; users still active within
    the trailing censor window are right-censored. One hash aggregate
    collapses users to the tiny |distinct lifetime| table; the exact
    ppm recurrence folds it ordered. The corpus-end scalar rides a
    1-row broadcast join (no global window over users)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("fd"),
        F.max(F.to_date("ts")).alias("ld"),
    )
    mx = ev.agg(F.max(F.to_date("ts")).alias("mx"))
    life = per_user.crossJoin(F.broadcast(mx)).select(
        F.datediff("ld", "fd").cast("long").alias("duration"),
        (F.datediff("mx", "ld") >= F.lit(_CENSOR_DAYS))
        .cast("long")
        .alias("observed"),
    )
    return km_curve(life)


_ORACLE_SURVIVAL = f"""
WITH RECURSIVE per_user AS (
  SELECT user_id,
         min(CAST(ts AS DATE)) AS fd,
         max(CAST(ts AS DATE)) AS ld
  FROM events GROUP BY user_id
),
life AS (
  SELECT date_diff('day', fd, ld) AS duration,
         CASE WHEN date_diff(
                'day', ld, (SELECT max(CAST(ts AS DATE)) FROM events)
              ) >= {_CENSOR_DAYS}
              THEN 1 ELSE 0 END AS observed
  FROM per_user
),
tab AS (
  SELECT CAST(duration AS BIGINT) AS t,
         CAST(sum(observed) AS BIGINT) AS d,
         CAST(sum(1 - observed) AS BIGINT) AS c
  FROM life GROUP BY duration
),
ordered AS (
  SELECT t, d, c, row_number() OVER (ORDER BY t) AS rn FROM tab
),
km AS (
  SELECT o.rn, o.t, tot.n AS n_risk, o.d, o.c,
         CAST((1000000 * (tot.n - o.d)) // tot.n AS BIGINT) AS s
  FROM ordered o,
       (SELECT CAST(sum(d + c) AS BIGINT) AS n FROM tab) tot
  WHERE o.rn = 1
  UNION ALL
  SELECT o.rn, o.t,
         km.n_risk - km.d - km.c AS n_risk, o.d, o.c,
         CAST((km.s * (km.n_risk - km.d - km.c - o.d))
              // (km.n_risk - km.d - km.c) AS BIGINT) AS s
  FROM km JOIN ordered o ON o.rn = km.rn + 1
)
SELECT t, n_risk, d AS n_events, c AS n_censored, s AS survival_ppm
FROM km
"""


# ---------------------------------------------------------------------------
# PageRank over the event-type transition graph
# ---------------------------------------------------------------------------

_PR_ITERS = 10


def q_event_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the same consecutive-pair stream as
    event_transitions (identical (ts, event_id) total order), folded
    to the |types|^2 edge table in one shuffle, then 10 exact-integer
    power-iteration rounds (operators/pagerank.py) on that tiny table
    — broadcast joins only, rank mass on the 10^12 grid."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    pairs = ev.select(
        F.lag("event_type").over(w).alias("src"),
        F.col("event_type").alias("dst"),
    )
    edges = (
        pairs.where(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    ranks = pagerank_integer(edges, iters=_PR_ITERS)
    return ranks.select(
        F.col("node").alias("event_type"), "rank_scaled"
    )


def _pagerank_oracle(iters: int) -> str:
    """Unrolled power iteration (DuckDB recursive CTEs cannot aggregate
    over the recursive reference, so each round is a plain CTE level —
    the same chained-aggregate shape the Spark loop builds)."""
    head = f"""
WITH pairs AS (
  SELECT lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS src,
         event_type AS dst
  FROM events
),
e AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS w
  FROM pairs WHERE src IS NOT NULL GROUP BY src, dst
),
ep AS (
  SELECT src, dst,
         CAST((w * {PROB_SCALE})
              // (sum(w) OVER (PARTITION BY src)) AS BIGINT) AS p_ppm
  FROM e
),
nodes AS (
  SELECT DISTINCT node
  FROM (SELECT src AS node FROM e UNION SELECT dst FROM e)
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
r0 AS (
  SELECT node, CAST({RANK_SCALE} // nn.n AS BIGINT) AS r
  FROM nodes, nn
)"""
    levels = []
    for k in range(1, iters + 1):
        levels.append(f""",
r{k} AS (
  SELECT n2.node,
         CAST(tp.t + COALESCE(cf.inflow, 0) AS BIGINT) AS r
  FROM nodes n2
  CROSS JOIN (SELECT (15 * {RANK_SCALE}) // (100 * n) AS t FROM nn) tp
  LEFT JOIN (
    SELECT ep.dst AS node,
           SUM((85 * ((p.r * ep.p_ppm) // {PROB_SCALE})) // 100) AS inflow
    FROM ep JOIN r{k - 1} p ON ep.src = p.node
    GROUP BY ep.dst
  ) cf ON cf.node = n2.node
)"""
        )
    tail = f"""
SELECT node AS event_type, r AS rank_scaled FROM r{iters}
"""
    return head + "".join(levels) + tail


_ORACLE_PAGERANK = _pagerank_oracle(_PR_ITERS)


# ---------------------------------------------------------------------------
# Lag-k autocorrelation of daily revenue
# ---------------------------------------------------------------------------


def q_daily_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson autocorrelation of the zero-filled daily revenue-cents
    series at lags 1..7. All five moments (n, sums, cross/ square
    sums) are exact integers — cents summed as decimal(38,0), so the
    moment sums cannot overflow at any corpus size — and the final r
    is assembled from them with IEEE-deterministic double ops only
    (cast / * / - / / / sqrt), bit-identical across engines. The lag
    fan-out is an explode (no join against a lag table); pairing is
    one equi-join of the tiny daily series with itself."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    spine = (
        ev.agg(
            F.min(F.to_date("ts")).alias("d0"),
            F.max(F.to_date("ts")).alias("d1"),
        )
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    series = spine.join(daily, "day", "left").select(
        "day", F.coalesce("cents", F.lit(0).cast("long")).alias("x")
    )
    fan = series.select(
        F.explode(F.sequence(F.lit(1), F.lit(_N_LAGS))).alias("lag"),
        F.col("day"),
        F.col("x").alias("xa"),
    )
    b = series.select(
        F.col("day").alias("day_b"), F.col("x").alias("xb")
    )
    paired = fan.join(
        b, F.expr("date_add(day, lag)") == F.col("day_b"), "inner"
    )
    dec = "decimal(38,0)"
    m = paired.groupBy(F.col("lag").cast("long").alias("lag")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("xa").cast(dec)).alias("sx"),
        F.sum(F.col("xb").cast(dec)).alias("sy"),
        F.sum((F.col("xa").cast(dec) * F.col("xb").cast(dec))).alias("sxy"),
        F.sum((F.col("xa").cast(dec) * F.col("xa").cast(dec))).alias("sxx"),
        F.sum((F.col("xb").cast(dec) * F.col("xb").cast(dec))).alias("syy"),
    )
    return m.select(
        "lag",
        "n_pairs",
        F.expr(
            """
            CASE WHEN (CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0.0
                   OR (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) = 0.0
                 THEN NULL
                 ELSE (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
            END
            """
        ).alias("autocorr"),
    )


_ORACLE_AUTOCORR = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
),
spine AS (
  SELECT CAST(unnest(generate_series(
           (SELECT min(CAST(ts AS DATE)) FROM events),
           (SELECT max(CAST(ts AS DATE)) FROM events),
           INTERVAL 1 DAY)) AS DATE) AS day
),
series AS (
  SELECT s.day, COALESCE(d.cents, 0) AS x
  FROM spine s LEFT JOIN daily d ON s.day = d.day
),
fan AS (
  SELECT l.lag, s.day, s.x AS xa
  FROM series s
  CROSS JOIN (SELECT unnest(generate_series(1, {_N_LAGS})) AS lag) l
),
paired AS (
  SELECT f.lag, f.xa, b.x AS xb
  FROM fan f JOIN series b ON f.day + CAST(f.lag AS INTEGER) = b.day
),
m AS (
  SELECT CAST(lag AS BIGINT) AS lag,
         CAST(count(*) AS BIGINT) AS n_pairs,
         sum(CAST(xa AS HUGEINT)) AS sx,
         sum(CAST(xb AS HUGEINT)) AS sy,
         sum(CAST(xa AS HUGEINT) * CAST(xb AS HUGEINT)) AS sxy,
         sum(CAST(xa AS HUGEINT) * CAST(xa AS HUGEINT)) AS sxx,
         sum(CAST(xb AS HUGEINT) * CAST(xb AS HUGEINT)) AS syy
  FROM paired GROUP BY 1
)
SELECT lag, n_pairs,
       CASE WHEN (CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0.0
              OR (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) = 0.0
            THEN NULL
            ELSE (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       END AS autocorr
FROM m
"""


# ---------------------------------------------------------------------------
# Chi-square A/B conversion significance
# ---------------------------------------------------------------------------


_CONV_WINDOW_DAYS = 7


def q_ab_conversion_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2x2 chi-square test per target event type, arms split by the
    same stateless md5-nibble rule as ab_assignment_report (replayable
    by the oracle, unlike xxhash64). Conversion = the user performed
    the target event within 7 days of their own first activity (the
    standard activation-window metric; "ever did X" is degenerate on a
    long-lived corpus — every user eventually does everything). Counts
    are exact longs from two hash aggregates (per-variant user totals;
    per-(type, variant) converter counts over the distinct early
    (user, type) projection); the chi-square statistic is assembled
    from those integers with IEEE-deterministic double ops, so even
    the significance boolean is hash-exact. No cross join: the 2-row
    totals broadcast onto the per-type counts."""
    ev = load_table(spark, sf_dir, "events")
    variant = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8",
        F.lit("A"),
    ).otherwise(F.lit("B"))
    firsts = ev.groupBy("user_id").agg(F.min("ts").alias("f0"))
    totals = (
        firsts.select(variant.alias("variant"))
        .groupBy("variant")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    conv = (
        ev.join(firsts, "user_id")
        .where(
            F.col("ts")
            < F.col("f0") + F.expr(f"INTERVAL {_CONV_WINDOW_DAYS} DAYS")
        )
        .select("user_id", "event_type")
        .distinct()
        .select(variant.alias("variant"), "event_type")
        .groupBy("event_type", "variant")
        .agg(F.count(F.lit(1)).alias("n_conv"))
    )
    # Cross the 2-row totals onto EVERY target type before pivoting:
    # a type with zero converters in one arm must still contribute
    # (n_users, 0) to that arm's 2x2 cell, otherwise the strongest
    # one-sided effects (all conversions in one arm) get NULL totals
    # and are silently reported non-significant.
    grid = (
        conv.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(totals))
    )
    cells = grid.join(conv, ["event_type", "variant"], "left").select(
        "event_type",
        "variant",
        "n_users",
        F.coalesce("n_conv", F.lit(0)).alias("n_conv"),
    )
    wide = (
        cells.groupBy(F.col("event_type").alias("target_type"))
        .agg(
            F.max(F.when(F.col("variant") == "A", F.col("n_users")))
            .cast("long")
            .alias("a_users"),
            F.max(F.when(F.col("variant") == "A", F.col("n_conv")))
            .cast("long")
            .alias("a_conv"),
            F.max(F.when(F.col("variant") == "B", F.col("n_users")))
            .cast("long")
            .alias("b_users"),
            F.max(F.when(F.col("variant") == "B", F.col("n_conv")))
            .cast("long")
            .alias("b_conv"),
        )
    )
    chi2 = F.expr(
        """
        CASE WHEN (CAST(a_conv + b_conv AS DOUBLE)
                   * CAST(a_users - a_conv + b_users - b_conv AS DOUBLE)
                   * CAST(a_users AS DOUBLE) * CAST(b_users AS DOUBLE)) = 0.0
             THEN NULL
             ELSE (CAST(a_users + b_users AS DOUBLE)
                   * (CAST(a_conv AS DOUBLE)
                        * CAST(b_users - b_conv AS DOUBLE)
                      - CAST(a_users - a_conv AS DOUBLE)
                        * CAST(b_conv AS DOUBLE))
                   * (CAST(a_conv AS DOUBLE)
                        * CAST(b_users - b_conv AS DOUBLE)
                      - CAST(a_users - a_conv AS DOUBLE)
                        * CAST(b_conv AS DOUBLE)))
                  / (CAST(a_conv + b_conv AS DOUBLE)
                     * CAST(a_users - a_conv + b_users - b_conv AS DOUBLE)
                     * CAST(a_users AS DOUBLE) * CAST(b_users AS DOUBLE))
        END
        """
    )
    return wide.select(
        "target_type",
        "a_users",
        "a_conv",
        "b_users",
        "b_conv",
        chi2.alias("chi2"),
        F.coalesce(chi2 > F.lit(_CHI2_CRIT_95), F.lit(False)).alias(
            "significant"
        ),
    )


_ORACLE_AB_CHI2 = f"""
WITH firsts AS (
  SELECT user_id, min(ts) AS f0 FROM events GROUP BY user_id
),
tagged AS (
  SELECT user_id,
         CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
              THEN 'A' ELSE 'B' END AS variant,
         f0
  FROM firsts
),
totals AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n_users
  FROM tagged GROUP BY variant
),
conv AS (
  SELECT t.variant, e.event_type, CAST(count(*) AS BIGINT) AS n_conv
  FROM (
    SELECT DISTINCT ev.user_id, ev.event_type
    FROM events ev JOIN tagged tg ON ev.user_id = tg.user_id
    WHERE ev.ts < tg.f0 + INTERVAL {_CONV_WINDOW_DAYS} DAY
  ) e
  JOIN tagged t ON e.user_id = t.user_id
  GROUP BY t.variant, e.event_type
),
grid AS (
  SELECT ty.event_type, t.variant, t.n_users
  FROM (SELECT DISTINCT event_type FROM conv) ty CROSS JOIN totals t
),
cells AS (
  SELECT g.event_type, g.variant, g.n_users,
         CAST(COALESCE(c.n_conv, 0) AS BIGINT) AS n_conv
  FROM grid g LEFT JOIN conv c
    ON g.event_type = c.event_type AND g.variant = c.variant
),
wide AS (
  SELECT event_type AS target_type,
         CAST(max(CASE WHEN variant = 'A' THEN n_users END)
              AS BIGINT) AS a_users,
         CAST(max(CASE WHEN variant = 'A' THEN n_conv END)
              AS BIGINT) AS a_conv,
         CAST(max(CASE WHEN variant = 'B' THEN n_users END)
              AS BIGINT) AS b_users,
         CAST(max(CASE WHEN variant = 'B' THEN n_conv END)
              AS BIGINT) AS b_conv
  FROM cells
  GROUP BY event_type
)
SELECT target_type, a_users, a_conv, b_users, b_conv,
       CASE WHEN (CAST(a_conv + b_conv AS DOUBLE)
                  * CAST(a_users - a_conv + b_users - b_conv AS DOUBLE)
                  * CAST(a_users AS DOUBLE) * CAST(b_users AS DOUBLE)) = 0.0
            THEN NULL
            ELSE (CAST(a_users + b_users AS DOUBLE)
                  * (CAST(a_conv AS DOUBLE)
                       * CAST(b_users - b_conv AS DOUBLE)
                     - CAST(a_users - a_conv AS DOUBLE)
                       * CAST(b_conv AS DOUBLE))
                  * (CAST(a_conv AS DOUBLE)
                       * CAST(b_users - b_conv AS DOUBLE)
                     - CAST(a_users - a_conv AS DOUBLE)
                       * CAST(b_conv AS DOUBLE)))
                 / (CAST(a_conv + b_conv AS DOUBLE)
                    * CAST(a_users - a_conv + b_users - b_conv AS DOUBLE)
                    * CAST(a_users AS DOUBLE) * CAST(b_users AS DOUBLE))
       END AS chi2,
       COALESCE(CASE WHEN (CAST(a_conv + b_conv AS DOUBLE)
                  * CAST(a_users - a_conv + b_users - b_conv AS DOUBLE)
                  * CAST(a_users AS DOUBLE) * CAST(b_users AS DOUBLE)) = 0.0
            THEN NULL
            ELSE ((CAST(a_users + b_users AS DOUBLE)
                  * (CAST(a_conv AS DOUBLE)
                       * CAST(b_users - b_conv AS DOUBLE)
                     - CAST(a_users - a_conv AS DOUBLE)
                       * CAST(b_conv AS DOUBLE))
                  * (CAST(a_conv AS DOUBLE)
                       * CAST(b_users - b_conv AS DOUBLE)
                     - CAST(a_users - a_conv AS DOUBLE)
                       * CAST(b_conv AS DOUBLE)))
                 / (CAST(a_conv + b_conv AS DOUBLE)
                    * CAST(a_users - a_conv + b_users - b_conv AS DOUBLE)
                    * CAST(a_users AS DOUBLE) * CAST(b_users AS DOUBLE)))
                 > {_CHI2_CRIT_95}
       END, FALSE) AS significant
FROM wide
"""


# ---------------------------------------------------------------------------
# Day-of-week seasonality profile
# ---------------------------------------------------------------------------


def q_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index of revenue in exact ppm: for each
    ISO weekday, total cents, per-day mean (truncating div), and the
    seasonal index (dow mean / overall mean) on the 10^6 grid computed
    entirely in decimal(38,0) integer arithmetic — overflow-free at
    any corpus size. The grand totals come from an unpartitioned
    window over the PER-DOW aggregate, which is always exactly <= 7
    rows — a deliberate, size-bounded use of the global window (no
    scalar cross join, no second scan)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    per = daily.groupBy(
        (F.weekday("day") + F.lit(1)).cast("long").alias("dow")
    ).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("cents").alias("cents_total"),
    )
    w = Window.partitionBy()
    return per.select(
        "dow",
        "n_days",
        "cents_total",
        F.expr("cents_total div n_days").alias("cents_per_day"),
        F.expr(
            "CAST(CAST(cents_total AS DECIMAL(38,0))"
            " * CAST(sum(n_days) OVER () AS DECIMAL(38,0)) * 1000000"
            " div (CAST(n_days AS DECIMAL(38,0))"
            "      * CAST(sum(cents_total) OVER () AS DECIMAL(38,0)))"
            " AS BIGINT)"
        ).alias("seasonal_ppm"),
    )


_ORACLE_DOW = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
),
per AS (
  SELECT CAST(isodow(day) AS BIGINT) AS dow,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(cents) AS BIGINT) AS cents_total
  FROM daily GROUP BY 1
)
SELECT dow, n_days, cents_total,
       cents_total // n_days AS cents_per_day,
       CAST((CAST(cents_total AS HUGEINT)
             * CAST(sum(n_days) OVER () AS HUGEINT) * 1000000)
            // (CAST(n_days AS HUGEINT)
                * CAST(sum(cents_total) OVER () AS HUGEINT))
            AS BIGINT) AS seasonal_ppm
FROM per
"""


# ---------------------------------------------------------------------------
# OLS trend per event type
# ---------------------------------------------------------------------------

_TREND_FINAL = """
    CASE WHEN n_days < 2
           OR (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0.0
         THEN NULL
         ELSE {expr}
    END
"""

_TREND_SLOPE = (
    "(CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)"
    "    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
)
_TREND_INTERCEPT = (
    "(CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))"
    " / (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)"
    "    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
)
_TREND_R2 = (
    "CASE WHEN (CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)"
    "           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) = 0.0"
    " THEN NULL ELSE"
    " ((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)"
    "   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    "  * (CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)"
    "     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))"
    " / ((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)"
    "     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    "    * (CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)"
    "       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
    " END"
)


def q_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of daily revenue cents: slope
    (cents/day), intercept (cents at the type's first active day) and
    r^2, each assembled from exact decimal(38,0) moments with
    IEEE-deterministic double ops only — the daily_autocorr recipe
    applied to regression. The day index is per-type (datediff from
    the type's own min day via one window over the tiny daily table),
    so no global scalar join is needed; OLS slope/r^2 are shift-
    invariant and the intercept is defined at the type's first day."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    w = Window.partitionBy("event_type")
    dec = "decimal(38,0)"
    idx = daily.select(
        "event_type",
        F.datediff("day", F.min("day").over(w)).cast("long").alias("di"),
        "cents",
    )
    m = idx.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col("di").cast(dec)).alias("sx"),
        F.sum(F.col("cents").cast(dec)).alias("sy"),
        F.sum(F.col("di").cast(dec) * F.col("di").cast(dec)).alias("sxx"),
        F.sum(F.col("cents").cast(dec) * F.col("cents").cast(dec)).alias(
            "syy"
        ),
        F.sum(F.col("di").cast(dec) * F.col("cents").cast(dec)).alias(
            "sxy"
        ),
    )
    return m.select(
        "event_type",
        "n_days",
        F.expr(_TREND_FINAL.format(expr=_TREND_SLOPE)).alias("slope"),
        F.expr(_TREND_FINAL.format(expr=_TREND_INTERCEPT)).alias(
            "intercept"
        ),
        F.expr(_TREND_FINAL.format(expr=_TREND_R2)).alias("r2"),
    )


_ORACLE_TREND = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type,
         CAST(date_diff('day',
                        min(day) OVER (PARTITION BY event_type),
                        day) AS BIGINT) AS di,
         cents
  FROM daily
),
m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_days,
         sum(CAST(di AS HUGEINT)) AS sx,
         sum(CAST(cents AS HUGEINT)) AS sy,
         sum(CAST(di AS HUGEINT) * CAST(di AS HUGEINT)) AS sxx,
         sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS syy,
         sum(CAST(di AS HUGEINT) * CAST(cents AS HUGEINT)) AS sxy
  FROM idx GROUP BY 1
)
SELECT event_type, n_days,
       {_TREND_FINAL.format(expr=_TREND_SLOPE)} AS slope,
       {_TREND_FINAL.format(expr=_TREND_INTERCEPT)} AS intercept,
       {_TREND_FINAL.format(expr=_TREND_R2)} AS r2
FROM m
"""


# ---------------------------------------------------------------------------
# Behavioral diversity (Gini-Simpson) per user
# ---------------------------------------------------------------------------


def q_user_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral diversity: the Gini-Simpson index
    1 - sum(p_i^2) over the user's event-type distribution, in exact
    ppm (equivalently 10^6 - Herfindahl concentration) — entropy's
    exact-arithmetic stand-in (Shannon needs ln, which is not
    correctly-rounded cross-engine; Simpson is pure integer rationals:
    simpson_ppm = (10^6 * (C^2 - sum c_i^2)) div C^2). Two chained
    hash aggregates on the user key, no window, no collect."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_type.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.sum("c").alias("n_events"),
            F.sum(F.col("c") * F.col("c")).alias("__ss"),
        )
        .selectExpr(
            "user_id",
            "n_types",
            "n_events",
            "(1000000 * (n_events * n_events - __ss))"
            " div (n_events * n_events) AS simpson_ppm",
        )
    )


_ORACLE_DIVERSITY = """
WITH per_type AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(c) AS BIGINT) AS n_events,
       CAST((1000000 * (CAST(sum(c) AS BIGINT) * CAST(sum(c) AS BIGINT)
                        - CAST(sum(c * c) AS BIGINT)))
            // (CAST(sum(c) AS BIGINT) * CAST(sum(c) AS BIGINT))
            AS BIGINT) AS simpson_ppm
FROM per_type GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Revenue concentration (Gini) across users
# ---------------------------------------------------------------------------


def q_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user revenue in exact ppm. Scalable
    form: users fold to per-user cents (one hash agg), then users
    GROUP BY their cents VALUE — the classic sorted-rank formula
    sum((2i - n - 1) x_i) telescopes over a value group of size k at
    cumulative offset c to v*(2*(c*k + k*(k+1)/2) - k*(n+1)), so the
    only ordered pass is a running-sum window over the |distinct
    values| table (bounded by the cents grid, not |users|; documented
    single-partition window over that reduced table). Everything is
    decimal(38,0) integer arithmetic; one output row."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    vals = per_user.groupBy("cents").agg(F.count(F.lit(1)).alias("k"))
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dec = "decimal(38,0)"
    cum = vals.select(
        F.col("cents").cast(dec).alias("v"),
        F.col("k").cast(dec).alias("k"),
        (F.sum("k").over(w) - F.col("k")).cast(dec).alias("c"),
    )
    # the rank term needs n inside the sum; factor it out:
    # sum(v*(2(ck + k(k+1)/2) - k(n+1))) = A - (n+1)*T with
    # A = sum(v*2*(ck + k(k+1)/2)), T = sum(v*k), n = sum(k)
    agg = cum.agg(
        F.sum("k").alias("__n"),
        F.sum(F.col("v") * F.col("k")).alias("__t"),
        F.sum(
            F.col("v")
            * (
                F.lit(2).cast(dec)
                * (
                    F.col("c") * F.col("k")
                    + F.expr("(k * (k + 1)) div 2").cast(dec)
                )
            )
        ).alias("__a"),
    )
    return agg.selectExpr(
        "CAST(__n AS BIGINT) AS n_users",
        "CAST(__t AS BIGINT) AS total_cents",
        "CAST((1000000 * (__a - (__n + 1) * __t)) div (__n * __t)"
        " AS BIGINT) AS gini_ppm",
    )


_ORACLE_GINI = """
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY user_id
),
vals AS (
  SELECT cents, CAST(count(*) AS BIGINT) AS k
  FROM per_user GROUP BY cents
),
cum AS (
  SELECT CAST(cents AS HUGEINT) AS v,
         CAST(k AS HUGEINT) AS k,
         CAST(sum(k) OVER (ORDER BY cents
                           ROWS UNBOUNDED PRECEDING) - k AS HUGEINT) AS c
  FROM vals
),
agg AS (
  SELECT sum(k) AS n, sum(v * k) AS t,
         sum(v * (2 * (c * k + (k * (k + 1)) // 2))) AS a
  FROM cum
)
SELECT CAST(n AS BIGINT) AS n_users,
       CAST(t AS BIGINT) AS total_cents,
       CAST((1000000 * (a - (n + 1) * t)) // (n * t) AS BIGINT) AS gini_ppm
FROM agg
"""


# ---------------------------------------------------------------------------
# Seasonally-adjusted daily anomaly flags
# ---------------------------------------------------------------------------

_SEASONAL_DEV_PCT = 50  # flag when |x - LOO dow mean| > 50% of it


def q_seasonal_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-aware anomaly flags: a day is anomalous when its
    revenue deviates from its OWN weekday's leave-one-out mean by more
    than 50% — the seasonal companion of metric_anomaly_flags'
    trailing-median baseline (a strong-Monday pattern never flags
    Mondays here). Leave-one-out keeps the tested day out of its own
    baseline and stays exact: the comparison
    |x*(n-1) - (sum-x)| * 100 > pct * (sum-x) is pure int64 (cents ~
    1e7/day at sf0.1: products < 1e12; decimal upgrade documented for
    extreme corpora). Days whose weekday has no other observation are
    unflaggable (NULL baseline, is_anomaly false)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    w = Window.partitionBy(F.weekday("day"))
    loo = daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (F.weekday("day") + F.lit(1)).cast("long").alias("dow"),
        "cents",
        (F.sum("cents").over(w) - F.col("cents")).alias("__rest"),
        (F.count(F.lit(1)).over(w) - F.lit(1)).cast("long").alias("__n1"),
    )
    return loo.selectExpr(
        "day",
        "dow",
        "cents",
        "CASE WHEN __n1 >= 1 THEN __rest div __n1 END AS loo_base_cents",
        f"""
        CASE WHEN __n1 >= 1
             THEN abs(cents * __n1 - __rest) * 100
                  > {_SEASONAL_DEV_PCT} * __rest
             ELSE false END AS is_anomaly
        """,
    )


_ORACLE_SEASONAL_ANOMALY = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
),
loo AS (
  SELECT strftime(d, '%Y-%m-%d') AS day,
         CAST(isodow(d) AS BIGINT) AS dow,
         cents,
         CAST(sum(cents) OVER (PARTITION BY isodow(d)) - cents
              AS BIGINT) AS rest,
         CAST(count(*) OVER (PARTITION BY isodow(d)) - 1
              AS BIGINT) AS n1
  FROM daily
)
SELECT day, dow, cents,
       CASE WHEN n1 >= 1 THEN rest // n1 END AS loo_base_cents,
       CASE WHEN n1 >= 1
            THEN abs(cents * n1 - rest) * 100 > {_SEASONAL_DEV_PCT} * rest
            ELSE false END AS is_anomaly
FROM loo
"""




# ---------------------------------------------------------------------------
# Mann-Whitney U test (rank-sum experiment significance)
# ---------------------------------------------------------------------------

_Z_CRIT_95 = 1.959964  # standard normal two-sided alpha=0.05


def q_mann_whitney_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nonparametric companion to the chi-square row: Mann-Whitney U
    on per-user total revenue cents between the same stateless md5
    arms. Revenue is heavy-tailed, so the rank test is the one a real
    experimentation platform reaches for when the t-test's normality
    assumption fails.

    Hash-exact by the family's determinism contract: midranks over
    ties are kept on the DOUBLED grid (midrank2 = 2*cum_before + n_at
    + 1, an exact integer), the rank sums / tie-correction moments
    are exact decimal(38,0) (n_at^3 reaches ~1e30 at 1e10 users —
    int64 is not enough, same headroom story as session_cooccurrence),
    and the z-score is assembled from those exact integers with
    IEEE-deterministic double ops only (cast, +, -, *, /, sqrt). No
    continuity correction (documented; both engines agree).

    Plan shape: one hash aggregate per user, one per distinct cents
    value, a prefix-sum window over the (bounded by |distinct cents|)
    group frame, and a 1-row final aggregate — no all-pairs ranking.
    The unpartitioned prefix sum runs over the VALUE DOMAIN (distinct
    revenue amounts — a price grid, orders of magnitude below user
    count), never over users; if a deployment's value domain itself
    explodes, the standard upgrade is a two-stage bucketed prefix sum
    (rank within cents-range buckets + per-bucket offsets), same
    shape as topk_per_key's salted two-stage.
    Output one row: (n_a, n_b, r2_a, u2_a, ties_t, z, significant)
    with r2_a/u2_a/ties_t as exact-integer-derived doubles (r2_a =
    2*rank-sum of arm A, u2_a = 2*U_A).
    """
    ev = load_table(spark, sf_dir, "events")
    variant = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8",
        F.lit("A"),
    ).otherwise(F.lit("B"))
    uc = ev.groupBy("user_id").agg(
        # all-NULL values sum to NULL; pin to 0 (a zero-revenue user)
        # because Spark and DuckDB order NULL at opposite ends
        F.coalesce(
            F.sum(F.round(F.col("value") * 100).cast("long")), F.lit(0)
        ).alias("cents")
    ).select(variant.alias("variant"), "cents")
    g = uc.groupBy("cents").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_at"),
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias("na_at"),
    )
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    r = g.select(
        "cents",
        "n_at",
        "na_at",
        (F.sum("n_at").over(w) - F.col("n_at")).alias("before_n"),
    )
    agg = r.agg(
        F.sum("na_at").alias("n_a_d"),
        F.sum(F.col("n_at") - F.col("na_at")).alias("n_b_d"),
        F.sum(
            F.col("na_at")
            * (F.lit(2) * F.col("before_n") + F.col("n_at") + F.lit(1))
        ).alias("r2_a_d"),
        F.sum(
            F.col("n_at") * F.col("n_at") * F.col("n_at") - F.col("n_at")
        ).alias("ties_t_d"),
    )
    return agg.selectExpr(
        "CAST(coalesce(n_a_d, 0) AS BIGINT) AS n_a",
        "CAST(coalesce(n_b_d, 0) AS BIGINT) AS n_b",
        "CAST(coalesce(r2_a_d, 0) AS DOUBLE) AS r2_a",
        "CAST(coalesce(r2_a_d, 0) - coalesce(n_a_d, 0)"
        " * (coalesce(n_a_d, 0) + 1) AS DOUBLE) AS u2_a",
        "CAST(coalesce(ties_t_d, 0) AS DOUBLE) AS ties_t",
        _MW_Z_SQL + " AS z",
        f"coalesce(abs({_MW_Z_SQL}) > {_Z_CRIT_95}, FALSE) AS significant",
    )


# The z expression evaluated IDENTICALLY (token for token) on both
# engines: var = n_a*n_b/12 * ((n+1) - T/(n*(n-1))) with every input an
# exact integer cast to double, z = (U2_A - n_a*n_b) / (2*sqrt(var)).
# The engine-specific part is only the exact-integer column spelling,
# injected via format.
def _mw_z_sql(n_a: str, n_b: str, u2_a: str, t: str) -> str:
    n = f"({n_a} + {n_b})"
    var = (
        f"(CAST({n_a} AS DOUBLE) * CAST({n_b} AS DOUBLE) / 12.0"
        f" * (CAST({n} + 1 AS DOUBLE)"
        f" - CAST({t} AS DOUBLE)"
        f" / (CAST({n} AS DOUBLE) * CAST({n} - 1 AS DOUBLE))))"
    )
    return (
        f"CASE WHEN {n_a} > 0 AND {n_b} > 0 AND {var} > 0.0"
        f" THEN CAST({u2_a} - {n_a} * {n_b} AS DOUBLE)"
        f" / (2.0 * sqrt({var}))"
        f" ELSE NULL END"
    )


_MW_Z_SQL = _mw_z_sql(
    "coalesce(n_a_d, 0)",
    "coalesce(n_b_d, 0)",
    "coalesce(r2_a_d, 0) - coalesce(n_a_d, 0) * (coalesce(n_a_d, 0) + 1)",
    "coalesce(ties_t_d, 0)",
)

_ORACLE_MW_Z = _mw_z_sql("n_a_d", "n_b_d", "r2_a_d - n_a_d * (n_a_d + 1)", "ties_t_d")

_ORACLE_MANN_WHITNEY = f"""
WITH uc AS (
  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
              THEN 'A' ELSE 'B' END AS variant,
         CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0)
              AS BIGINT) AS cents
  FROM events GROUP BY user_id
),
g AS (
  SELECT cents, CAST(count(*) AS HUGEINT) AS n_at,
         CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END)
              AS HUGEINT) AS na_at
  FROM uc GROUP BY cents
),
r AS (
  SELECT cents, n_at, na_at,
         sum(n_at) OVER (ORDER BY cents
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) - n_at AS before_n
  FROM g
),
agg AS (
  SELECT coalesce(CAST(sum(na_at) AS HUGEINT), 0) AS n_a_d,
         coalesce(CAST(sum(n_at - na_at) AS HUGEINT), 0) AS n_b_d,
         coalesce(CAST(sum(na_at * (2 * before_n + n_at + 1))
              AS HUGEINT), 0) AS r2_a_d,
         coalesce(CAST(sum(n_at * n_at * n_at - n_at) AS HUGEINT), 0)
           AS ties_t_d
  FROM r
)
SELECT CAST(n_a_d AS BIGINT) AS n_a,
       CAST(n_b_d AS BIGINT) AS n_b,
       CAST(r2_a_d AS DOUBLE) AS r2_a,
       CAST(r2_a_d - n_a_d * (n_a_d + 1) AS DOUBLE) AS u2_a,
       CAST(ties_t_d AS DOUBLE) AS ties_t,
       {_ORACLE_MW_Z} AS z,
       coalesce(abs({_ORACLE_MW_Z}) > {_Z_CRIT_95}, FALSE) AS significant
FROM agg
"""


# ---------------------------------------------------------------------------
# Benford first-digit profile (transaction-amount data quality)
# ---------------------------------------------------------------------------

# ppm weights of log10(1 + 1/d) for d = 1..9; rounded so they sum to
# exactly 1,000,000 — literal constants, no ln/log in either engine.
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def q_benford_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law conformance of transaction amounts — the classic
    fabricated-data / instrumentation-bug detector: the first
    significant digit of every positive cents amount, observed share
    vs the Benford expectation (ppm literals, no logarithms at
    runtime), and the per-digit chi-square contribution from exact
    integer counts (expected counts kept exact in decimal(38,0) ppm
    units before ONE IEEE division each). Output 9 rows; digits with
    zero observations still appear (grid join), so the result schema
    is corpus-independent."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    first = F.substring(F.col("__c").cast("string"), 1, 1).cast("int")
    counts = (
        ev.select(cents.alias("__c"))
        .where(F.col("__c") > 0)
        .select(first.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grid = spark.createDataFrame(
        [(d, p) for d, p in sorted(_BENFORD_PPM.items())],
        "digit int, expected_ppm long",
    )
    joined = grid.join(counts, "digit", "left").select(
        "digit",
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        "expected_ppm",
    )
    w = Window.partitionBy()
    tot = F.sum("n").over(w)
    return joined.select(
        "digit",
        "n",
        "expected_ppm",
        tot.alias("__tot"),
    ).selectExpr(
        "digit",
        "n",
        "CAST(n * 1000000 DIV greatest(__tot, 1) AS BIGINT) AS share_ppm",
        "expected_ppm",
        # expected count in exact ppm units; ONE division to double
        "CASE WHEN __tot > 0 THEN"
        " (CAST(n AS DOUBLE)"
        "  - CAST(CAST(__tot AS DECIMAL(38,0)) * expected_ppm AS DOUBLE)"
        "    / 1000000.0)"
        " * (CAST(n AS DOUBLE)"
        "  - CAST(CAST(__tot AS DECIMAL(38,0)) * expected_ppm AS DOUBLE)"
        "    / 1000000.0)"
        " / (CAST(CAST(__tot AS DECIMAL(38,0)) * expected_ppm AS DOUBLE)"
        "    / 1000000.0)"
        " ELSE NULL END AS chi2_term",
    ).orderBy("digit")


_ORACLE_BENFORD = f"""
WITH c AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events
  WHERE CAST(round(value * 100) AS BIGINT) > 0
),
counts AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         CAST(count(*) AS BIGINT) AS n
  FROM c GROUP BY 1
),
grid(digit, expected_ppm) AS (
  VALUES {", ".join(f"({d}, CAST({p} AS BIGINT))" for d, p in sorted(_BENFORD_PPM.items()))}
),
j AS (
  SELECT g.digit, CAST(coalesce(c.n, 0) AS BIGINT) AS n, g.expected_ppm,
         CAST(sum(coalesce(c.n, 0)) OVER () AS BIGINT) AS tot
  FROM grid g LEFT JOIN counts c ON g.digit = c.digit
)
SELECT digit, n,
       CAST(n * 1000000 // greatest(tot, 1) AS BIGINT) AS share_ppm,
       expected_ppm,
       CASE WHEN tot > 0 THEN
         (CAST(n AS DOUBLE)
          - CAST(CAST(tot AS HUGEINT) * expected_ppm AS DOUBLE)
            / 1000000.0)
         * (CAST(n AS DOUBLE)
          - CAST(CAST(tot AS HUGEINT) * expected_ppm AS DOUBLE)
            / 1000000.0)
         / (CAST(CAST(tot AS HUGEINT) * expected_ppm AS DOUBLE)
            / 1000000.0)
       ELSE NULL END AS chi2_term
FROM j
ORDER BY digit
"""




# ---------------------------------------------------------------------------
# Pairwise correlation of daily event-type volumes
# ---------------------------------------------------------------------------


def q_event_type_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between the daily volumes of every pair of
    event types that ever share a day — do signups move with
    purchases, do errors anticipate churn. The zero-filled series
    trick WITHOUT materializing a day x type grid: over the corpus's
    D-day span, a type's moments (sum, sum of squares) need only its
    own non-zero day rows, and a pair's cross-moment needs only their
    SHARED days (zeros contribute nothing to any moment except n=D,
    a driver scalar) — so the plan is one (day, type) hash aggregate,
    one tiny per-type aggregate (broadcast twice), and a day-keyed
    self-join bounded by |days| x |types|. Same exact-integer-moments
    -> IEEE-double contract as daily_autocorr, token-identical
    formula on both engines. Pairs never sharing a day are absent
    (documented, mirrors session_cooccurrence).
    Output: (type_a, type_b, n_days_both, corr)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.to_date("ts").alias("day"),
            F.col("event_type").alias("et"),
        )
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("n"))
        .localCheckpoint(eager=False)
    )
    # O(1) driver scalar: the day-span length (the dedup.py fixpoint
    # pattern; a 1-row crossJoin would plan a BroadcastNestedLoopJoin)
    span = ev.agg(
        (
            F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts")))
            + F.lit(1)
        ).alias("d")
    ).collect()[0]["d"]
    d_days = int(span if span is not None else 0)
    per = daily.groupBy("et").agg(
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    a = daily.select(
        "day", F.col("et").alias("type_a"), F.col("n").alias("na")
    )
    b = daily.select(
        "day", F.col("et").alias("type_b"), F.col("n").alias("nb")
    )
    pairs = (
        a.join(b, "day")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days_both"),
            F.sum(F.col("na") * F.col("nb")).alias("sxy"),
        )
    )
    joined = (
        pairs.join(
            F.broadcast(
                per.select(
                    F.col("et").alias("type_a"),
                    F.col("s").alias("sa"),
                    F.col("s2").alias("saa"),
                )
            ),
            "type_a",
        )
        .join(
            F.broadcast(
                per.select(
                    F.col("et").alias("type_b"),
                    F.col("s").alias("sb"),
                    F.col("s2").alias("sbb"),
                )
            ),
            "type_b",
        )
    )
    corr = _corr_sql(str(d_days), "sxy", "sa", "sb", "saa", "sbb")
    return joined.selectExpr(
        "type_a", "type_b", "n_days_both", corr + " AS corr"
    ).orderBy("type_a", "type_b")


def _corr_sql(n: str, sxy: str, sx: str, sy: str, sxx: str, syy: str) -> str:
    """Token-identical Pearson-from-exact-moments SQL for both
    engines (the daily_autocorr contract): guards the zero-variance
    denominators, one division at the end."""
    vx = (
        f"(CAST({n} AS DOUBLE) * CAST({sxx} AS DOUBLE)"
        f" - CAST({sx} AS DOUBLE) * CAST({sx} AS DOUBLE))"
    )
    vy = (
        f"(CAST({n} AS DOUBLE) * CAST({syy} AS DOUBLE)"
        f" - CAST({sy} AS DOUBLE) * CAST({sy} AS DOUBLE))"
    )
    return (
        f"CASE WHEN {vx} = 0.0 OR {vy} = 0.0 THEN NULL"
        f" ELSE (CAST({n} AS DOUBLE) * CAST({sxy} AS DOUBLE)"
        f" - CAST({sx} AS DOUBLE) * CAST({sy} AS DOUBLE))"
        f" / (sqrt({vx}) * sqrt({vy})) END"
    )


_ORACLE_EVENT_TYPE_CORR = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type AS et,
         CAST(count(*) AS HUGEINT) AS n
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT CAST(date_diff('day', min(CAST(ts AS DATE)),
                        max(CAST(ts AS DATE))) + 1 AS BIGINT) AS d
  FROM events
),
per AS (
  SELECT et, CAST(sum(n) AS HUGEINT) AS s,
         CAST(sum(n * n) AS HUGEINT) AS s2
  FROM daily GROUP BY et
),
pairs AS (
  SELECT a.et AS type_a, b.et AS type_b,
         CAST(count(*) AS BIGINT) AS n_days_both,
         CAST(sum(a.n * b.n) AS HUGEINT) AS sxy
  FROM daily a JOIN daily b ON a.day = b.day AND a.et < b.et
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.n_days_both,
       {{corr}} AS corr
FROM pairs p
JOIN per pa ON pa.et = p.type_a
JOIN per pb ON pb.et = p.type_b
CROSS JOIN span
ORDER BY p.type_a, p.type_b
""".replace("{corr}", _corr_sql(
    "span.d", "p.sxy", "pa.s", "pb.s", "pa.s2", "pb.s2"
))


STATS_REGISTRY: dict = {
    "seasonal_anomaly_flags": (
        q_seasonal_anomaly_flags,
        _ORACLE_SEASONAL_ANOMALY,
    ),
    "user_diversity": (q_user_diversity, _ORACLE_DIVERSITY),
    "revenue_gini": (q_revenue_gini, _ORACLE_GINI),
    "revenue_trend": (q_revenue_trend, _ORACLE_TREND),
    "dow_seasonality": (q_dow_seasonality, _ORACLE_DOW),
    "survival_curve": (q_survival_curve, _ORACLE_SURVIVAL),
    "event_pagerank": (q_event_pagerank, _ORACLE_PAGERANK),
    "daily_autocorr": (q_daily_autocorr, _ORACLE_AUTOCORR),
    "ab_conversion_test": (q_ab_conversion_test, _ORACLE_AB_CHI2),
    "mann_whitney_revenue": (q_mann_whitney_revenue, _ORACLE_MANN_WHITNEY),
    "benford_values": (q_benford_values, _ORACLE_BENFORD),
    "event_type_corr": (q_event_type_corr, _ORACLE_EVENT_TYPE_CORR),
}
