"""Exact-integer Kaplan-Meier survival estimation.

Survival analysis is the standard churn-modeling tool a UBA deployment
runs next to retention: where ``retention_count``/``retention_sum``
(the reference's two UDAFs, src/retention/mod.rs:30-107) answer "of the
day-b cohort, how many returned on day b+k", the Kaplan-Meier estimator
answers "what fraction of users survive past lifetime t, correcting for
users we cannot yet observe" (right-censoring). The reference has no
survival operator; this extends the engine's UBA family per the build
brief.

Why exact integers: the textbook estimator S(t) = prod_{t_i <= t}
(1 - d_i / n_i) is a float product whose value depends on ULP-level
rounding of each factor — not hash-verifiable across engines. Here the
product is replaced by the integer recurrence

    S_ppm(t_k) = (S_ppm(t_{k-1}) * (n_k - d_k)) div n_k,   S_ppm(-) = 10^6

(parts-per-million survival, truncating integer division). Every
quantity is int64 and the recurrence is order-deterministic, so DuckDB
replays it bit-for-bit with a recursive CTE.

Overflow bound: S_ppm <= 10^6, so the intermediate product is
<= 10^6 * n_risk; safe for any population up to ~9.2e12 subjects —
far beyond 100 TB of events.

Scale shape: the only data-sized work is ONE hash aggregate collapsing
subjects to the |distinct lifetime| event table (days — O(hundreds) at
any corpus size). The ordered fold then runs over that tiny table via
``aggregate`` on a single collected array — O(|lifetimes|) driver-free
JVM work, the same reassembly pattern as the retention matrix. No
per-row Python, no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["km_curve"]

SCALE_PPM = 1_000_000


def km_curve(
    lifetimes: DataFrame,
    duration_col: str = "duration",
    observed_col: str = "observed",
) -> DataFrame:
    """Kaplan-Meier table from one-row-per-subject lifetimes.

    ``lifetimes`` columns: ``duration_col`` (int64 time units, e.g.
    days between first and last activity) and ``observed_col`` (1 =
    the terminal event was observed, 0 = right-censored).

    Returns (t, n_risk, n_events, n_censored, survival_ppm), one row
    per distinct duration, where survival_ppm is the KM estimate
    scaled to parts-per-million via the exact truncating recurrence
    documented in the module docstring.
    """
    tab = (
        lifetimes.groupBy(F.col(duration_col).cast("long").alias("t"))
        .agg(
            F.sum(F.col(observed_col).cast("long")).alias("d"),
            F.sum(F.lit(1) - F.col(observed_col).cast("long")).alias("c"),
        )
    )
    # |distinct t| rows -> one array row; the fold threads (survival,
    # remaining-at-risk) through the ordered event times.
    packed = tab.agg(
        F.sort_array(F.collect_list(F.struct("t", "d", "c"))).alias("arr")
    )
    folded = packed.select(
        F.expr(
            f"""
            aggregate(
              arr,
              struct(
                CAST({SCALE_PPM} AS BIGINT) AS s,
                aggregate(arr, CAST(0 AS BIGINT), (a, x) -> a + x.d + x.c)
                  AS rem,
                CAST(array() AS
                  array<struct<t:bigint,n_risk:bigint,d:bigint,
                               c:bigint,s:bigint>>) AS out
              ),
              (acc, x) -> struct(
                (acc.s * (acc.rem - x.d)) div acc.rem AS s,
                acc.rem - x.d - x.c AS rem,
                array_append(
                  acc.out,
                  struct(x.t AS t, acc.rem AS n_risk, x.d AS d,
                         x.c AS c,
                         (acc.s * (acc.rem - x.d)) div acc.rem AS s)
                ) AS out
              ),
              acc -> acc.out
            )
            """
        ).alias("rows")
    )
    return folded.select(F.explode("rows").alias("r")).select(
        F.col("r.t").alias("t"),
        F.col("r.n_risk").alias("n_risk"),
        F.col("r.d").alias("n_events"),
        F.col("r.c").alias("n_censored"),
        F.col("r.s").alias("survival_ppm"),
    )
