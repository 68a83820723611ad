"""Cohort retention operators, Spark-first.

Semantics re-implement (NOT translate) the reference UDAFs:

- ``retention_count(born_event, target_event, max_unit, time_diff)
  GROUP BY user`` → per-user ``[born, target]`` day-bitmap pair
  (reference: src/retention/retention_count.rs:26-177, signature
  src/retention/mod.rs:30-65).
- ``retention_sum(stats)`` (global aggregate) → triangular retention
  matrix: row 0 = cohort sizes per day, row b+1 = retained-user counts
  for the day-b cohort by day offset
  (reference: src/retention/retention_sum.rs:52-221, signature
  src/retention/mod.rs:67-107).

Pinned golden behavior (reference tests tests/retention_count.rs,
tests/retention_sum.rs, tests/sqllogictests/test_files/retention.slt):

- target-day code is 0/1/2; 2 means "the target hit on day d came from a
  row that is ALSO a born event" — retention_sum uses it to suppress
  same-day self-retention when born == target event
  (retention_count.rs:107-113, retention_sum.rs:92-106).
- The reference is order-dependent when a user has both a born+target
  row and a target-only row on the same day (last row wins in one
  accumulator, max wins across partials). We define it deterministically
  as max: 2 if any row that day is born∧target, else 1 if any row is
  target (SURVEY.md §2.1).

Scale design
------------

``retention_count`` compiles the window into ``2*(max_unit+1)`` tiny
``MAX(CASE WHEN …)`` aggregates — ONE hash aggregate with O(window)
fixed-size state per group, map-side partial aggregation, and
whole-stage codegen. No collect_list (unbounded per-user state) and no
second shuffle. This is exactly the reference's two-phase accumulator
contract (update/merge = MAX), expressed so Catalyst runs it natively.

``retention_sum`` must sum ragged per-user matrices. Collecting all
users into one array (``aggregate(collect_list(…))``) is wrong at
100 TB; instead each user's matrix is expanded to (row, col, value)
cells with generator expressions and summed by (row, col) — a native
partial+final hash aggregate over ~m²/2 small rows per user — then the
(m+1)-row result is reassembled. Only the final (tiny, O(m²)-cell)
reassembly collects.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# Above this window length the unrolled 2*(max_unit+1) aggregates fall
# out of whole-stage codegen (64KB JVM method limit); auto switches to
# the scatter strategy instead.
UNROLL_LIMIT = 90


def retention_count(
    df: DataFrame,
    born_event: Column | str,
    target_event: Column | str,
    max_unit: int,
    time_diff: Column | str,
    group_by: str | Sequence[str] = "distinct_id",
    out: str = "stats",
    strategy: str = "auto",
) -> DataFrame:
    """Per-user cohort bitmaps: ``[born, target]``, each ``max_unit+1`` wide.

    born[d]   = 1 if any row with time_diff=d has born_event.
    target[d] = 2 if any row with time_diff=d has born_event AND
                target_event (same row), else 1 if any row has
                target_event, else 0.

    Rows with ``time_diff`` outside [0, max_unit] are ignored (the
    reference requires queries to constrain the window and would
    index-OOB otherwise; retention_count.rs:90-94).

    Output column ``out`` is ``array<array<tinyint>>`` (tinyint for the
    0/1/2 codes — Spark has no unsigned byte; values fit).

    ``strategy``:

    - ``"unrolled"``: ONE hash aggregate with 2*(max_unit+1) tiny
      ``MAX(CASE WHEN ...)`` states. Best plan for dashboards-size
      windows, but the generated code grows linearly with the window
      and exits whole-stage codegen past ~the 64KB JVM method limit.
    - ``"scatter"``: pre-aggregate the 0/1/2 codes per (group, day) —
      a native hash aggregate whose state is constant-size — then
      ``collect_list(struct(day, b, t))`` per group (bounded by active
      days, not window width) and scatter into dense arrays with
      ``transform(sequence(...))``. Two shuffles, but codegen-safe at
      any window length.
    - ``"auto"``: unrolled up to UNROLL_LIMIT days, scatter beyond.
    """
    born = _col(born_event)
    target = _col(target_event)
    td = _col(time_diff)
    m = int(max_unit) + 1
    if m <= 0:
        raise ValueError("max_unit must be >= 0")
    if strategy not in ("auto", "unrolled", "scatter"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "auto":
        strategy = "unrolled" if m <= UNROLL_LIMIT else "scatter"
    keys = [group_by] if isinstance(group_by, str) else list(group_by)

    if strategy == "scatter":
        # NB rows with time_diff outside [0, m) are dropped here (the
        # unrolled plan no-ops them); under the operator contract the
        # input is already windowed, so the two strategies agree.
        per_day = (
            df.where(td.between(0, m - 1))
            .groupBy(*[F.col(k) for k in keys], td.cast("int").alias("__d"))
            .agg(
                F.max(F.when(born, 1).otherwise(0)).alias("__b"),
                F.max(
                    F.when(born & target, 2).when(target, 1).otherwise(0)
                ).alias("__t"),
            )
        )
        return _scatter_stats(per_day, keys, m, out)

    aggs = []
    for d in range(m):
        hit = td == d
        aggs.append(F.max(F.when(born & hit, 1).otherwise(0)).alias(f"__b{d}"))
        aggs.append(
            F.max(
                F.when(born & target & hit, 2)
                .when(target & hit, 1)
                .otherwise(0)
            ).alias(f"__t{d}")
        )

    g = df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
    born_arr = F.array(*[F.col(f"__b{d}").cast("tinyint") for d in range(m)])
    target_arr = F.array(*[F.col(f"__t{d}").cast("tinyint") for d in range(m)])
    return g.select(*keys, F.array(born_arr, target_arr).alias(out))


def _scatter_stats(
    per_day: DataFrame, keys: list[str], m: int, out: str
) -> DataFrame:
    """Scatter a per-(group, day) 0/1/2 code table (columns ``__d``,
    ``__b``, ``__t``) into dense per-group ``[born, target]`` arrays.

    collect_list state is bounded by a group's ACTIVE days (<= m), not
    by its event count — the per-day pre-aggregate has already merged
    events — so this is codegen-safe and O(window) per group at any
    window length."""
    per_user = per_day.groupBy(*[F.col(k) for k in keys]).agg(
        F.map_from_entries(
            F.collect_list(F.struct("__d", F.struct("__b", "__t")))
        ).alias("__m")
    )
    day_seq = F.sequence(F.lit(0), F.lit(m - 1))
    born_arr = F.transform(
        day_seq,
        lambda d: F.coalesce(
            F.element_at("__m", d)["__b"], F.lit(0)
        ).cast("tinyint"),
    )
    target_arr = F.transform(
        day_seq,
        lambda d: F.coalesce(
            F.element_at("__m", d)["__t"], F.lit(0)
        ).cast("tinyint"),
    )
    return per_user.select(*keys, F.array(born_arr, target_arr).alias(out))


def flags_to_stats(
    flags: DataFrame,
    start_date: str,
    max_unit: int,
    user_col: str = "user_id",
    day_col: str = "day",
    born_col: str = "born",
    target_col: str = "target",
    out: str = "stats",
) -> DataFrame:
    """Rebuild per-user ``[born, target]`` stats arrays from a
    (user, day, born, target) code table — the batch half of the
    streaming retention pipeline.

    ``streaming/__init__.py::streaming_user_day_flags`` maintains the
    per-(user, day) 0/1/2 codes incrementally and lands them in a sink;
    this function is the promised "cheap batch query over the sink":
    re-aggregate by MAX (the sink may hold several appends of the same
    key at different watermarks — MAX is the operator's merge rule, so
    replays are idempotent), scatter into dense arrays, and feed
    ``retention_sum``. Parity with the one-shot batch ``retention()``
    is pinned by tests/test_streaming.py::test_flags_to_stats_matches_batch_retention.
    """
    import datetime

    m = int(max_unit) + 1
    if m <= 0:
        raise ValueError("max_unit must be >= 0")
    # an unparseable start_date would make datediff null and silently
    # filter every row — fail eagerly instead
    datetime.date.fromisoformat(start_date)
    d = F.datediff(F.col(day_col), F.lit(start_date).cast("date"))
    per_day = (
        flags.where(d.between(0, m - 1))
        .groupBy(F.col(user_col), d.cast("int").alias("__d"))
        .agg(
            F.max(born_col).alias("__b"),
            F.max(target_col).alias("__t"),
        )
    )
    return _scatter_stats(per_day, [user_col], m, out)


def _user_matrix(stats: Column) -> Column:
    """One user's ragged contribution matrix U (m+1 rows) as a Column.

    U[0]       = born (as bigint)
    U[b+1][k]  = born[b] * adjTarget(b, b+k), k in [0, m-b)
    adjTarget(b, t) = 0 if target[t]==2 and t==b, 1 if target[t]==2,
                      else target[t]
    (reference: retention_sum.rs:85-131)
    """
    born = stats.getItem(0)
    target = stats.getItem(1)
    m = F.size(born)

    row0 = F.array(F.transform(born, lambda v: v.cast("long")))

    def cell(b: Column, t: Column) -> Column:
        tv = F.element_at(target, t + 1).cast("long")
        adj = F.when(tv == 2, F.when(t == b, F.lit(0)).otherwise(F.lit(1))).otherwise(tv)
        return (F.element_at(born, b + 1).cast("long") * adj).cast("long")

    rows = F.transform(
        F.sequence(F.lit(0), m - 1),
        lambda b: F.transform(F.sequence(b, m - 1), lambda t: cell(b, t)),
    )
    return F.concat(row0, rows)


def retention_sum(
    df: DataFrame,
    stats: Column | str = "stats",
    out: str = "retention",
) -> DataFrame:
    """Fold per-user ``[born, target]`` bitmaps into the retention matrix.

    Returns a 1-row DataFrame with column ``out`` of type
    ``array<array<bigint>>``: element-wise sum of every user's ragged
    matrix (see ``_user_matrix``). Scalable plan: explode to
    (i, j, value) cells → native hash aggregate SUM by (i, j) → tiny
    reassembly (O(m²) rows).
    """
    s = _col(stats)
    u = _user_matrix(s)

    cells = (
        df.where(s.isNotNull())
        .select(F.posexplode(u).alias("__i", "__row"))
        .select("__i", F.posexplode("__row").alias("__j", "__v"))
    )
    summed = cells.groupBy("__i", "__j").agg(F.sum("__v").alias("__s"))
    rows_df = summed.groupBy("__i").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__j", "__s"))),
            lambda x: x["__s"],
        ).alias("__rowvals")
    )
    return rows_df.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__i", "__rowvals"))),
            lambda x: x["__rowvals"],
        ).alias(out)
    )


def retention(
    df: DataFrame,
    born_event: Column | str,
    target_event: Column | str,
    max_unit: int,
    time_diff: Column | str,
    group_by: str | Sequence[str] = "distinct_id",
    out: str = "retention",
) -> DataFrame:
    """The reference's two-stage funnel in one chained query.

    Equivalent of ``SELECT retention_sum(stats) FROM (SELECT
    retention_count(...) AS stats ... GROUP BY user)`` — reference
    examples/retention.rs:22-44 / retention.slt:46-56. Catalyst
    pipelines both stages; no materialization boundary.
    """
    counted = retention_count(
        df, born_event, target_event, max_unit, time_diff, group_by, out="stats"
    )
    return retention_sum(counted, "stats", out=out)
