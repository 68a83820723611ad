"""Golden tests pinning retention semantics.

Cases come from the reference's unit + slt tests (values recorded in
FIXTURES.md §7 / SURVEY.md §2.1):
  tests/retention_count.rs:60-68,121-129,182-190
  tests/retention_sum.rs:135-143,357-365,478-486
  tests/sqllogictests/test_files/retention.slt:19-22,31-41,46-56
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_uba_spark.operators.retention import (
    retention,
    retention_count,
    retention_sum,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("distinct_id", T.IntegerType(), False),
        T.StructField("event", T.StringType(), False),
        T.StructField("ds", T.IntegerType(), False),
    ]
)


def make_events(spark, rows, partitions=2):
    return spark.createDataFrame(rows, EVENT_SCHEMA).repartition(partitions)


def run_count(spark, rows, born, target, max_unit, base=20230101):
    df = make_events(spark, rows)
    out = retention_count(
        df,
        F.col("event") == born,
        F.col("event") == target,
        max_unit,
        F.col("ds") - base,
    )
    return {r["distinct_id"]: r["stats"] for r in out.collect()}


def to_py(matrix):
    return [list(row) for row in matrix]


# --- retention_count goldens -------------------------------------------------


def test_count_one_day(spark):
    # tests/retention_count.rs:60-68
    rows = [
        (1, "add", 20230101),
        (1, "buy", 20230101),
        (2, "add", 20230101),
        (2, "buy", 20230101),
    ]
    got = run_count(spark, rows, "add", "buy", 0)
    assert to_py(got[1]) == [[1], [1]]
    assert to_py(got[2]) == [[1], [1]]


def test_count_two_day(spark):
    # tests/retention_count.rs:121-129
    rows = [
        (1, "add", 20230101),
        (1, "add", 20230102),
        (1, "buy", 20230101),
        (2, "add", 20230101),
        (2, "buy", 20230102),
    ]
    got = run_count(spark, rows, "add", "buy", 1)
    assert to_py(got[1]) == [[1, 1], [1, 0]]
    assert to_py(got[2]) == [[1, 0], [0, 1]]


def test_count_born_equals_target(spark):
    # tests/retention_count.rs:182-190 — same-event retention; code 2
    rows = [
        (1, "add", 20230101),
        (1, "add", 20230102),
        (2, "add", 20230101),
        (2, "add", 20230102),
    ]
    got = run_count(spark, rows, "add", "add", 1)
    assert to_py(got[1]) == [[1, 1], [2, 2]]
    assert to_py(got[2]) == [[1, 1], [2, 2]]


def test_count_missing_born_event(spark):
    # retention.slt:24-41 — user 1's born event replaced by 'error'
    rows = [
        (1, "error", 20230101),
        (2, "add", 20230101),
        (3, "add", 20230101),
        (1, "buy", 20230101),
        (2, "buy", 20230101),
        (3, "buy", 20230101),
    ]
    got = run_count(spark, rows, "add", "buy", 0)
    assert to_py(got[1]) == [[0], [1]]
    assert to_py(got[2]) == [[1], [1]]
    assert to_py(got[3]) == [[1], [1]]


def test_count_same_day_mixed_rows_deterministic_max(spark):
    # SURVEY §2.1 divergence rule: born∧target row AND target-only row on
    # the same day → 2 (max semantics), regardless of row order.
    rows = [
        (1, "add", 20230101),  # born-only row
        (1, "add", 20230101),  # (duplicate)
        (1, "buy", 20230101),  # target-only row → code 1
    ]
    got = run_count(spark, rows, "add", "buy", 0)
    assert to_py(got[1]) == [[1], [1]]
    # born==target case: the add row is both born and target → 2 wins
    got = run_count(spark, rows, "add", "add", 0)
    assert to_py(got[1]) == [[1], [2]]


def test_count_out_of_window_rows_ignored(spark):
    rows = [
        (1, "add", 20230101),
        (1, "buy", 20230115),  # outside [0, max_unit]
        (1, "buy", 20221230),  # negative offset
    ]
    got = run_count(spark, rows, "add", "buy", 1)
    assert to_py(got[1]) == [[1, 0], [0, 0]]


# --- retention_sum goldens ---------------------------------------------------

STATS_SCHEMA = T.StructType(
    [
        T.StructField("distinct_id", T.IntegerType(), False),
        T.StructField(
            "stats", T.ArrayType(T.ArrayType(T.ByteType()), True), True
        ),
    ]
)


def run_sum(spark, stats_rows):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(stats_rows)], STATS_SCHEMA
    ).repartition(2)
    row = retention_sum(df, "stats").collect()[0]
    return to_py(row["retention"])


def test_sum_same_event(spark):
    # tests/retention_sum.rs:135-143
    assert run_sum(spark, [[[1, 1], [2, 2]], [[1, 1], [2, 2]]]) == [
        [2, 2],
        [0, 2],
        [0],
    ]


def test_sum_two_day(spark):
    # tests/retention_sum.rs:357-365
    assert run_sum(spark, [[[1, 1], [1, 0]], [[1, 0], [0, 1]]]) == [
        [2, 1],
        [1, 1],
        [0],
    ]


def test_sum_three_day(spark):
    # tests/retention_sum.rs:478-486
    assert run_sum(spark, [[[1, 1, 1], [1, 1, 0]], [[1, 0, 0], [0, 0, 1]]]) == [
        [2, 1, 1],
        [1, 1, 1],
        [1, 0],
        [0],
    ]


def test_sum_single_day(spark):
    # retention.slt:46-56 folds three [[1],[1]] users → [[3],[3]]
    assert run_sum(spark, [[[1], [1]]] * 3) == [[3], [3]]


def test_sum_skips_null_stats(spark):
    assert run_sum(spark, [[[1], [1]], None]) == [[1], [1]]


# --- full funnel -------------------------------------------------------------


def test_funnel_slt(spark):
    # retention.slt:46-56
    rows = [
        (1, "add", 20230101),
        (2, "add", 20230101),
        (3, "add", 20230101),
        (1, "buy", 20230101),
        (2, "buy", 20230101),
        (3, "buy", 20230101),
    ]
    df = make_events(spark, rows)
    res = retention(
        df,
        F.col("event") == "add",
        F.col("event") == "buy",
        20230101 - 20230101,
        F.col("ds") - 20230101,
    ).collect()[0]
    assert to_py(res["retention"]) == [[3], [3]]


def test_funnel_any_anchor_vs_single(spark):
    """Pins the semantic split between the two ordered-funnel variants
    on the canonical stale-first-anchor case: user 1's first view is a
    month old, but a later view starts a complete in-window
    view->click->purchase chain. Single-anchor (window fixed at the
    globally earliest view) rejects it; any-anchor accepts. User 4's
    all-same-instant chain pins non-strict (<=) chaining in both."""
    from datafusion_uba_spark.operators.funnel import (
        funnel_steps,
        funnel_steps_any_anchor,
    )

    us_day = 86_400 * 1_000_000
    rows = [
        (1, 0, "view"), (1, 30, "view"), (1, 31, "click"), (1, 32, "purchase"),
        (2, 0, "view"), (2, 3, "click"), (2, 20, "purchase"),
        (3, 1, "click"),
        (4, 5, "view"), (4, 5, "click"), (4, 5, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, day int, event_type string"
    ).select(
        "user_id",
        F.timestamp_micros(F.col("day").cast("long") * us_day).alias("ts"),
        "event_type",
    )
    steps = [(s, F.col("event_type") == s) for s in ("view", "click", "purchase")]
    single = {
        r.step: r.users
        for r in funnel_steps(ev, steps, conversion_window_days=7).collect()
    }
    any_ = {
        r.step: r.users
        for r in funnel_steps_any_anchor(
            ev, steps, conversion_window_days=7
        ).collect()
    }
    assert single == {1: 3, 2: 2, 3: 1}  # step2: u2,u4; step3: u4
    assert any_ == {1: 3, 2: 3, 3: 2}  # + u1 via the day-30 anchor


@pytest.mark.parametrize("partitions", [1, 2, 7])
def test_funnel_partition_invariance(spark, partitions):
    rows = [
        (1, "add", 20230101),
        (1, "buy", 20230102),
        (1, "buy", 20230103),
        (2, "add", 20230102),
        (2, "buy", 20230102),
        (3, "add", 20230101),
        (3, "add", 20230103),
        (3, "buy", 20230103),
    ]
    df = make_events(spark, rows, partitions=partitions)
    res = retention(
        df,
        F.col("event") == "add",
        F.col("event") == "buy",
        2,
        F.col("ds") - 20230101,
    ).collect()[0]
    # row0: born d0=2 (u1,u3), d1=1 (u2), d2=1 (u3)
    # cohort d0 (u1,u3): offsets: u1 buys d1,d2 → [0,1,1]; u3 buys d2 → [0,0,1] → [0,1,2]
    # cohort d1 (u2): u2 buys d1 (offset0) → [1,0]
    # cohort d2 (u3): u3 buys d2 same day, born row is 'add', buy row separate → target[2]=1 → [1]
    assert to_py(res["retention"]) == [[2, 1, 1], [0, 1, 2], [1, 0], [1]]


def test_funnel_exclusion_boundaries(spark):
    """Open-interval exclusion pins: a click at exactly t_a or exactly
    t_c does NOT exclude; one strictly inside does; a click after t_c
    or before t_a is irrelevant; a converter with no clicks at all is
    clean."""
    from datafusion_uba_spark.operators.funnel import funnel_steps_excluding

    D0 = 1704067200_000_000  # 2024-01-01 epoch micros
    MIN = 60_000_000

    def ev(u, t, typ):
        return (u, typ, t)

    rows = [
        # u1: view, click strictly between, purchase -> dirty
        ev(1, D0, "view"), ev(1, D0 + MIN, "click"), ev(1, D0 + 2 * MIN, "purchase"),
        # u2: click exactly at t_a -> clean
        ev(2, D0, "view"), ev(2, D0, "click"), ev(2, D0 + MIN, "purchase"),
        # u3: click exactly at t_c -> clean
        ev(3, D0, "view"), ev(3, D0 + MIN, "purchase"), ev(3, D0 + MIN, "click"),
        # u4: click after t_c -> clean
        ev(4, D0, "view"), ev(4, D0 + MIN, "purchase"), ev(4, D0 + 5 * MIN, "click"),
        # u5: no click -> clean
        ev(5, D0, "view"), ev(5, D0 + 3 * MIN, "purchase"),
        # u6: purchase outside 7-day window -> not converted at all
        ev(6, D0, "view"), ev(6, D0 + 8 * 86400_000_000, "purchase"),
    ]
    df = spark.createDataFrame(
        [(u, typ, t) for u, typ, t in rows],
        "user_id long, event_type string, tus long",
    ).select("user_id", "event_type", F.timestamp_micros("tus").alias("ts"))
    got = {
        r.day_i: (r.n_converted, r.n_clean)
        for r in funnel_steps_excluding(
            df,
            step_a=F.col("event_type") == "view",
            step_c=F.col("event_type") == "purchase",
            excluded=F.col("event_type") == "click",
        ).collect()
    }
    assert got == {0: (5, 4)}
