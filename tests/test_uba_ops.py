"""Behavioral pins for the round-8 UBA rows beyond oracle parity:
claims the docstrings make that the value-compare alone doesn't prove.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_moving_frames_actually_diverge(spark):
    """moving_value_frames exists to exercise ROWS vs RANGE — on the
    gapped series the two columns must genuinely differ on a
    substantial share of rows (53/71 at calibration), otherwise the
    row silently degrades into testing one frame twice."""
    from datafusion_uba_spark.queries_uba import q_moving_value_frames

    df = q_moving_value_frames(spark, SF_DIR)
    total = df.count()
    differ = df.where(
        F.col("moving7_rows_cents") != F.col("moving7_range_cents")
    ).count()
    assert total > 0
    assert differ >= total // 3, (differ, total)


def test_event_paths_partition_invariant(spark):
    """The 3-step path counts must not depend on the input's physical
    partitioning — the per-user window carries a total order
    (ts, event_id), so any shuffle layout folds to the same top-10."""
    from datafusion_uba_spark.operators.engagement import stickiness_wau
    from datafusion_uba_spark.queries_uba import q_event_paths_topk
    from datafusion_uba_spark.sources import load_table

    base = {tuple(r) for r in q_event_paths_topk(spark, SF_DIR).collect()}

    ev = load_table(spark, SF_DIR, "events").repartition(7, "event_type")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    p = ev.select(
        F.concat_ws(
            ">",
            "event_type",
            F.lead("event_type", 1).over(w),
            F.lead("event_type", 2).over(w),
        ).alias("path"),
        F.lead("event_type", 2).over(w).alias("__third"),
    )
    reparted = {
        tuple(r)
        for r in p.where(F.col("__third").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(10)
        .collect()
    }
    assert reparted == base

    # stickiness likewise: dedup-first makes layout irrelevant
    du = ev.select(
        F.datediff(
            F.date_trunc("day", "ts").cast("date"),
            F.lit("2024-01-01").cast("date"),
        ).alias("di"),
        "user_id",
    )
    a = {tuple(r) for r in stickiness_wau(du).collect()}
    b = {tuple(r) for r in stickiness_wau(du.repartition(3)).collect()}
    assert a == b


def test_rollup_cascade_single_raw_scan(spark):
    """The cascade's reason to exist: raw events are scanned exactly
    once — the day and week tiers aggregate the previous tier's
    (lazily checkpointed) rollup, never the events. Executed-plan
    check: no FileScan of the events parquet remains in the final
    union (all three tiers read checkpointed RDDs), and tier sums are
    mutually consistent (lossless additivity)."""
    from datafusion_uba_spark.queries_uba import q_rollup_cascade

    df = q_rollup_cascade(spark, SF_DIR)
    rows = df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan, plan[:2000]

    by_tier = {}
    for r in rows:
        by_tier.setdefault(r.tier, []).append(r)
    assert set(by_tier) == {"hour", "day", "week"}
    for a, b in (("hour", "day"), ("day", "week")):
        assert sum(r.n_events for r in by_tier[a]) == sum(
            r.n_events for r in by_tier[b]
        )
        assert sum(r.value_cents for r in by_tier[a]) == sum(
            r.value_cents for r in by_tier[b]
        )
    assert len(by_tier["hour"]) > len(by_tier["day"]) > len(by_tier["week"])


def test_review_fix_guards(spark):
    """Round-8 review fixes fail fast: pq_codes without its model is
    rejected by the dispatcher (stored-index footgun), degenerate
    stickiness windows raise instead of silently looking backward, and
    train_pq rejects an empty centroid list."""
    import pytest as _pytest

    from datafusion_uba_spark.operators import pq
    from datafusion_uba_spark.operators.engagement import (
        stickiness_wau,
        stickiness_wau_hll,
    )
    from datafusion_uba_spark.operators.similarity import ann_topk_auto

    df = spark.createDataFrame([(0, 0)], "di long, user_id long")
    with _pytest.raises(ValueError, match="window"):
        stickiness_wau(df, window=0)
    with _pytest.raises(ValueError, match="window"):
        stickiness_wau_hll(df, window=0)

    emb = spark.createDataFrame(
        [(0, [0.0] * 64)], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(ValueError, match="pq_model"):
        ann_topk_auto(
            emb, emb, n_rows=10, pq_threshold=1, pq_codes=emb,
        )
    with _pytest.raises(ValueError, match="non-empty"):
        pq.train_pq(emb, cents=[])


# --- gapfill ---------------------------------------------------------------


def _gf_obs(spark):
    # key a: observed at 0 and 200; key b: only at 100. Grid [0, 300) step 100.
    return spark.createDataFrame(
        [(0, "a", 10), (200, "a", 40), (100, "b", 7)],
        "bucket_s long, key string, value long",
    )


def _gf_rows(df):
    return {
        (r["key"], r["bucket_s"]): r[df.columns[-1]] for r in df.collect()
    }


def test_gapfill_null_and_zero(spark):
    from datafusion_uba_spark.operators.rollup import gapfill

    obs = _gf_obs(spark)
    nulls = _gf_rows(gapfill(obs, 0, 300, 100, fill="null"))
    assert nulls == {
        ("a", 0): 10, ("a", 100): None, ("a", 200): 40,
        ("b", 0): None, ("b", 100): 7, ("b", 200): None,
    }
    zeros = _gf_rows(gapfill(obs, 0, 300, 100, fill="zero"))
    assert zeros[("a", 100)] == 0 and zeros[("b", 200)] == 0


def test_gapfill_locf_carries_forward_only(spark):
    from datafusion_uba_spark.operators.rollup import gapfill

    got = _gf_rows(gapfill(_gf_obs(spark), 0, 300, 100, fill="locf"))
    # forward-fill inside the series; BEFORE a key's first observation
    # stays NULL (locf never looks ahead)
    assert got == {
        ("a", 0): 10, ("a", 100): 10, ("a", 200): 40,
        ("b", 0): None, ("b", 100): 7, ("b", 200): 7,
    }


def test_gapfill_linear_exact_micro_units(spark):
    from datafusion_uba_spark.operators.rollup import gapfill

    obs = spark.createDataFrame(
        [(0, "a", 10), (300, "a", 20)], "bucket_s long, key string, value long"
    )
    got = _gf_rows(gapfill(obs, 0, 500, 100, fill="linear"))
    # interior holes interpolate in integer micro-units with floor
    # division: 10 + (20-10)*(100/300) = 13.333...  -> 13_333_333
    assert got[("a", 0)] == 10_000_000
    assert got[("a", 100)] == 13_333_333
    assert got[("a", 200)] == 16_666_666
    assert got[("a", 300)] == 20_000_000
    # after the last observation: no next neighbor -> NULL
    assert got[("a", 400)] is None


def test_gapfill_rejects_misaligned_bucket(spark):
    import pytest
    from pyspark.errors import SparkRuntimeException

    from datafusion_uba_spark.operators.rollup import gapfill

    obs = spark.createDataFrame(
        [(50, "a", 1)], "bucket_s long, key string, value long"
    )
    with pytest.raises(SparkRuntimeException, match="not aligned"):
        gapfill(obs, 0, 300, 100, fill="null").collect()


def test_gapfill_long_bucket_type(spark):
    from datafusion_uba_spark.operators.rollup import gapfill

    # epoch-scale bounds must stay BIGINT (an int literal would make
    # the sequence int32 — the r10 dtype drift the oracle caught)
    obs = spark.createDataFrame(
        [(1_704_412_800, "a", 1)], "bucket_s long, key string, value long"
    )
    out = gapfill(obs, 1_704_412_800, 1_704_412_800 + 7200, 3600, fill="locf")
    assert dict(out.dtypes)["bucket_s"] == "bigint"
    assert out.count() == 2


def test_gapfill_bad_args(spark):
    import pytest

    from datafusion_uba_spark.operators.rollup import gapfill

    obs = _gf_obs(spark)
    with pytest.raises(ValueError, match="unknown fill"):
        gapfill(obs, 0, 300, 100, fill="extrapolate")
    with pytest.raises(ValueError, match="end > start"):
        gapfill(obs, 300, 0, 100)


# --- incremental rollup refresh (continuous aggregate) ---------------------


def _ev_df(spark, rows):
    # rows: (epoch_s, event_type, value)
    return spark.createDataFrame(
        [(i, ts * 1_000_000, et, v) for i, (ts, et, v) in enumerate(rows)],
        "event_id long, us long, event_type string, value double",
    ).select(
        "event_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "event_type",
        "value",
    )


def test_rollup_refresh_equals_full_recompute(spark):
    from datafusion_uba_spark.operators import rollup

    day = 86400
    batch1 = _ev_df(
        spark,
        [(10, "a", 1.0), (3700, "a", 2.0), (day + 5, "b", 3.0)],
    )
    # batch2 adds a NEW day and lands late events in EXISTING buckets
    batch2 = _ev_df(
        spark,
        [(20, "a", 0.5), (2 * day + 9, "c", 4.0), (day + 6, "b", 1.5)],
    )
    table = "rollup_refresh_t1"
    try:
        rollup.rollup_init(batch1, table)
        affected = rollup.rollup_refresh(batch2, table)
        assert affected == [0, 1, 2]
        got = {
            (r["bucket_s"], r["key"]): (r["n_events"], r["value_cents"])
            for r in spark.table(table).collect()
        }
        want = {
            (r["bucket_s"], r["key"]): (r["n_events"], r["value_cents"])
            for r in rollup.hour_rollup_cells(
                batch1.unionByName(batch2)
            ).collect()
        }
        assert got == want and len(got) == 4
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_rollup_refresh_rewrites_only_affected_partitions(spark):
    import os
    from urllib.parse import urlparse

    from datafusion_uba_spark.operators import rollup

    day = 86400
    init = _ev_df(
        spark, [(10, "a", 1.0), (day + 5, "b", 2.0), (2 * day + 7, "c", 3.0)]
    )
    table = "rollup_refresh_t2"
    try:
        rollup.rollup_init(init, table)
        loc_row = (
            spark.sql(f"DESCRIBE FORMATTED {table}")
            .where("col_name = 'Location'")
            .collect()[0]
        )
        loc = urlparse(loc_row["data_type"]).path

        def files(day_part):
            d = os.path.join(loc, f"pday={day_part}")
            return {
                f: os.path.getmtime(os.path.join(d, f))
                for f in os.listdir(d)
                if not f.startswith("_") and not f.startswith(".")
            }

        before = {d: files(d) for d in (0, 1, 2)}
        # refresh touches ONLY day 1
        affected = rollup.rollup_refresh(
            _ev_df(spark, [(day + 100, "b", 1.0)]), table
        )
        assert affected == [1]
        after = {d: files(d) for d in (0, 1, 2)}
        # untouched days: identical files, identical mtimes
        assert after[0] == before[0]
        assert after[2] == before[2]
        # the affected day was rewritten
        assert after[1] != before[1]
        # and its merged cell is correct
        row = (
            spark.table(table)
            .where("pday = 1 AND key = 'b'")
            .collect()
        )
        assert len(row) == 1 and row[0]["n_events"] == 2
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_rollup_refresh_empty_increment_noop(spark):
    from datafusion_uba_spark.operators import rollup

    table = "rollup_refresh_t3"
    try:
        rollup.rollup_init(_ev_df(spark, [(10, "a", 1.0)]), table)
        assert rollup.rollup_refresh(_ev_df(spark, []), table) == []
        assert spark.table(table).count() == 1
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


# --- data-quality audit ----------------------------------------------------


def test_dq_checks_detect_crafted_violations(spark):
    """The driver testdata is clean (all audit rows show 0), so the
    detection logic itself is pinned here on crafted dirty data."""
    from datafusion_uba_spark.operators import quality

    ev = spark.createDataFrame(
        [(1, 10, 5.0), (2, None, -1.0), (3, 11, 2.0), (3, None, -0.5)],
        "event_id long, user_id long, value double",
    )
    rows = {
        r["check_name"]: (r["violations"], r["total"])
        for r in quality.check_rows(
            ev,
            [
                ("user_null", F.col("user_id").isNull()),
                ("value_neg", F.col("value") < 0),
            ],
        ).collect()
    }
    assert rows == {"user_null": (2, 4), "value_neg": (2, 4)}

    uniq = quality.unique_check(ev, ["event_id"], "id_dup").collect()[0]
    # violations = OCCUPANCY of duplicated keys (both rows of id 3)
    assert (uniq["violations"], uniq["total"]) == (2, 4)

    parent = spark.createDataFrame([(10,), (11,)], "pk long")
    fk = quality.fk_check(ev, "user_id", parent, "pk", "fk_orphan").collect()[0]
    # NULL foreign keys are violations too
    assert (fk["violations"], fk["total"]) == (2, 4)

    report = quality.dq_union(
        quality.null_checks(ev, ["user_id", "value"]),
        quality.unique_check(ev, ["event_id"], "id_dup"),
    )
    names = [r["check_name"] for r in report.collect()]
    assert names == sorted(names) and len(names) == 3


def test_dq_check_rows_single_pass(spark):
    """All row-predicate checks on a table must fold into ONE scan +
    ONE aggregate (the deequ shape) — no per-check jobs."""
    from datafusion_uba_spark.operators import quality

    ev = spark.range(100).selectExpr("id", "id % 7 AS v")
    df = quality.check_rows(
        ev,
        [(f"c{i}", F.col("v") == i) for i in range(5)],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 2  # partial + final, one pass
    assert plan.count("Scan") <= 1 or "ExistingRDD" in plan


def test_dq_check_rows_quoted_name(spark):
    """r10 advice: a check name containing a single quote must not break
    (or inject into) the generated stack() expression."""
    from datafusion_uba_spark.operators import quality

    ev = spark.range(10).selectExpr("id", "id % 2 AS v")
    rows = quality.check_rows(
        ev, [("user's check", F.col("v") == 1)]
    ).collect()
    assert rows[0]["check_name"] == "user's check"
    assert rows[0]["violations"] == 5 and rows[0]["total"] == 10


# --- M4 downsampling + time-weighted average -------------------------------


def test_m4_deterministic_boundaries(spark):
    from datafusion_uba_spark.operators.rollup import m4_downsample

    # one bucket [0, 100): two rows tie at the earliest AND latest ts
    # -> first/last resolve to the MIN value at that boundary
    s = spark.createDataFrame(
        [(0, "a", 9), (0, "a", 4), (50, "a", 99), (99, "a", 7), (99, "a", 2)],
        "ts_s long, key string, value long",
    )
    r = m4_downsample(s, 100).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["v_min"], row["v_max"]) == (2, 99)
    assert (row["v_first"], row["v_last"]) == (4, 2)
    assert (row["bucket_s"], row["n_points"]) == (0, 5)


def test_time_weighted_avg_holds_values(spark):
    from datafusion_uba_spark.operators.rollup import time_weighted_avg

    # key a: v=10 held [0,60), v=40 held [60,100) over window [0,100)
    # plain avg = 25; TWA = (10*60 + 40*40)/100 = 22
    s = spark.createDataFrame(
        [(0, "a", 10), (60, "a", 40), (90, "b", 5)],
        "ts_s long, key string, value long",
    )
    got = {r["key"]: r for r in time_weighted_avg(s, 0, 100).collect()}
    assert got["a"]["weighted_sum"] == 10 * 60 + 40 * 40
    assert got["a"]["covered_s"] == 100
    assert got["a"]["twa_micro"] == 22_000_000
    # key b first observed at 90: covered only [90, 100)
    assert got["b"]["covered_s"] == 10
    assert got["b"]["twa_micro"] == 5_000_000
    # out-of-window rows are clamped away
    s2 = spark.createDataFrame(
        [(-5, "a", 100), (0, "a", 10)], "ts_s long, key string, value long"
    )
    got2 = time_weighted_avg(s2, 0, 100).collect()[0]
    assert got2["weighted_sum"] == 10 * 100
    import pytest

    with pytest.raises(ValueError, match="end > start"):
        time_weighted_avg(s, 100, 0)


# --- SCD2 versioning -------------------------------------------------------


def test_scd2_apply_golden(spark):
    from datafusion_uba_spark.operators import scd

    current = spark.createDataFrame(
        [
            (1, "gold", 0, 50),     # closed history: immutable
            (1, "silver", 50, None),
            (2, "bronze", 0, None),
            (3, "gold", 10, None),
        ],
        "k long, seg string, valid_from long, valid_to long",
    )
    changes = spark.createDataFrame(
        [
            (1, "platinum", 100),   # differing change: close + open
            (2, "bronze", 100),     # identical: no-op
            (4, "new", 100),        # new key: open
            (4, "newer", 200),      # same key, later change: LATEST wins
        ],
        "k long, seg string, effective_s long",
    )
    out = scd.scd2_apply(current, changes, ["k"], ["seg"])
    rows = {(r["k"], r["valid_from"]): (r["seg"], r["valid_to"])
            for r in out.collect()}
    assert rows == {
        (1, 0): ("gold", 50),          # history untouched
        (1, 50): ("silver", 100),      # closed at effective time
        (1, 100): ("platinum", None),  # new open version
        (2, 0): ("bronze", None),      # no-op kept open
        (3, 10): ("gold", None),       # untouched key kept open
        (4, 200): ("newer", None),     # latest change per key applies
    }
    # every live key has exactly ONE open row
    open_counts = [
        r["n"]
        for r in out.where(F.col("valid_to").isNull())
        .groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert set(open_counts) == {1}


def test_scd2_rejects_inverted_interval(spark):
    import pytest
    from pyspark.errors import SparkRuntimeException

    from datafusion_uba_spark.operators import scd

    current = spark.createDataFrame(
        [(1, "a", 100, None)], "k long, seg string, valid_from long, valid_to long"
    )
    stale = spark.createDataFrame(
        [(1, "b", 50)], "k long, seg string, effective_s long"
    )
    with pytest.raises(SparkRuntimeException, match="predates"):
        scd.scd2_apply(current, stale, ["k"], ["seg"]).collect()


def test_scd2_apply_table_sequential_folds(spark):
    """Persisted SCD2 maintenance: two sequential change batches fold
    into the stored table through the staged swap (self-overwrite is
    impossible by construction), and the final history equals the
    hand-folded expectation."""
    from datafusion_uba_spark.operators import scd

    table = "scd2_store_t1"
    try:
        init = spark.createDataFrame(
            [(1, "a", 0, None)],
            "k long, seg string, valid_from long, valid_to long",
        )
        scd.scd2_init(init, table)
        b1 = spark.createDataFrame(
            [(1, "b", 100), (2, "x", 100)], "k long, seg string, effective_s long"
        )
        scd.scd2_apply_table(spark, table, b1, ["k"], ["seg"])
        b2 = spark.createDataFrame(
            [(1, "c", 200)], "k long, seg string, effective_s long"
        )
        scd.scd2_apply_table(spark, table, b2, ["k"], ["seg"])
        rows = {
            (r["k"], r["valid_from"]): (r["seg"], r["valid_to"])
            for r in spark.table(table).collect()
        }
        assert rows == {
            (1, 0): ("a", 100),
            (1, 100): ("b", 200),
            (1, 200): ("c", None),
            (2, 100): ("x", None),
        }
        # no staging leftovers
        assert not [
            t.name
            for t in spark.catalog.listTables()
            if t.name.startswith(table) and t.name.endswith("__stage")
        ]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_scd2_apply_table_never_rewrites_closed_history(spark):
    """r10 verdict #2: the persisted SCD2 store is partitioned by close
    batch, and an apply rewrites ONLY the open partition — every prior
    batch's files stay byte/mtime-identical (the rollup_refresh
    untouched-partition pin, applied to versioned history)."""
    import os
    from urllib.parse import urlparse

    from datafusion_uba_spark.operators import scd

    table = "scd2_store_t2"
    try:
        init = spark.createDataFrame(
            [
                (1, "a", 0, 50),      # seed closed history -> close_b=b0
                (1, "b", 50, None),
                (2, "x", 0, None),
            ],
            "k long, seg string, valid_from long, valid_to long",
        )
        scd.scd2_init(init, table)
        loc_row = (
            spark.sql(f"DESCRIBE FORMATTED {table}")
            .where("col_name = 'Location'")
            .collect()[0]
        )
        loc = urlparse(loc_row["data_type"]).path

        def files(part):
            d = os.path.join(loc, f"close_b={part}")
            if not os.path.isdir(d):
                return None
            return {
                f: os.path.getmtime(os.path.join(d, f))
                for f in os.listdir(d)
                if not f.startswith("_") and not f.startswith(".")
            }

        b0_before = files("b0")
        open_before = files("open")
        b1 = spark.createDataFrame(
            [(1, "c", 100)], "k long, seg string, effective_s long"
        )
        bid = scd.scd2_apply_table(spark, table, b1, ["k"], ["seg"])
        assert bid == "b1"
        # seed history untouched byte-for-byte; open partition rewritten
        assert files("b0") == b0_before
        assert files("open") != open_before
        b1_files = files("b1")
        assert b1_files
        # second apply: BOTH prior batches immutable
        b2 = spark.createDataFrame(
            [(2, "y", 200)], "k long, seg string, effective_s long"
        )
        bid2 = scd.scd2_apply_table(spark, table, b2, ["k"], ["seg"])
        assert bid2 == "b2"
        assert files("b0") == b0_before
        assert files("b1") == b1_files
        # a no-op batch creates no new partition and returns None
        noop = spark.createDataFrame(
            [(2, "y", 300)], "k long, seg string, effective_s long"
        )
        assert scd.scd2_apply_table(spark, table, noop, ["k"], ["seg"]) is None
        assert files("b3") is None
        # explicit batch-id collision refuses rather than replacing history
        import pytest

        with pytest.raises(ValueError, match="overwrite closed history"):
            scd.scd2_apply_table(
                spark, table, b2, ["k"], ["seg"], batch_id="b1"
            )
        # full history is the hand-folded expectation
        rows = {
            (r["k"], r["valid_from"]): (r["seg"], r["valid_to"])
            for r in spark.table(table).collect()
        }
        assert rows == {
            (1, 0): ("a", 50),
            (1, 50): ("b", 100),
            (1, 100): ("c", None),
            (2, 0): ("x", 200),
            (2, 200): ("y", None),
        }
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_dq_checks_empty_input_reports_zero(spark):
    """r10 review finding: SUM over zero rows is NULL — empty input
    must still report violations == 0 (the pass state), not NULL."""
    from datafusion_uba_spark.operators import quality

    empty = spark.createDataFrame([], "event_id long, user_id long")
    r = quality.check_rows(
        empty, [("user_null", F.col("user_id").isNull())]
    ).collect()[0]
    assert (r["violations"], r["total"]) == (0, 0)
    u = quality.unique_check(empty, ["event_id"], "dup").collect()[0]
    assert (u["violations"], u["total"]) == (0, 0)
    parent = spark.createDataFrame([(1,)], "pk long")
    f = quality.fk_check(empty, "user_id", parent, "pk", "fk").collect()[0]
    assert (f["violations"], f["total"]) == (0, 0)


def test_dq_folded_operators_match_two_pass_values(spark):
    """r11: check_rows_with_unique and fk_check_with_parent_rows must
    produce the exact (check_name, violations, total) rows the
    two-pass primitives produce, on dirty data exercising every edge:
    duplicate keys, NULL foreign keys, NULL parent keys, predicate
    violations on duplicated and orphaned rows."""
    from datafusion_uba_spark.operators import quality

    ev = spark.createDataFrame(
        [(1, 10, 5.0), (2, None, -1.0), (3, 11, 2.0), (3, None, -0.5)],
        "event_id long, user_id long, value double",
    )
    folded = {
        r["check_name"]: (r["violations"], r["total"])
        for r in quality.check_rows_with_unique(
            ev,
            [
                ("user_null", F.col("user_id").isNull()),
                ("value_neg", F.col("value") < 0),
            ],
            ["event_id"],
            "id_dup",
        ).collect()
    }
    assert folded == {
        "user_null": (2, 4),
        "value_neg": (2, 4),
        "id_dup": (2, 4),  # occupancy of duplicated keys
    }

    # child: one NULL fk (orphan), one unmatched fk, two matched rows
    child = spark.createDataFrame(
        [(None,), (99,), (10,), (10,)], "fk long"
    )
    # parent: a NULL key (never a join target), a duplicate key, and
    # predicate violations
    parent = spark.createDataFrame(
        [(10, -1.0), (10, 2.0), (None, -3.0), (20, 1.0)],
        "pk long, v double",
    )
    folded = {
        r["check_name"]: (r["violations"], r["total"])
        for r in quality.fk_check_with_parent_rows(
            child, "fk", parent, "pk", "orphan",
            [("v_neg", F.col("v") < 0)],
        ).collect()
    }
    assert folded == {
        "orphan": (2, 4),  # NULL fk + unmatched 99; total = child rows
        "v_neg": (2, 4),   # parent rows incl. NULL-key row; total = parent
    }


def test_dq_audit_one_filescan_per_table(spark, sf_dir):
    """r11 fold pin: the seven-check audit must plan exactly ONE
    FileScan per table (events, orders, lineitem) — the uniqueness
    and FK checks share their tables' row-predicate scans."""
    from datafusion_uba_spark.queries import q_dq_audit

    plan = (
        q_dq_audit(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scans = [l for l in plan.splitlines() if "FileScan" in l]
    assert len(scans) == 3, scans
    # identify each scan by a column only that table carries (plan
    # paths are truncated in toString, so match on the read schema)
    for col in ("event_id", "l_orderkey", "o_orderkey"):
        assert sum(col in s for s in scans) == 1, (col, scans)


def test_counter_increase_crafted(spark):
    """r11 reset-aware counter delta: hand-computed increase/resets on
    a crafted stream — normal growth, a reset, a negative post-reset
    reading (clamps to 0), a boundary-crossing diff attributed to the
    later sample's bucket, and a same-timestamp tie ordered by
    value."""
    from datafusion_uba_spark.operators.rollup import counter_increase

    rows = [
        # key a, bucket 0 [0,100): 10 -> 25 -> 40 (+30), then reset
        # to 5 (+5, 1 reset)
        ("a", 1, 10), ("a", 2, 25), ("a", 3, 40), ("a", 4, 5),
        # key a, bucket 100: first sample in the NEW bucket diffs
        # against the last of the old one (5 -> 50 = +45 attributed
        # to bucket 100)
        ("a", 101, 50),
        # key b: negative post-reset reading clamps to 0; the
        # follow-up diffs from the negative value
        ("b", 1, 100), ("b", 2, -20), ("b", 3, -10),
        # key c: same-timestamp tie -> ordered by value (7 then 9)
        ("c", 5, 9), ("c", 5, 7),
    ]
    df = spark.createDataFrame(rows, "key string, ts_s long, value long")
    got = {
        (r["key"], r["bucket_s"]): (r["n_samples"], r["resets"], r["increase"])
        for r in counter_increase(df, 100).collect()
    }
    assert got[("a", 0)] == (4, 1, 35)     # +15 +15, reset -> +5
    assert got[("a", 100)] == (1, 0, 45)   # 5 -> 50
    # b: 100 -> -20 reset (clamp 0), -20 -> -10 is growth (+10)
    assert got[("b", 0)] == (3, 1, 10)
    # c: first sample 7 contributes 0; 7 -> 9 = +2
    assert got[("c", 0)] == (2, 0, 2)

    import pytest as _pt
    with _pt.raises(ValueError):
        counter_increase(df, 0)


def test_returning_users_hll_pinned_to_exact_anchor(spark):
    """r11 sketch-intersection twin: same (day, next_day) keys as the
    exact anchor and every inclusion-exclusion estimate within 5% of
    the exact overlap (at this fixture's cardinalities the HLL is in
    sparse mode and exact; the bound leaves room for the dense-mode
    error regime at scale)."""
    from datafusion_uba_spark.queries_uba import (
        q_returning_users,
        q_returning_users_hll,
    )

    exact = {
        r["di"]: r["returning"]
        for r in q_returning_users(spark, SF_DIR).collect()
    }
    approx = {
        r["di"]: r["returning"]
        for r in q_returning_users_hll(spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx) and len(exact) > 10
    for d, n in exact.items():
        assert abs(approx[d] - n) <= max(1, 0.05 * n), (d, n, approx[d])


def test_approx_overlap_consecutive_guards_and_shape(spark):
    """Operator contract: lgk range guard; disjoint consecutive keys
    estimate ~0 returning; identical sets estimate ~full overlap."""
    import pytest as _pt

    from datafusion_uba_spark.operators.sketches import (
        approx_overlap_consecutive,
    )

    rows = [(0, i) for i in range(500)] + [(1, i) for i in range(500)] + [
        (2, 10_000 + i) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "di long, user_id long")
    got = {
        r["di"]: r["returning"]
        for r in approx_overlap_consecutive(df, "di", "user_id").collect()
    }
    assert abs(got[0] - 500) <= 25      # identical day 0 -> day 1
    assert got[1] <= 25                 # disjoint day 1 -> day 2
    with _pt.raises(ValueError):
        approx_overlap_consecutive(df, "di", "user_id", lgk=3)


def test_session_stats_crafted_bounces(spark):
    """r11 session profile: hand-computed bounce/depth/duration math —
    one two-event session, one bounce, on separate days; integer DIV
    averages."""
    from datafusion_uba_spark.queries_uba import q_session_stats  # noqa: F401
    from datafusion_uba_spark.streaming import sessionize

    ev = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 00:00:00"),
            (2, 10, "2024-01-01 00:10:00"),   # same session (gap 10m)
            (3, 11, "2024-01-02 09:00:00"),   # bounce
        ],
        "event_id long, user_id long, ts string",
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    sess = sessionize(ev, gap="30 minutes")
    got = {
        r["day_i"]: (
            r["n_sessions"], r["bounces"],
            r["events_per_session_milli"], r["avg_duration_us"],
        )
        for r in sess.groupBy(
            F.expr("session_start_us DIV 86400000000").alias("day_i")
        ).agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum((F.col("n_events") == 1).cast("long")).alias("bounces"),
            F.sum("n_events").alias("total_events"),
            F.sum("duration_us").alias("total_duration_us"),
        ).select(
            "day_i", "n_sessions", "bounces",
            F.expr("(total_events * 1000) DIV n_sessions").alias(
                "events_per_session_milli"),
            F.expr("total_duration_us DIV n_sessions").alias(
                "avg_duration_us"),
        ).collect()
    }
    d1 = 19723  # 2024-01-01 in days since epoch
    assert got[d1] == (1, 0, 2000, 600_000_000)
    assert got[d1 + 1] == (1, 1, 1000, 0)


def test_equi_depth_histogram_crafted(spark):
    """r11 optimizer-statistics histogram: skewed values — equal-depth
    buckets stay balanced (SQL-standard ntile remainder rule: first
    n mod k buckets get the extra row); bucket edges are exact
    mins/maxes; n_buckets guard."""
    import pytest as _pt

    from datafusion_uba_spark.operators.quality import equi_depth_histogram

    # 10 rows, heavily skewed: eight 1s then 50, 100
    rows = [("a", 1, i) for i in range(8)] + [("a", 50, 8), ("a", 100, 9)]
    df = spark.createDataFrame(rows, "g string, v long, id long")
    got = {
        r["bucket"]: (r["n_rows"], r["lo"], r["hi"])
        for r in equi_depth_histogram(df, "g", "v", "id", 4).collect()
    }
    # 10 rows / 4 buckets: sizes 3,3,2,2 over the (v, id) order
    assert got == {
        1: (3, 1, 1),
        2: (3, 1, 1),
        3: (2, 1, 1),
        4: (2, 50, 100),
    }
    with _pt.raises(ValueError):
        equi_depth_histogram(df, "g", "v", "id", 0)


def test_table_diff_crafted(spark):
    """r11 CDC diff: only_a / only_b / changed classification,
    NULL-safe compare both directions, unchanged keys dropped, and
    the in-plan duplicate-key guard."""
    import pytest as _pt
    from pyspark.errors import SparkRuntimeException

    from datafusion_uba_spark.operators.quality import table_diff

    a = spark.createDataFrame(
        [(1, 10, "x"), (2, 20, None), (3, 30, "z"), (4, None, "w")],
        "k long, v long, s string",
    )
    b = spark.createDataFrame(
        [(1, 10, "x"), (2, 20, "now"), (4, 40, "w"), (5, 50, "new")],
        "k long, v long, s string",
    )
    got = {
        r["k"]: r["diff_status"] for r in table_diff(a, b, ["k"]).collect()
    }
    # 1 unchanged -> absent; 2 NULL->value changed; 3 deleted;
    # 4 NULL->40 changed; 5 inserted
    assert got == {2: "changed", 3: "only_a", 4: "changed", 5: "only_b"}

    dup = spark.createDataFrame([(1, 1, "a"), (1, 2, "b")],
                                "k long, v long, s string")
    with _pt.raises(SparkRuntimeException, match="duplicate key"):
        table_diff(dup, b, ["k"]).collect()
    with _pt.raises(ValueError):
        table_diff(a, b, [])


def test_key_skew_profile_crafted(spark):
    """r11 skew diagnostic: hand-computed occupancies on a crafted
    skew (one key holds 80%), no global sort in the plan (top-n is
    TakeOrderedAndProject), guards."""
    import pytest as _pt

    from datafusion_uba_spark.operators.quality import key_skew_profile

    rows = [("hot",)] * 80 + [(f"k{i}",) for i in range(20)]
    df = spark.createDataFrame(rows, "k string")
    r = key_skew_profile(df, ["k"], top_n=5).collect()[0]
    assert (r["key"], r["n_rows"], r["n_distinct"]) == ("k", 100, 21)
    assert r["top1_bp"] == 8000          # hot = 80/100
    assert r["topn_bp"] == 8400          # hot + 4 singletons
    plan = (
        key_skew_profile(df, ["k"], top_n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    with _pt.raises(ValueError):
        key_skew_profile(df, [], top_n=5)
    with _pt.raises(ValueError):
        key_skew_profile(df, ["k"], top_n=0)


def test_cohort_ltv_crafted(spark):
    """r11 LTV triangle: hand-computed revenue/cumulative math — a
    cohort with purchases in weeks 0 and 2, an active-but-unpaying
    week 1 present with zero revenue, and cumulative sums running
    through it."""
    from datafusion_uba_spark.queries_uba import q_cohort_ltv_weekly  # noqa: F401
    from pyspark.sql import Window

    ev = spark.createDataFrame(
        [
            (1, 10, "purchase", "2024-01-01 10:00:00", 5.0),
            (2, 10, "view", "2024-01-08 10:00:00", 0.0),
            (3, 10, "purchase", "2024-01-15 10:00:00", 2.5),
            (4, 11, "purchase", "2024-01-01 11:00:00", 1.0),
        ],
        "event_id long, user_id long, event_type string, ts string, value double",
    ).select(
        "event_id", "user_id", "event_type",
        F.col("ts").cast("timestamp").alias("ts"), "value",
    )
    base = ev.select(
        "user_id",
        F.date_trunc("week", "ts").cast("date").alias("week"),
        F.when(F.col("event_type") == "purchase",
               F.round(F.col("value") * 100).cast("long"))
        .otherwise(F.lit(0).cast("long")).alias("c"),
    )
    per_uw = base.groupBy("user_id", "week").agg(F.sum("c").alias("c"))
    r = per_uw.withColumn(
        "cohort_week", F.min("week").over(Window.partitionBy("user_id"))
    )
    tri = r.groupBy(
        F.col("cohort_week").cast("string").alias("cw"),
        F.expr("CAST(datediff(week, cohort_week) div 7 AS INT)").alias("off"),
    ).agg(
        F.sum("c").alias("rev"),
        F.sum((F.col("c") > 0).cast("long")).alias("payers"),
    )
    cum = tri.withColumn(
        "cum",
        F.sum("rev").over(
            Window.partitionBy("cw").orderBy("off")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    got = {r["off"]: (r["rev"], r["payers"], r["cum"]) for r in cum.collect()}
    # both users share the 2024-01-01 cohort week
    assert got[0] == (600, 2, 600)   # 5.00 + 1.00
    assert got[1] == (0, 0, 600)     # active, no revenue; cum holds
    assert got[2] == (250, 1, 850)


def test_funnel_time_to_convert_crafted(spark):
    """r11 funnel velocity: hand-computed delays — anchored at each
    user's first step-1 event, exact lower median over an even count,
    truncating mean."""
    from datafusion_uba_spark.queries_uba import _FUNNEL_STEPS  # noqa: F401
    from datafusion_uba_spark.operators.funnel import funnel_user_times
    from pyspark.sql import Window

    rows = [
        # u1: view@0, click@100s  -> delay 100
        (1, 1, "view", "2024-01-01 00:00:00"),
        (2, 1, "click", "2024-01-01 00:01:40"),
        # u2: view@0, click@300s -> delay 300
        (3, 2, "view", "2024-01-01 00:00:00"),
        (4, 2, "click", "2024-01-01 00:05:00"),
        # u3: click with no prior view: not a converter
        (5, 3, "click", "2024-01-01 00:00:00"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).select("event_id", "user_id", "event_type",
             F.col("ts").cast("timestamp").alias("ts"))
    times = funnel_user_times(
        ev, [(s, F.col("event_type") == s) for s in ("view", "click")],
        conversion_window_days=7,
    )
    d = times[1].select(
        F.expr("(t_step - t1) DIV 1000000").alias("delay_s")
    )
    w_rank = Window.orderBy("delay_s")
    ranked = d.select(
        "delay_s",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    r = ranked.agg(
        F.max("n").alias("n"),
        F.min("delay_s").alias("mn"),
        F.max("delay_s").alias("mx"),
        F.expr("sum(delay_s) DIV max(n)").alias("mean_s"),
        F.max(F.when(F.expr("rn = (n + 1) DIV 2"),
                     F.col("delay_s"))).alias("med"),
    ).collect()[0]
    # two converters: delays 100 and 300; lower median = 100
    assert (r["n"], r["mn"], r["mx"], r["mean_s"], r["med"]) == (
        2, 100, 300, 200, 100
    )


def test_metric_anomaly_flags_crafted(spark):
    """r11 anomaly monitor: a crafted spike against a stable 7-day
    baseline flags (deviation > 2000 bp); a normal day does not; the
    first 7 days emit no row (no full baseline); the median baseline
    ignores a single prior spike."""
    from pyspark.sql import Window

    rows = []
    # type A: days 0..6 at 100; day 7 = 100 (normal); day 8 = 200
    # (spike); day 9 = 105 (median baseline now includes the 200 but
    # the MEDIAN stays 100 -> small deviation)
    for d, n in [(0, 100), (1, 100), (2, 100), (3, 100), (4, 100),
                 (5, 100), (6, 100), (7, 100), (8, 200), (9, 105)]:
        rows.append(("A", d, n))
    daily = spark.createDataFrame(
        rows, "event_type string, day_i long, n_events long"
    )
    w7 = (
        Window.partitionBy("event_type").orderBy("day_i").rowsBetween(-7, -1)
    )
    with7 = daily.select(
        "event_type", "day_i", "n_events",
        F.collect_list("n_events").over(w7).alias("base"),
    ).where(F.size("base") == 7)
    med = F.element_at(F.sort_array("base"), 4)
    dev = F.floor(F.abs(F.col("n_events") - med) * 10000 / med).cast("long")
    got = {
        r["day_i"]: (r["median7"], r["dev"], r["flag"])
        for r in with7.select(
            "day_i", med.cast("long").alias("median7"),
            dev.alias("dev"), (dev > 2000).alias("flag"),
        ).collect()
    }
    assert set(got) == {7, 8, 9}          # days 0-6 lack a baseline
    assert got[7] == (100, 0, False)
    assert got[8] == (100, 10000, True)   # 200 vs median 100
    assert got[9] == (100, 500, False)    # median ignores the spike


def test_retention_bitmap_crafted(spark):
    """Three users, window=7: u1 active offsets {0,2,6(+day 9 outside)},
    u2 {0,1}, u3 {0} -> curve n_users 3/1/1/0/0/0/1 with exact milli
    ratios; absolute day anchors differ per user (offsets are from
    each user's OWN first day)."""
    from datafusion_uba_spark.operators.engagement import retention_bitmap

    rows = (
        [(10, 1), (12, 1), (16, 1), (19, 1)]
        + [(100, 2), (101, 2), (101, 2)]  # duplicate activity row
        + [(55, 3)]
    )
    act = spark.createDataFrame(rows, "di long, user_id long")
    got = {
        r.day_offset: (r.n_users, r.retained_pm)
        for r in retention_bitmap(act, window=7).collect()
    }
    assert got == {
        0: (3, 1000),
        1: (1, 333),
        2: (1, 333),
        6: (1, 333),
    }


def test_retention_bitmap_window_guard(spark):
    from datafusion_uba_spark.operators.engagement import retention_bitmap

    act = spark.createDataFrame([(0, 1)], "di long, user_id long")
    import pytest as _pt

    with _pt.raises(ValueError, match="window"):
        retention_bitmap(act, window=64)
    with _pt.raises(ValueError, match="window"):
        retention_bitmap(act, window=0)


# --- CDC changelog apply ----------------------------------------------------


def _cdc_log(spark):
    rows = [
        # (user, seq, op, payload)
        (1, 1, "U", 10),
        (1, 2, "U", 20),      # user 1 ends on an upsert: survives with 20
        (2, 1, "U", 30),
        (2, 2, "D", 0),       # user 2 ends on a delete: absent
        (3, 1, "D", 0),
        (3, 2, "U", 40),      # delete then re-insert: survives with 40
        (4, 1, "U", 50),      # single upsert
    ]
    return spark.createDataFrame(
        rows, "user_id long, seq long, op string, payload long"
    )


def test_cdc_apply_last_writer_wins_and_deletes(spark):
    from datafusion_uba_spark.operators.scd import cdc_apply

    snap = {
        r["user_id"]: r["payload"]
        for r in cdc_apply(
            _cdc_log(spark), ["user_id"], ["seq"], "op"
        ).collect()
    }
    assert snap == {1: 20, 3: 40, 4: 50}


def test_cdc_apply_incremental_associative(spark):
    """Applying the log in two chunks (snapshot union batch, re-apply)
    must equal replaying the whole log — the incremental contract."""
    from datafusion_uba_spark.operators.scd import cdc_apply

    log = _cdc_log(spark)
    full = cdc_apply(log, ["user_id"], ["seq"], "op")
    first = cdc_apply(
        log.where("seq = 1"), ["user_id"], ["seq"], "op"
    )
    incr = cdc_apply(
        first.unionByName(log.where("seq = 2")),
        ["user_id"],
        ["seq"],
        "op",
    )
    a = sorted(map(tuple, full.collect()))
    b = sorted(map(tuple, incr.collect()))
    assert a == b


def test_cdc_apply_seq_tiebreak_is_total(spark):
    """Two changes with equal first seq key fall through to the second
    seq column — the (ts, event_id) total order the registry row uses."""
    from datafusion_uba_spark.operators.scd import cdc_apply

    log = spark.createDataFrame(
        [(1, 5, 1, "U", 100), (1, 5, 2, "U", 200)],
        "user_id long, ts long, event_id long, op string, payload long",
    )
    out = cdc_apply(log, ["user_id"], ["ts", "event_id"], "op").collect()
    assert len(out) == 1 and out[0]["payload"] == 200


def test_cdc_apply_skips_nested_unorderable_tiebreaks(spark):
    """The content tiebreak must exclude any column whose type CONTAINS
    a map anywhere (bare map, array<map>, struct-with-map) — Spark
    rejects them all in ORDER BY, and the r12 startswith('map<') check
    let the nested shapes through to an AnalysisException (r12
    advisor). Orderable siblings still participate."""
    from pyspark.sql import functions as F

    from datafusion_uba_spark.operators.scd import cdc_apply

    log = spark.createDataFrame(
        [(1, 5, "U", 100), (1, 5, "U", 200)],
        "user_id long, ts long, op string, payload long",
    ).select(
        "*",
        F.array(F.create_map(F.lit("k"), F.col("payload"))).alias(
            "tags"
        ),
        F.struct(
            F.create_map(F.lit("k"), F.lit(1)).alias("m"),
            F.lit("x").alias("s"),
        ).alias("nested"),
    )
    assert dict(log.dtypes)["tags"].startswith("array<map<")
    # ties on (ts) resolve by the remaining ORDERABLE content column
    # (payload desc) without touching the map-bearing ones
    out = cdc_apply(log, ["user_id"], ["ts"], "op").collect()
    assert len(out) == 1 and out[0]["payload"] == 200


# --- persisted CDC store ----------------------------------------------------


def _cdc_df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, seq long, op string, payload long"
    )


def test_cdc_store_refresh_equals_full_replay(spark):
    """cdc_init + refreshes == cdc_apply over the concatenated log,
    including a cross-batch out-of-order change against a deleted key
    (the stored tombstone must out-rank the older upsert)."""
    from datafusion_uba_spark.operators.scd import (
        cdc_apply,
        cdc_init,
        cdc_refresh,
        cdc_serve,
    )

    b1 = _cdc_df(spark, [(1, 1, "U", 10), (2, 5, "D", 0), (3, 1, "U", 30)])
    b2 = _cdc_df(
        spark,
        [
            (1, 2, "U", 11),   # newer upsert wins
            (2, 3, "U", 99),   # OLDER than the stored delete: must lose
            (4, 1, "U", 40),   # new key
        ],
    )
    table = "cdc_store_t1"
    try:
        cdc_init(b1, table, ["user_id"], ["seq"], n_buckets=8)
        assert cdc_refresh(b2, table, ["user_id"], ["seq"], n_buckets=8)
        got = sorted(
            (r["user_id"], r["seq"], r["payload"])
            for r in cdc_serve(spark, table).collect()
        )
        want = sorted(
            (r["user_id"], r["seq"], r["payload"])
            for r in cdc_apply(
                b1.unionByName(b2), ["user_id"], ["seq"], "op"
            ).collect()
        )
        assert got == want
        assert got == [(1, 2, 11), (3, 1, 30), (4, 1, 40)]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_cdc_store_rewrites_only_affected_buckets(spark):
    import os
    from urllib.parse import urlparse

    from datafusion_uba_spark.operators.scd import cdc_init, cdc_refresh

    # many keys spread over buckets; the refresh touches ONE key
    init = _cdc_df(spark, [(k, 1, "U", k * 10) for k in range(1, 21)])
    table = "cdc_store_t2"
    try:
        cdc_init(init, table, ["user_id"], ["seq"], n_buckets=8)
        loc_row = (
            spark.sql(f"DESCRIBE FORMATTED {table}")
            .where("col_name = 'Location'")
            .collect()[0]
        )
        loc = urlparse(loc_row["data_type"]).path

        def files():
            out = {}
            for d in os.listdir(loc):
                if not d.startswith("__bucket="):
                    continue
                p = os.path.join(loc, d)
                out[d] = {
                    f: os.path.getmtime(os.path.join(p, f))
                    for f in os.listdir(p)
                    if not f.startswith(("_", "."))
                }
            return out

        before = files()
        affected = cdc_refresh(
            _cdc_df(spark, [(7, 2, "U", 77)]),
            table,
            ["user_id"],
            ["seq"],
            n_buckets=8,
        )
        assert len(affected) == 1
        after = files()
        touched = f"__bucket={affected[0]}"
        for d in before:
            if d == touched:
                assert after[d] != before[d]
            else:
                assert after[d] == before[d]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_cdc_store_empty_batch_noop(spark):
    from datafusion_uba_spark.operators.scd import cdc_init, cdc_refresh

    table = "cdc_store_t3"
    try:
        cdc_init(
            _cdc_df(spark, [(1, 1, "U", 10)]),
            table,
            ["user_id"],
            ["seq"],
            n_buckets=4,
        )
        assert (
            cdc_refresh(
                _cdc_df(spark, []), table, ["user_id"], ["seq"], n_buckets=4
            )
            == []
        )
        assert spark.table(table).count() == 1
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_cdc_vacuum_gc_semantics(spark):
    """Vacuum removes ONLY tombstones below the horizon; live rows and
    younger tombstones survive; buckets without victims keep their
    files byte/mtime-identical; the served snapshot is unchanged."""
    import os
    from urllib.parse import urlparse

    from datafusion_uba_spark.operators.scd import (
        cdc_init,
        cdc_serve,
        cdc_vacuum,
    )

    log = _cdc_df(
        spark,
        [(1, 1, "U", 10), (2, 2, "D", 0), (3, 9, "D", 0), (4, 3, "U", 40)],
    )
    table = "cdc_vac_t1"
    try:
        cdc_init(log, table, ["user_id"], ["seq"], n_buckets=8)
        loc = urlparse(
            spark.sql(f"DESCRIBE FORMATTED {table}")
            .where("col_name = 'Location'")
            .collect()[0]["data_type"]
        ).path

        def files():
            out = {}
            for d in os.listdir(loc):
                if d.startswith("__bucket="):
                    p = os.path.join(loc, d)
                    out[d] = {
                        f: os.path.getmtime(os.path.join(p, f))
                        for f in os.listdir(p)
                        if not f.startswith(("_", "."))
                    }
            return out

        before_serve = sorted(map(tuple, cdc_serve(spark, table).collect()))
        before_files = files()
        res = cdc_vacuum(spark, table, "seq", horizon=5)
        # only user 2's tombstone (seq 2 < 5) is dead; user 3's (seq 9)
        # survives
        assert res["removed"] == 1 and len(res["buckets"]) == 1
        stored = {
            (r["user_id"], r["op"]) for r in spark.table(table).collect()
        }
        assert (2, "D") not in stored and (3, "D") in stored
        assert sorted(
            map(tuple, cdc_serve(spark, table).collect())
        ) == before_serve
        after_files = files()
        touched = f"__bucket={res['buckets'][0]}"
        # the touched bucket held ONLY the dead tombstone, so its
        # partition is dropped outright
        assert after_files.get(touched) != before_files[touched]
        for d in before_files:
            if d != touched:
                assert after_files[d] == before_files[d]
        # idempotent: a second vacuum at the same horizon is a noop
        assert cdc_vacuum(spark, table, "seq", horizon=5) == {
            "buckets": [],
            "removed": 0,
        }
        # partial-bucket path: at horizon 10 user 3's tombstone (seq 9)
        # dies but its bucket also holds user 4's live row — the bucket
        # is REWRITTEN, not dropped
        res2 = cdc_vacuum(spark, table, "seq", horizon=10)
        assert res2["removed"] == 1
        stored2 = {
            (r["user_id"], r["op"]) for r in spark.table(table).collect()
        }
        assert (3, "D") not in stored2 and (4, "U") in stored2
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_funnel_by_variant_consistent_with_funnel(spark, sf_dir):
    """Per step, the arm counts must sum to funnel_steps' total, and
    each arm's funnel is non-increasing step over step."""
    from collections import defaultdict

    from datafusion_uba_spark.queries_uba import (
        q_funnel_by_variant,
        q_funnel_steps,
    )

    by_arm = q_funnel_by_variant(spark, sf_dir).collect()
    totals = {
        r["step"]: r["users"] for r in q_funnel_steps(spark, sf_dir).collect()
    }
    per_step = defaultdict(int)
    per_arm = defaultdict(dict)
    for r in by_arm:
        per_step[r["step"]] += r["users"]
        per_arm[r["variant"]][r["step"]] = r["users"]
    assert dict(per_step) == totals
    for arm, steps in per_arm.items():
        seq = [steps.get(i, 0) for i in sorted(steps)]
        assert all(a >= b for a, b in zip(seq, seq[1:])), (arm, seq)


def test_repurchase_intervals_distribution(spark):
    """cum_ppm is non-decreasing, ends exactly at 10^6 minus final
    truncation (== 1e6 at the last bucket since cum==total), and the
    bucket n_gaps sum equals the raw gap count."""
    from datafusion_uba_spark.queries_uba import q_repurchase_intervals
    from datafusion_uba_spark.sources import load_table

    sf = SF_DIR
    rows = sorted(
        q_repurchase_intervals(spark, sf).collect(),
        key=lambda r: r["gap_hours"],
    )
    assert rows
    prev = -1
    for r in rows:
        assert r["cum_ppm"] >= prev
        prev = r["cum_ppm"]
    assert rows[-1]["cum_ppm"] == 1_000_000
    ev = load_table(spark, sf, "events")
    n_purch = ev.where("event_type = 'purchase'").count()
    n_users = (
        ev.where("event_type = 'purchase'")
        .select("user_id").distinct().count()
    )
    assert sum(r["n_gaps"] for r in rows) == n_purch - n_users


def test_revenue_new_vs_returning_conserves_total(spark):
    """new + returning must equal total daily cents, the first day of
    the corpus is 100% new, and shares stay in [0, 1e6]."""
    from datafusion_uba_spark.queries_uba import q_revenue_new_vs_returning
    from datafusion_uba_spark.sources import load_table

    rows = sorted(
        q_revenue_new_vs_returning(spark, SF_DIR).collect(),
        key=lambda r: r["day"],
    )
    ev = load_table(spark, SF_DIR, "events")
    totals = {
        r["day"]: r["cents"]
        for r in ev.groupBy(
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
        .collect()
    }
    for r in rows:
        assert r["new_cents"] + r["returning_cents"] == totals[r["day"]]
        assert 0 <= r["new_share_ppm"] <= 1_000_000
    assert rows[0]["returning_cents"] == 0
    assert rows[0]["new_share_ppm"] == 1_000_000


def test_cooccurrence_lift_decimal_headroom(spark):
    """The lift expression must survive operands where int64 products
    overflow (the 100 TB design point): n_both * 1000 * N at 10^10
    sessions is ~10^26. Evaluate the exact decimal(38,0) expression
    the registry row uses on boundary values and compare against
    Python's arbitrary-precision integers."""
    from datafusion_uba_spark.queries_uba import _lift_pm_expr

    n_total = 12_000_000_000  # 1.2e10 sessions
    cases = [
        (9_000_000_000, 10_000_000_000, 11_000_000_000),
        (1, 1, 1),
        (2**62, 2**62, 2**62),  # extreme: products ~1e37, still <1e38
    ]
    df = spark.createDataFrame(
        cases, "n_sessions_both long, __sup_a long, __sup_b long"
    )
    got = [
        r["lift_pm"]
        for r in df.selectExpr(
            _lift_pm_expr(n_total) + " AS lift_pm"
        ).collect()
    ]
    want = [
        (nb * 1000 * n_total) // (sa * sb) for nb, sa, sb in cases
    ]
    assert got == want


def test_session_path_topk_session_bounded(spark, tmp_path):
    """Session bounding is the point: two 3-event bursts separated by
    a > 30-min gap must yield exactly one 3-gram per burst — the
    cross-gap 3-grams event_paths_topk would count must NOT appear."""
    from datafusion_uba_spark.queries_uba import q_session_path_topk

    minute = 60_000_000
    rows = []
    # burst 1: a,b,c at t=0,1m,2m ; burst 2: d,e,f at t=120m,121m,122m
    for i, et in enumerate(["a", "b", "c"]):
        rows.append((i * minute, 1, et))
    for i, et in enumerate(["d", "e", "f"]):
        rows.append(((120 + i) * minute, 1, et))
    df = spark.createDataFrame(
        [(t, u, et) for t, u, et in rows],
        "off long, user_id long, event_type string",
    ).selectExpr(
        "off AS event_id",
        "timestamp_micros(1700000000000000 + off) AS ts",
        "user_id",
        "event_type",
        "CAST(0.0 AS DOUBLE) AS value",
        "'{}' AS props",
    )
    sf = str(tmp_path / "paths_sf")
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = [
        (r["step1"], r["step2"], r["step3"], r["n_paths"], r["rank"])
        for r in q_session_path_topk(spark, sf).collect()
    ]
    assert sorted(t[:3] for t in out) == [
        ("a", "b", "c"), ("d", "e", "f")
    ]
    assert all(t[3] == 1 for t in out)
    assert sorted(t[4] for t in out) == [1, 2]


def test_rfm_segments_model(spark):
    """Recompute the quartile grid in python over the sf0.01 corpus:
    same total orders, same ntile arithmetic — cell counts and
    revenue must match exactly, and every user lands in exactly one
    cell (counts sum to |users|)."""
    from datafusion_uba_spark.queries_uba import _RFM_TILES, q_rfm_segments
    from datafusion_uba_spark.sources import load_table

    out = {(r["r"], r["f"], r["m"]): (r["n_users"], r["cents_total"])
           for r in q_rfm_segments(spark, SF_DIR).collect()}

    ev = load_table(spark, SF_DIR, "events")
    rows = ev.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    ).collect()
    end = max(r["last_day"] for r in rows)

    def ntile(keyed, n):
        order = sorted(keyed, key=lambda kv: kv[1])
        total = len(order)
        base, extra = divmod(total, n)
        tiles, i = {}, 0
        for t in range(1, n + 1):
            size = base + (1 if t <= extra else 0)
            for uid, _ in order[i:i + size]:
                tiles[uid] = t
            i += size
        return tiles

    rec = ntile(
        [(r["user_id"], (-(end - r["last_day"]).days, -r["user_id"]))
         for r in rows], _RFM_TILES)
    fre = ntile([(r["user_id"], (r["freq"], r["user_id"])) for r in rows],
                _RFM_TILES)
    mon = ntile([(r["user_id"], (r["cents"], r["user_id"])) for r in rows],
                _RFM_TILES)
    want = {}
    for r in rows:
        key = (rec[r["user_id"]], fre[r["user_id"]], mon[r["user_id"]])
        n, c = want.get(key, (0, 0))
        want[key] = (n + 1, c + r["cents"])
    assert out == want
    assert sum(n for n, _ in out.values()) == len(rows)


def test_revenue_ewma_fold_golden(spark, tmp_path):
    """Hand-walked recurrence incl. the truncation-toward-zero pin on
    a negative deviation: days with cents 400, 100, 900.
    d1: s=400 dev=0
    d2: dev = (100-400)*1e4 / 400 = -7500 exactly; s = (1200+100)//4 = 325
    d3: dev = (900-325)*1e4 // 325 = 17692 (trunc); s = (975+900)//4 = 468
    """
    from datafusion_uba_spark.queries_uba import q_revenue_ewma

    day = 86_400_000_000
    rows = [(0, 1, "x", 4.0), (day, 1, "x", 1.0), (2 * day, 1, "x", 9.0)]
    df = spark.createDataFrame(
        rows, "off long, user_id long, event_type string, value double"
    ).selectExpr(
        "off AS event_id",
        "timestamp_micros(1700000000000000 + off) AS ts",
        "user_id", "event_type", "value", "'{}' AS props",
    )
    sf = str(tmp_path / "ewma_sf")
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = sorted(
        (r["day"], r["cents"], r["ewma_cents"], r["dev_bp"])
        for r in q_revenue_ewma(spark, sf).collect()
    )
    assert [t[1:] for t in out] == [
        (400, 400, 0), (100, 325, -7500), (900, 468, 17692),
    ]


def test_scd2_apply_table_explicit_batch_id(spark):
    """The production path (date-stamped explicit batch ids): the
    partition-PRUNED collision probe must pass on a fresh id (a
    missing partition is an empty result, not an error), the apply
    must land closed rows under that id, and reusing it must raise."""
    import pytest

    from datafusion_uba_spark.operators import scd

    table = "scd_explicit_pin"
    dim = spark.createDataFrame(
        [(1, "a", 0, None)],
        "k long, seg string, valid_from long, valid_to long",
    )
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        scd.scd2_init(dim, table)
        b = spark.createDataFrame(
            [(1, "b", 50)], "k long, seg string, effective_s long"
        )
        bid = scd.scd2_apply_table(
            spark, table, b, ["k"], ["seg"], batch_id="day_2024_01_02"
        )
        assert bid == "day_2024_01_02"
        got = sorted(
            (r["k"], r["seg"], r["valid_from"], r["valid_to"], r["close_b"])
            for r in spark.table(table).collect()
        )
        assert got == [
            (1, "a", 0, 50, "day_2024_01_02"),
            (1, "b", 50, None, "open"),
        ]
        with pytest.raises(ValueError, match="overwrite closed history"):
            scd.scd2_apply_table(
                spark, table, b, ["k"], ["seg"],
                batch_id="day_2024_01_02",
            )
        with pytest.raises(ValueError, match="may not contain quotes"):
            scd.scd2_apply_table(
                spark, table, b, ["k"], ["seg"], batch_id="x'y"
            )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_global_ntile_matches_window_ntile(spark):
    """operators.ranking.global_ntile must be bit-identical to Spark's
    own unpartitioned ntile window under the same total order — across
    N < n, N % n != 0, negative metrics, duplicate metric values
    (broken by id), ASC and DESC orders, and partition counts both
    smaller and larger than the row count."""
    import random

    from pyspark.sql import Window

    from datafusion_uba_spark.operators.ranking import (
        global_ntile,
        global_row_number,
    )

    rng = random.Random(13)
    for n_rows, n_tiles, parts in [
        (0, 4, 8),
        (1, 4, 8),
        (3, 4, 8),       # N < n
        (10, 4, 3),      # N % n != 0
        (97, 5, 16),     # prime N
        (64, 4, 200),    # parts >> rows (empty range partitions)
    ]:
        rows = [
            (i, rng.randint(-50, 50)) for i in range(n_rows)
        ]
        df = spark.createDataFrame(
            rows or [], "id long, metric long"
        )
        for order in (
            [F.asc("metric"), F.asc("id")],
            [F.desc("metric"), F.desc("id")],
        ):
            got = {
                r["id"]: r["tile"]
                for r in global_ntile(
                    df, order, n_tiles, "tile", num_partitions=parts
                ).collect()
            }
            want = {
                r["id"]: r["tile"]
                for r in df.select(
                    "id",
                    F.ntile(n_tiles)
                    .over(Window.orderBy(*order))
                    .cast("long")
                    .alias("tile"),
                ).collect()
            }
            assert got == want, (n_rows, n_tiles, parts)
        # and the underlying rank is the exact permutation 1..N
        rn = {
            r["id"]: r["rn"]
            for r in global_row_number(
                df, [F.asc("metric"), F.asc("id")], "rn",
                num_partitions=parts,
            ).collect()
        }
        ordered = sorted(rows, key=lambda t: (t[1], t[0]))
        assert [rn[i] for i, _ in ordered] == list(
            range(1, n_rows + 1)
        )


def test_grouped_row_number_matches_partitioned_window(spark):
    """operators.ranking.grouped_row_number must be bit-identical to
    Spark's own partitioned row_number window under the same total
    order — across empty input, a single group, few hot groups
    (the low-cardinality case it exists for: groups span many range
    partitions), duplicate metric values (broken by id), and partition
    counts larger than the row count. The counts frame must hold the
    exact per-group sizes."""
    import random

    from pyspark.sql import Window

    from datafusion_uba_spark.operators.ranking import grouped_row_number

    rng = random.Random(29)
    for n_rows, n_groups, parts in [
        (0, 3, 8),
        (1, 1, 8),
        (10, 1, 4),      # one group spanning every partition
        (97, 3, 16),     # few hot groups, prime N
        (64, 5, 200),    # parts >> rows (empty range partitions)
    ]:
        rows = [
            (i, f"g{rng.randrange(n_groups)}", rng.randint(-50, 50))
            for i in range(n_rows)
        ]
        df = spark.createDataFrame(
            rows or [], "id long, grp string, metric long"
        )
        got_df, counts = grouped_row_number(
            df,
            ["grp"],
            [F.asc("metric"), F.asc("id")],
            "rn",
            num_partitions=parts,
        )
        got = {r["id"]: r["rn"] for r in got_df.collect()}
        want = {
            r["id"]: r["rn"]
            for r in df.select(
                "id",
                F.row_number()
                .over(
                    Window.partitionBy("grp").orderBy(
                        F.asc("metric"), F.asc("id")
                    )
                )
                .cast("long")
                .alias("rn"),
            ).collect()
        }
        assert got == want, (n_rows, n_groups, parts)
        sizes = {r["grp"]: r["__n"] for r in counts.collect()}
        from collections import Counter

        assert sizes == dict(Counter(g for _, g, _ in rows)), (
            n_rows, n_groups, parts,
        )


def test_grouped_row_number_null_group(spark):
    """NULL group keys must rank as their own partition (the window
    semantics the docstring promises) — the r18 advisor found the
    offset equi-join silently dropped null-group rows (null != null);
    the join is now null-safe."""
    from collections import Counter

    from pyspark.sql import Window

    from datafusion_uba_spark.operators.ranking import grouped_row_number

    rows = [
        (0, None, 5), (1, "a", 3), (2, None, 1), (3, "a", 1),
        (4, None, 4), (5, "b", 2), (6, None, 1), (7, "b", 9),
    ]
    df = spark.createDataFrame(rows, "id long, grp string, metric long")
    got_df, counts = grouped_row_number(
        df, ["grp"], [F.asc("metric"), F.asc("id")], "rn",
        num_partitions=4,
    )
    got = {r["id"]: r["rn"] for r in got_df.collect()}
    want = {
        r["id"]: r["rn"]
        for r in df.select(
            "id",
            F.row_number()
            .over(
                Window.partitionBy("grp").orderBy(
                    F.asc("metric"), F.asc("id")
                )
            )
            .cast("long")
            .alias("rn"),
        ).collect()
    }
    assert got == want
    sizes = {r["grp"]: r["__n"] for r in counts.collect()}
    assert sizes == dict(Counter(g for _, g, _ in rows))


def test_order_distribution_ranks_gate_paths_identical(spark, sf_dir):
    """The r18 hybrid-sort gate: the two-stage grouped row_number path
    (forced with two_stage_min_rows=0) must be row-identical — every
    rank, quartile boundary, and IEEE double — to the plain
    distribution-window path (forced with a huge gate) on real data."""
    from datafusion_uba_spark.queries import q_order_distribution_ranks

    kw = {"two_stage_min_rows": 0}
    two_stage = sorted(
        map(tuple, q_order_distribution_ranks(spark, sf_dir, **kw).collect())
    )
    window = sorted(
        map(
            tuple,
            q_order_distribution_ranks(
                spark, sf_dir, two_stage_min_rows=1 << 60
            ).collect(),
        )
    )
    assert two_stage == window
    assert len(two_stage) > 0


def test_erasure_audit_empty_cohort_row_still_present(spark, tmp_path):
    """Crafted golden (r13 verdict item 4): a table whose erasure
    cohort is EMPTY must still emit its audit row with (0, 0) — a
    deletion pipeline that silently drops the table from the report
    is an audit failure, not a no-op. customer has no key % 97 == 0;
    events and orders have known counts."""
    import os

    from datafusion_uba_spark.queries_uba import q_erasure_audit

    sf = str(tmp_path / "erasure_sf")
    os.makedirs(sf, exist_ok=True)
    # customer: keys 1..10 — none divisible by 97
    spark.createDataFrame(
        [(i,) for i in range(1, 11)], "c_custkey long"
    ).write.parquet(f"{sf}/customer.parquet")
    # events: users 97 (3 rows), 194 (1 row), 5 (2 rows, out of cohort)
    spark.createDataFrame(
        [(97,), (97,), (97,), (194,), (5,), (5,)], "user_id long"
    ).write.parquet(f"{sf}/events.parquet")
    # orders: custkeys 0 (2 rows: 0 % 97 == 0), 97, 98
    spark.createDataFrame(
        [(0,), (0,), (97,), (98,)], "o_custkey long"
    ).write.parquet(f"{sf}/orders.parquet")

    got = {
        r["table_name"]: (r["n_rows"], r["n_subjects"])
        for r in q_erasure_audit(spark, sf).collect()
    }
    assert got == {
        "customer": (0, 0),
        "events": (4, 2),
        "orders": (3, 2),
    }


def test_erasure_apply_partitioned_rewrites_only_affected(spark):
    """The RTBF execution twin of q_erasure_audit: cohort rows are
    gone, NULL-key rows survive (they identify nobody), untouched
    partitions' files are byte-identical (mtimes pinned), and the
    audit record is exact."""
    import os
    from urllib.parse import urlparse

    from datafusion_uba_spark.operators.erasure import erasure_apply

    table = "erasure_apply_t1"
    rows = [
        # (user_id, pday, v) — cohort user 97 lives in days 0 and 2
        (97, 0, "a"), (5, 0, "b"),
        (6, 1, "c"), (7, 1, "d"),
        (97, 2, "e"), (194, 2, "f"), (None, 2, "g"),
    ]
    df = spark.createDataFrame(rows, "user_id long, pday int, v string")
    try:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        df.write.format("parquet").partitionBy("pday").saveAsTable(table)
        loc = urlparse(
            spark.sql(f"DESCRIBE FORMATTED {table}")
            .where("col_name = 'Location'")
            .collect()[0]["data_type"]
        ).path

        def files(day):
            d = os.path.join(loc, f"pday={day}")
            return {
                f: os.path.getmtime(os.path.join(d, f))
                for f in os.listdir(d)
                if not f.startswith(("_", "."))
            }

        day1_before = files(1)
        cohort = spark.createDataFrame([(97,), (194,), (555,)], "k long")
        audit = erasure_apply(spark, table, "user_id", cohort, "pday")
        assert audit == {
            "rows_removed": 3,
            "n_subjects": 3,
            "partitions_rewritten": [0, 2],
        }
        got = {
            (r["user_id"], r["pday"], r["v"])
            for r in spark.table(table).collect()
        }
        assert got == {
            (5, 0, "b"), (6, 1, "c"), (7, 1, "d"), (None, 2, "g"),
        }
        assert files(1) == day1_before  # untouched partition untouched

        # idempotent: a second apply is a no-op with a zero audit
        audit2 = erasure_apply(spark, table, "user_id", cohort, "pday")
        assert audit2["rows_removed"] == 0
        assert audit2["partitions_rewritten"] == []
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_erasure_apply_drops_fully_erased_partition(spark):
    """A partition whose EVERY row is in the cohort must disappear —
    dynamic overwrite alone would leave its old files live (no
    surviving rows to rewrite it with)."""
    from datafusion_uba_spark.operators.erasure import erasure_apply

    table = "erasure_apply_t2"
    df = spark.createDataFrame(
        [(97, 0, "a"), (97, 0, "b"), (5, 1, "c")],
        "user_id long, pday int, v string",
    )
    try:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        df.write.format("parquet").partitionBy("pday").saveAsTable(table)
        cohort = spark.createDataFrame([(97,)], "k long")
        audit = erasure_apply(spark, table, "user_id", cohort, "pday")
        assert audit["rows_removed"] == 2
        got = [
            (r["user_id"], r["pday"], r["v"])
            for r in spark.table(table).collect()
        ]
        assert got == [(5, 1, "c")]
        assert spark.table(table).where("pday = 0").count() == 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_erasure_apply_unpartitioned_staged_swap(spark):
    """Unpartitioned path: full anti-join rewrite through the staged
    swap — cohort gone, everything else intact, audit exact; and the
    one-column cohort contract is enforced."""
    import pytest

    from datafusion_uba_spark.operators.erasure import erasure_apply

    table = "erasure_apply_t3"
    df = spark.createDataFrame(
        [(97, "a"), (5, "b"), (None, "c")], "user_id long, v string"
    )
    try:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        df.write.format("parquet").saveAsTable(table)
        cohort = spark.createDataFrame([(97,)], "k long")
        audit = erasure_apply(spark, table, "user_id", cohort)
        assert audit == {
            "rows_removed": 1,
            "n_subjects": 1,
            "partitions_rewritten": [],
        }
        got = {tuple(r) for r in spark.table(table).collect()}
        assert got == {(5, "b"), (None, "c")}
        with pytest.raises(ValueError, match="one-column"):
            erasure_apply(spark, table, "user_id", df)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}__stage")


def test_erasure_apply_guards(spark):
    """NULL-partition cohort rows and bucketed tables are refused
    LOUDLY (silently skipping NULL-partition rows would violate the
    request; a plain rewrite of a bucketed table would silently drop
    its bucketing spec)."""
    import pytest

    from datafusion_uba_spark.operators.erasure import erasure_apply
    from datafusion_uba_spark.sources import write_bucketed

    t_null, t_bkt = "erasure_guard_null", "erasure_guard_bkt"
    try:
        spark.sql(f"DROP TABLE IF EXISTS {t_null}")
        spark.createDataFrame(
            [(97, None, "a"), (5, 1, "b")],
            "user_id long, pday int, v string",
        ).write.format("parquet").partitionBy("pday").saveAsTable(t_null)
        cohort = spark.createDataFrame([(97,)], "k long")
        with pytest.raises(ValueError, match="NULL"):
            erasure_apply(spark, t_null, "user_id", cohort, "pday")
        # the cohort row is still there — nothing was half-applied
        assert spark.table(t_null).where("user_id = 97").count() == 1

        write_bucketed(
            spark.createDataFrame(
                [(97, "a"), (5, "b")], "user_id long, v string"
            ),
            t_bkt,
            "user_id",
            4,
        )
        with pytest.raises(ValueError, match="bucketed"):
            erasure_apply(spark, t_bkt, "user_id", cohort)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_null}")
        spark.sql(f"DROP TABLE IF EXISTS {t_bkt}")


def test_erasure_apply_refuses_non_partition_column(spark):
    """Passing a DATA column as partition_col must be refused loudly
    BEFORE any write: dynamic overwrite replaces whole physical
    partitions, so scoping by a non-partition column would destroy
    every out-of-scope row in the partitions it touches. The table
    must be byte-identical afterwards."""
    import pytest as _pytest

    from datafusion_uba_spark.operators.erasure import erasure_apply

    table = "erasure_apply_t4"
    rows = [(97, 0, "US"), (5, 0, "DE"), (6, 1, "US"), (7, 1, "FR")]
    df = spark.createDataFrame(rows, "user_id long, pday int, country string")
    try:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        df.write.format("parquet").partitionBy("pday").saveAsTable(table)
        cohort = spark.createDataFrame([(97,)], "k long")
        with _pytest.raises(ValueError, match="partitioned by"):
            erasure_apply(spark, table, "user_id", cohort, "country")
        # nothing was deleted by the refused call
        assert spark.table(table).count() == 4
        # and an unpartitioned table refuses ANY partition_col
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        df.write.format("parquet").saveAsTable(table)
        with _pytest.raises(ValueError, match="partitioned by"):
            erasure_apply(spark, table, "user_id", cohort, "pday")
        assert spark.table(table).count() == 4
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_erasure_apply_staged_rewrite_preserves_partition_spec(spark):
    """partition_col=None on a PARTITIONED table (the path the
    NULL-partition ValueError sends callers to) must carry the
    partition spec through the staged swap — a silently unpartitioned
    replacement would break partition-pruned readers downstream."""
    from datafusion_uba_spark.operators.erasure import erasure_apply

    table = "erasure_apply_t5"
    rows = [(97, 0, "a"), (5, 0, "b"), (6, None, "c"), (97, None, "d")]
    df = spark.createDataFrame(rows, "user_id long, pday int, v string")
    try:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        df.write.format("parquet").partitionBy("pday").saveAsTable(table)
        cohort = spark.createDataFrame([(97,)], "k long")
        audit = erasure_apply(spark, table, "user_id", cohort, None)
        assert audit["rows_removed"] == 2
        got = {
            (r["user_id"], r["pday"], r["v"])
            for r in spark.table(table).collect()
        }
        assert got == {(5, 0, "b"), (6, None, "c")}
        part_cols = [
            c.name
            for c in spark.catalog.listColumns(table)
            if c.isPartition
        ]
        assert part_cols == ["pday"]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
