"""Streaming-surface tests: the claims the streaming module makes.

Two kinds of pins:

- **Boundary goldens** on crafted micro-data (the session_window
  gap-boundary rule the sessionize oracle encodes).
- **Batch/stream parity**: each operator bound to a file stream
  (availableNow trigger -> memory sink) must produce exactly the rows
  of the same expression over the same files as a batch DataFrame —
  Spark's incrementalizer is the only thing that differs.

Parity runs use complete output mode with no watermark: append mode
withholds windows newer than the final watermark (correct streaming
semantics, but a strict subset of the batch answer on a finite file
set); complete mode emits the full state, which is the batch answer.
Watermark/append semantics get their own prefix-subset test.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datafusion_uba_spark.sources import load_table
from datafusion_uba_spark.streaming import (
    hourly_event_counts,
    sliding_event_counts,
    run_to_memory,
    sessionize,
    stream_events,
    streaming_exact_dedup,
    streaming_funnel_flags,
    streaming_user_day_flags,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df, *order_cols):
    if order_cols:
        df = df.orderBy(*order_cols)
    return [tuple(r) for r in df.collect()]


# --- session_window gap boundary ------------------------------------------


def test_session_gap_boundary(spark):
    """Pins Spark's session_window boundary at microsecond precision:
    an event EXACTLY gap after the previous one still MERGES into its
    session; one microsecond beyond the gap starts a new session. The
    DuckDB sessionize oracle encodes the same closed-boundary rule
    (new session iff delta > gap) — writing this test caught the
    oracle's earlier >= rule being wrong at the exact boundary (random
    testdata micros never hit it)."""
    gap_us = 30 * 60 * 1_000_000
    t0 = 1_700_000_000_000_000  # epoch micros, arbitrary
    rows = [
        # user 1: exactly gap apart -> ONE session of both events
        (1, t0), (1, t0 + gap_us),
        # user 2: gap + 1us apart -> TWO sessions
        (2, t0), (2, t0 + gap_us + 1),
        # user 3: 1us inside the gap -> one session
        (3, t0), (3, t0 + gap_us - 1),
    ]
    ev = spark.createDataFrame(rows, "user_id long, us long").select(
        "user_id", F.timestamp_micros("us").alias("ts")
    )
    got = {
        (r.user_id, r.session_start_us, r.duration_us, r.n_events)
        for r in sessionize(ev, gap="30 minutes").collect()
    }
    assert got == {
        (1, t0, gap_us, 2),
        (2, t0, 0, 1),
        (2, t0 + gap_us + 1, 0, 1),
        (3, t0, gap_us - 1, 2),
    }


# --- batch/stream parity ---------------------------------------------------


@pytest.fixture(scope="module")
def batch_events(spark):
    return load_table(spark, SF_DIR, "events")


def _stream(spark):
    return stream_events(spark, SF_DIR, path_glob_filter="events.parquet")


def test_stream_events_schema_matches_batch(spark, batch_events):
    sdf = _stream(spark)
    assert sdf.isStreaming
    assert sdf.schema == batch_events.schema


def test_hourly_counts_parity(spark, batch_events):
    sdf = hourly_event_counts(_stream(spark), watermark=None)
    run_to_memory(sdf, "hourly_parity", output_mode="complete")
    got = _rows(
        spark.table("hourly_parity"), "window_start_us", "event_type"
    )
    want = _rows(
        hourly_event_counts(batch_events, watermark=None),
        "window_start_us",
        "event_type",
    )
    assert got == want and len(got) > 0


def test_sliding_counts_parity(spark, batch_events):
    """Streaming sliding windows == the batch twin, and each event
    lands in exactly window/slide = 4 windows (sum of counts = 4x
    event count)."""
    sdf = sliding_event_counts(_stream(spark), watermark=None)
    run_to_memory(sdf, "sliding_parity", output_mode="complete")
    got = _rows(
        spark.table("sliding_parity"), "window_start_us", "event_type"
    )
    want = _rows(
        sliding_event_counts(batch_events, watermark=None),
        "window_start_us",
        "event_type",
    )
    assert got == want and len(got) > 0
    total = sum(r[-1] for r in want)
    assert total == 4 * batch_events.count()


def test_sessionize_parity(spark, batch_events):
    sdf = sessionize(_stream(spark), gap="30 minutes", watermark=None)
    run_to_memory(sdf, "sessionize_parity", output_mode="complete")
    got = _rows(
        spark.table("sessionize_parity"), "user_id", "session_start_us"
    )
    want = _rows(
        sessionize(batch_events, gap="30 minutes", watermark=None),
        "user_id",
        "session_start_us",
    )
    assert got == want and len(got) > 0


def test_user_day_flags_parity(spark, batch_events):
    born = F.col("event_type") == "signup"
    target = F.col("event_type") == "purchase"
    sdf = streaming_user_day_flags(
        _stream(spark), born, target, watermark=None
    )
    run_to_memory(sdf, "flags_parity", output_mode="complete")
    got = _rows(spark.table("flags_parity"), "user_id", "day")
    want = _rows(
        streaming_user_day_flags(batch_events, born, target, watermark=None),
        "user_id",
        "day",
    )
    assert got == want and len(got) > 0


def test_append_watermark_emits_prefix(spark, batch_events):
    """Append mode + watermark: the finite file set ends with the
    watermark short of the newest windows, so the emitted rows are a
    strict, non-empty PREFIX subset of the batch answer — late-data
    safety traded against completeness, which is the documented
    append-mode contract."""
    sdf = hourly_event_counts(_stream(spark), watermark="2 hours")
    run_to_memory(sdf, "hourly_append", output_mode="append")
    got = set(_rows(spark.table("hourly_append")))
    want = set(
        _rows(hourly_event_counts(batch_events, watermark=None))
    )
    assert got and got < want
    # everything withheld is within the final watermark of max ts
    max_us = batch_events.agg(
        F.max(F.unix_micros("ts")).alias("m")
    ).collect()[0].m
    horizon = max_us - 2 * 3600 * 1_000_000
    withheld_starts = {r[0] for r in (want - got)}
    assert all(s >= horizon - 3600 * 1_000_000 for s in withheld_starts)


# --- streaming dedup -------------------------------------------------------


def test_streaming_dedup_within_watermark(spark):
    """dropDuplicatesWithinWatermark over a one-shot file stream keeps
    exactly one row per fingerprint (all data lands in one micro-batch,
    well inside the watermark): the surviving fingerprint set equals the
    batch dedup's."""
    docs = load_table(spark, SF_DIR, "documents")
    ev = load_table(spark, SF_DIR, "events").select(
        F.col("event_id").alias("doc_id"),
        F.col("props").alias("text"),
        "ts",
    )
    # batch path through the same helper (no watermark)
    batch_fps = {
        r.fingerprint
        for r in streaming_exact_dedup(ev).select("fingerprint").collect()
    }
    sev = _stream(spark).select(
        F.col("event_id").alias("doc_id"),
        F.col("props").alias("text"),
        "ts",
    )
    sdd = streaming_exact_dedup(sev, time_col="ts", watermark="1 day")
    run_to_memory(sdd, "dedup_stream", output_mode="append")
    got = spark.table("dedup_stream")
    fps = [r.fingerprint for r in got.select("fingerprint").collect()]
    assert len(fps) == len(set(fps))  # one row per fingerprint
    assert set(fps) == batch_fps
    assert docs is not None  # documents loads cleanly alongside streams


def test_streaming_dedup_guards(spark):
    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="BOTH"):
        streaming_exact_dedup(docs, time_col="ts")
    with pytest.raises(ValueError, match="BOTH"):
        streaming_exact_dedup(docs, watermark="1 hour")
    sev = _stream(spark).select(F.col("props").alias("text"), "ts")
    with pytest.raises(ValueError, match="requires"):
        streaming_exact_dedup(sev)


def test_incremental_multi_batch_parity(spark, batch_events, tmp_path):
    """REAL incrementality: the events table split into 4 files,
    streamed one file per micro-batch (maxFilesPerTrigger=1), must
    produce the same final aggregate as the one-shot batch plan —
    pinning cross-batch state merging, not just single-batch replay."""
    src = str(tmp_path / "ev_split")
    batch_events.repartition(4).write.mode("overwrite").parquet(src)
    sdf = stream_events(spark, src, max_files_per_trigger=1,
                        path_glob_filter="*.parquet")
    agg = hourly_event_counts(sdf, watermark=None)
    q = run_to_memory(agg, "hourly_incr", output_mode="complete")
    n_batches = len(q.recentProgress)
    got = _rows(spark.table("hourly_incr"), "window_start_us", "event_type")
    want = _rows(
        hourly_event_counts(batch_events, watermark=None),
        "window_start_us",
        "event_type",
    )
    assert got == want and len(got) > 0
    assert n_batches >= 4, f"expected >=4 micro-batches, got {n_batches}"


def _funnel_steps():
    # built lazily: F.col needs an active SparkContext
    return [(s, F.col("event_type") == s) for s in ("view", "click", "purchase")]


def _funnel_step_counts_from_updates(spark, table: str) -> dict[int, int]:
    """Update-mode sink rows -> per-step converted-user counts: flags
    are monotone, so take max per user per step, then sum."""
    agg = (
        spark.table(table)
        .select("u", F.posexplode("conv").alias("step_idx", "flag"))
        .groupBy("u", "step_idx")
        .agg(F.max("flag").alias("flag"))
        .groupBy("step_idx")
        .agg(F.sum("flag").alias("users"))
    )
    return {r.step_idx + 1: r.users for r in agg.collect()}


def _batch_any_anchor_counts(batch_events) -> dict[int, int]:
    from datafusion_uba_spark.operators.funnel import funnel_steps_any_anchor

    return {
        r.step: r.users
        for r in funnel_steps_any_anchor(
            batch_events, _funnel_steps(), conversion_window_days=7
        ).collect()
    }


def test_streaming_funnel_flags_parity(spark, batch_events):
    """The applyInPandasWithState any-anchor funnel over a one-shot
    file stream must reproduce the batch funnel_steps_any_anchor
    counts exactly."""
    sdf = streaming_funnel_flags(
        _stream(spark), _funnel_steps(), conversion_window_days=7
    )
    run_to_memory(sdf, "funnel_state_parity", output_mode="update")
    got = _funnel_step_counts_from_updates(spark, "funnel_state_parity")
    want = _batch_any_anchor_counts(batch_events)
    assert got == want and want[1] > 0


def test_streaming_funnel_flags_multi_batch(spark, batch_events, tmp_path):
    """REAL cross-batch state: events split into 3 time-ordered files
    streamed one per micro-batch (the operator's batch-monotone
    ordering contract) must carry the m-vector state across batches and
    land on the same final counts as batch — a chain whose steps span
    different micro-batches only converts if the carried state works."""
    import shutil

    src = str(tmp_path / "ev_by_time")
    os.makedirs(src)
    for i, (lo, hi) in enumerate(
        [("2024-01-01", "2024-01-11"), ("2024-01-11", "2024-01-21"),
         ("2024-01-21", "2024-02-01")]
    ):
        stage = str(tmp_path / f"stage{i}")
        (
            batch_events.where(F.to_date("ts") >= lo)
            .where(F.to_date("ts") < hi)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(stage, part), os.path.join(src, f"{i:02d}.parquet"))
    sdf = streaming_funnel_flags(
        stream_events(spark, src, max_files_per_trigger=1,
                      path_glob_filter="*.parquet"),
        _funnel_steps(),
        conversion_window_days=7,
    )
    q = run_to_memory(sdf, "funnel_state_incr", output_mode="update")
    assert len(q.recentProgress) >= 3
    got = _funnel_step_counts_from_updates(spark, "funnel_state_incr")
    want = _batch_any_anchor_counts(batch_events)
    assert got == want and want[1] > 0


def test_streaming_funnel_flags_evicts_state(spark, tmp_path):
    """Eviction-active parity: with a watermark, a user idle past
    (last anchor + window) is dropped from the state store via
    event-time timeout — and the final counts STILL equal batch,
    because every evicted anchor is dead (no future event can be
    within window of it). Crafted 3-batch corpus: user 1 completes the
    funnel in batch 0 and never returns (the eviction target), user 2's
    day-20 purchase chains off a long-dead day-0 anchor (must NOT
    convert, evicted or not), users 3 completes inside batch 2."""
    import shutil

    from datafusion_uba_spark.operators.funnel import funnel_steps_any_anchor

    def ts(day, hour):
        return 1_704_067_200_000_000 + (day * 24 + hour) * 3_600 * 1_000_000

    rows = {
        0: [(1, ts(0, 9), "view"), (1, ts(0, 10), "click"),
            (1, ts(0, 11), "purchase"), (2, ts(0, 9), "view")],
        1: [(4, ts(10, 9), "view")],
        2: [(2, ts(20, 9), "purchase"), (3, ts(20, 9), "view"),
            (3, ts(20, 10), "click"), (3, ts(21, 8), "purchase")],
    }
    src = str(tmp_path / "ev_evict")
    os.makedirs(src)
    all_rows = []
    for i in sorted(rows):
        all_rows += rows[i]
        stage = str(tmp_path / f"es{i}")
        spark.createDataFrame(
            rows[i], "user_id long, us long, event_type string"
        ).selectExpr(
            "user_id", "timestamp_micros(us) AS ts", "event_type"
        ).coalesce(1).write.mode("overwrite").parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(stage, part), os.path.join(src, f"{i:02d}.parquet"))

    sdf = streaming_funnel_flags(
        stream_events(spark, src, max_files_per_trigger=1,
                      path_glob_filter="*.parquet"),
        _funnel_steps(),
        conversion_window_days=1,
        watermark="0 seconds",
    )
    q = run_to_memory(sdf, "funnel_evict", output_mode="update")
    evicted = sum(
        so["numRowsRemoved"]
        for p in q.recentProgress
        for so in p["stateOperators"]
    )
    assert evicted > 0, "expected at least one state eviction"
    got = _funnel_step_counts_from_updates(spark, "funnel_evict")
    batch = spark.createDataFrame(
        all_rows, "user_id long, us long, event_type string"
    ).selectExpr("user_id", "timestamp_micros(us) AS ts", "event_type")
    want = {
        r.step: r.users
        for r in funnel_steps_any_anchor(
            batch, _funnel_steps(), conversion_window_days=1
        ).collect()
    }
    assert got == want == {1: 4, 2: 2, 3: 2}


def test_streaming_funnel_flags_drops_late_events(spark, tmp_path):
    """The strictly-newer cross-batch contract is ENFORCED: an event at
    or below the user's high-water mark is dropped and counted in
    late_dropped, never folded out of order. The crafted late event is
    a difference-maker: user 1's purchase at day-0 05:00 arrives AFTER
    their day-2 view was processed; if it were folded, the recurrence
    would see anchor m0 = day 2 >= (purchase - 1 day) and manufacture a
    FALSE step-2 conversion from a future anchor — so asserting step 2
    == 0 distinguishes enforcement from wrong-order folding, and the
    final flags equal the batch operator over the kept events."""
    import shutil

    from datafusion_uba_spark.operators.funnel import funnel_steps_any_anchor

    def ts(day, hour):
        return 1_704_067_200_000_000 + (day * 24 + hour) * 3_600 * 1_000_000

    steps = [(s, F.col("event_type") == s) for s in ("view", "purchase")]
    batches = {
        0: [(1, ts(0, 0), "view"), (1, ts(2, 0), "view")],
        1: [(1, ts(0, 5), "purchase")],  # LATE: below user 1's hwm (day 2)
    }
    src = str(tmp_path / "ev_late")
    os.makedirs(src)
    for i in sorted(batches):
        stage = str(tmp_path / f"ls{i}")
        spark.createDataFrame(
            batches[i], "user_id long, us long, event_type string"
        ).selectExpr(
            "user_id", "timestamp_micros(us) AS ts", "event_type"
        ).coalesce(1).write.mode("overwrite").parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(stage, part), os.path.join(src, f"{i:02d}.parquet"))

    sdf = streaming_funnel_flags(
        stream_events(spark, src, max_files_per_trigger=1,
                      path_glob_filter="*.parquet"),
        steps,
        conversion_window_days=1,
    )
    run_to_memory(sdf, "funnel_late", output_mode="update")
    got = _funnel_step_counts_from_updates(spark, "funnel_late")
    dropped = spark.table("funnel_late").agg(
        F.sum("late_dropped").alias("d")
    ).collect()[0]["d"]
    assert dropped == 1, f"expected exactly the late purchase dropped, got {dropped}"
    kept = spark.createDataFrame(
        batches[0], "user_id long, us long, event_type string"
    ).selectExpr("user_id", "timestamp_micros(us) AS ts", "event_type")
    want = {
        r.step: r.users
        for r in funnel_steps_any_anchor(
            kept, steps, conversion_window_days=1
        ).collect()
    }
    # step 2 == 0 is the enforcement proof (wrong-order folding says 1)
    assert got == want == {1: 1, 2: 0}


def test_flags_to_stats_matches_batch_retention(spark, batch_events, tmp_path):
    """The full streaming retention pipeline end-to-end:
    streaming_user_day_flags -> parquet sink (append + watermark,
    availableNow) -> flags_to_stats -> retention_sum must equal the
    one-shot batch retention() over the same events and window.

    The window (days 0-6 of a 30-day corpus) sits far inside the final
    watermark (max_ts - 2 days), so append mode has emitted every day
    the batch side sees — making exact equality the correct expectation
    rather than a prefix subset."""
    from datafusion_uba_spark.operators import flags_to_stats, retention, retention_sum

    born = F.col("event_type") == "signup"
    target = F.col("event_type") == "purchase"
    out = str(tmp_path / "flags_sink")
    ckpt = str(tmp_path / "flags_ckpt")
    q = (
        streaming_user_day_flags(_stream(spark), born, target, watermark="2 days")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)

    stats = flags_to_stats(
        spark.read.parquet(out), start_date="2024-01-01", max_unit=6
    )
    got = retention_sum(stats).collect()[0]["retention"]
    want = retention(
        batch_events,
        born,
        target,
        6,
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")),
        group_by="user_id",
    ).collect()[0]["retention"]
    assert got == want and want[0] and sum(want[0]) > 0


def test_flags_to_stats_validation(spark):
    from datafusion_uba_spark.operators import flags_to_stats

    flags = spark.createDataFrame(
        [(1, "2024-01-01", 1, 0)], "user_id long, day string, born int, target int"
    ).withColumn("day", F.col("day").cast("date"))
    with pytest.raises(ValueError, match="max_unit"):
        flags_to_stats(flags, "2024-01-01", -1)
    with pytest.raises(ValueError):
        flags_to_stats(flags, "not-a-date", 6)


def test_stream_to_parquet_backfill(spark, batch_events, tmp_path):
    """The backfill pattern: stream -> transformation -> PARQUET sink
    with a checkpoint (availableNow). The sink directory must read
    back as exactly the batch answer, and a second availableNow run
    against the same checkpoint must be a no-op (exactly-once: no
    duplicate appends)."""
    out = str(tmp_path / "hourly_parquet")
    ckpt = str(tmp_path / "ckpt")
    want = _rows(
        hourly_event_counts(batch_events, watermark=None),
        "window_start_us",
        "event_type",
    )

    def run_once():
        q = (
            hourly_event_counts(_stream(spark), watermark="2 hours")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    run_once()
    first = _rows(spark.read.parquet(out), "window_start_us", "event_type")
    assert first and set(first) < set(want)  # append+watermark prefix
    run_once()  # same source, same checkpoint: nothing new to emit
    second = _rows(spark.read.parquet(out), "window_start_us", "event_type")
    assert second == first


def test_heavy_hitter_cells_parity(spark, batch_events):
    """The streamed count-min cell table equals the batch twin
    EXACTLY: counters are sum-merged, so micro-batch boundaries
    cannot change the final sketch — and estimates probed from the
    streamed cells equal batch estimates for every key."""
    from datafusion_uba_spark.operators.sketches import (
        count_min_build,
        count_min_estimate,
    )
    from datafusion_uba_spark.streaming import heavy_hitter_cells

    kw = dict(key_col="user_id", w=64, d=3)
    sdf = heavy_hitter_cells(_stream(spark), **kw)
    run_to_memory(sdf, "cms_parity", output_mode="complete")
    got = _rows(spark.table("cms_parity"), "depth", "bucket")
    want = _rows(count_min_build(batch_events, "user_id", w=64, d=3), "depth", "bucket")
    assert got == want and len(got) > 0

    keys = batch_events.select("user_id").distinct()
    est_stream = _rows(
        count_min_estimate(spark.table("cms_parity"), keys, "user_id", w=64, d=3),
        "user_id",
    )
    est_batch = _rows(
        count_min_estimate(
            count_min_build(batch_events, "user_id", w=64, d=3),
            keys,
            "user_id",
            w=64,
            d=3,
        ),
        "user_id",
    )
    assert est_stream == est_batch and len(est_stream) > 0


def test_daily_active_users_parity(spark, batch_events):
    """The streamed HLL DAU equals the batch twin EXACTLY (not just
    within error): HLL registers are max-merged, so micro-batch
    boundaries and event order cannot change the final sketch."""
    from datafusion_uba_spark.streaming import daily_active_users

    sdf = daily_active_users(_stream(spark), watermark=None)
    run_to_memory(sdf, "dau_parity", output_mode="complete")
    got = _rows(spark.table("dau_parity"), "day_start_us")
    want = _rows(daily_active_users(batch_events, watermark=None), "day_start_us")
    assert got == want and len(got) > 0
    # and the estimates are sane vs the exact batch distinct count
    exact = {
        tuple(r)[0]: tuple(r)[1]
        for r in batch_events.groupBy(
            F.unix_micros(F.date_trunc("day", "ts")).alias("d")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for day, est in got:
        assert abs(est - exact[day]) / max(exact[day], 1) < 0.05


def test_streaming_minhash_dedup_against_parity(spark, tmp_path):
    """The crawl-ingest steady state, streamed: an increment of
    documents (20 verbatim copies of corpus docs under new ids + 5
    genuinely new docs) flows through a file stream into
    streaming_minhash_dedup_against with the persisted corpus band
    index; the emitted (doc_id, dup_of, jaccard_bp) rows must equal
    the batch minhash_dedup_against over the same files — Spark's
    incrementalizer and the watermarked multi-band collapse are the
    only differences. The new docs must NOT match."""
    from datafusion_uba_spark.operators.dedup import (
        minhash_dedup_against,
        minhash_index,
    )
    from datafusion_uba_spark.streaming import (
        streaming_minhash_dedup_against,
    )

    corpus = load_table(spark, SF_DIR, "documents")
    dups = corpus.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text",
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    fresh = spark.createDataFrame(
        [
            (2_000_000 + i, f"utterly novel text number {i} " * 8)
            for i in range(5)
        ],
        "doc_id long, text string",
    ).select(
        "doc_id", "text",
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    inc_dir = str(tmp_path / "increment")
    dups.unionByName(fresh).write.parquet(inc_dir)

    idx = minhash_index(corpus)
    inc_batch = spark.read.parquet(inc_dir)
    want = {
        (r.doc_id, r.dup_of, r.jaccard_bp)
        for r in minhash_dedup_against(
            inc_batch, corpus, corpus_index=idx
        ).collect()
    }
    assert want, "expected the copied docs to match the corpus"
    assert all(d < 2_000_000 for d, _, _ in want)  # new docs don't match

    # batch frame through the SAME helper (no watermark path)
    batch_got = {
        (r.doc_id, r.dup_of, r.jaccard_bp)
        for r in streaming_minhash_dedup_against(
            inc_batch, corpus, corpus_index=idx
        ).collect()
    }
    assert batch_got == want

    schema = spark.read.parquet(inc_dir).schema
    sdocs = spark.readStream.schema(schema).parquet(inc_dir)
    out = streaming_minhash_dedup_against(
        sdocs, corpus, corpus_index=idx, time_col="ts", watermark="1 hour"
    )
    run_to_memory(out, "minhash_ingest", output_mode="append")
    got = {
        (r.doc_id, r.dup_of, r.jaccard_bp)
        for r in spark.table("minhash_ingest").collect()
    }
    assert got == want


def test_streaming_minhash_dedup_guards(spark):
    from datafusion_uba_spark.streaming import (
        streaming_minhash_dedup_against,
    )

    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="BOTH"):
        streaming_minhash_dedup_against(docs, docs, time_col="ts")
    with pytest.raises(ValueError, match="bands must divide"):
        streaming_minhash_dedup_against(docs, docs, num_perm=64, bands=7)
    sdocs = (
        spark.readStream.schema(docs.schema)
        .parquet("/root/testdata/sf0.001")
    )
    with pytest.raises(ValueError, match="requires"):
        streaming_minhash_dedup_against(sdocs, docs)


def test_streaming_rollup_refresh_parity(spark, batch_events, tmp_path):
    """Streaming continuous aggregate: events split into 4 files,
    folded into the persisted hour-tier rollup one file per
    micro-batch via foreachBatch -> rollup_refresh. The final store
    must equal hour_rollup_cells over the whole table — pinning that
    repeated partial refreshes (including late events landing in
    already-written buckets) compose to the batch answer, through the
    same merge code path the batch refresh uses."""
    from datafusion_uba_spark.operators import rollup
    from datafusion_uba_spark.streaming import streaming_rollup_refresh

    src = str(tmp_path / "ev_rollup_split")
    batch_events.repartition(4).write.mode("overwrite").parquet(src)
    table = "rollup_stream_store"
    try:
        # init with an EMPTY store of the right shape, then stream all
        rollup.rollup_init(batch_events.limit(0), table)
        sdf = stream_events(
            spark, src, max_files_per_trigger=1, path_glob_filter="*.parquet"
        )
        q = streaming_rollup_refresh(sdf, table)
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        got = {
            (r["bucket_s"], r["key"]): (r["n_events"], r["value_cents"])
            for r in spark.table(table).collect()
        }
        want = {
            (r["bucket_s"], r["key"]): (r["n_events"], r["value_cents"])
            for r in rollup.hour_rollup_cells(batch_events).collect()
        }
        assert got == want and len(got) > 0
        assert n_batches >= 4, f"expected >=4 micro-batches, got {n_batches}"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_attribution_join_parity(spark, batch_events):
    """r11 stream-stream interval join: the watermarked view->purchase
    attribution over the file stream must emit exactly the batch
    twin's pairs (inner-join results emit as matched; the watermark
    only bounds state, so a finite file set yields the full answer)."""
    from datafusion_uba_spark.streaming import attribution_join

    def split(df):
        return (
            df.where(F.col("event_type") == "view"),
            df.where(F.col("event_type") == "purchase"),
        )

    sv, sp = split(_stream(spark))
    out = attribution_join(sv, sp, window_s=1800)
    assert out.isStreaming
    run_to_memory(out, "attr_parity", output_mode="append")
    got = _rows(
        spark.table("attr_parity"), "user_id", "view_id", "purchase_id"
    )
    bv, bp = split(batch_events)
    want = _rows(
        attribution_join(bv, bp, window_s=1800),
        "user_id", "view_id", "purchase_id",
    )
    assert got == want and len(got) > 0
    # every delay inside the window, none negative
    assert all(0 <= r[3] <= 1800 for r in got)


def test_attribution_join_crafted_window_edges(spark):
    """Window boundary pins: a purchase exactly AT the view instant
    and exactly AT view + window both match; one microsecond past
    does not; an earlier purchase never matches a later view."""
    from datafusion_uba_spark.streaming import attribution_join

    import pytest as _pt

    def ev(rows):
        return spark.createDataFrame(
            [(i, u, t) for i, (u, t) in enumerate(rows)],
            "event_id long, user_id long, ts string",
        ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))

    views = ev([(1, "2024-01-01 00:00:00")])
    purchases = spark.createDataFrame(
        [
            (100, 1, "2024-01-01 00:00:00"),         # at the view: match
            (101, 1, "2024-01-01 01:00:00"),         # at +window: match
            (102, 1, "2024-01-01 01:00:00.000001"),  # 1 us past: no
            (103, 1, "2023-12-31 23:59:59"),         # before: no
            (104, 2, "2024-01-01 00:30:00"),         # other user: no
        ],
        "event_id long, user_id long, ts string",
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    got = {
        (r["purchase_id"], r["delay_s"])
        for r in attribution_join(views, purchases, window_s=3600).collect()
    }
    assert got == {(100, 0), (101, 3600)}
    with _pt.raises(ValueError):
        attribution_join(views, purchases, window_s=0)


def _counter_batch_want(batch_events):
    from datafusion_uba_spark.operators.rollup import counter_increase

    series = batch_events.select(
        F.col("event_type").alias("k"),
        F.expr("unix_micros(ts) DIV 1000000").alias("ts_s"),
        F.round(F.col("value") * 100).cast("long").alias("value"),
    )
    return {
        (r["k"], r["bucket_s"]): (r["n_samples"], r["resets"], r["increase"])
        for r in counter_increase(
            series, 86400, ts_col="ts_s", key_col="k", value_col="value"
        ).collect()
    }


def _counter_stream_got(spark, table):
    agg = (
        spark.table(table)
        .where(F.col("bucket_s") >= 0)
        .groupBy("k", "bucket_s")
        .agg(
            F.sum("n_samples").alias("n"),
            F.sum("resets").alias("r"),
            F.sum("increase").alias("i"),
        )
    )
    return {
        (r["k"], r["bucket_s"]): (r["n"], r["r"], r["i"])
        for r in agg.collect()
    }


def test_streaming_counter_increase_parity(spark, batch_events):
    """r11 second custom stateful operator: single-batch streamed
    partials summed per (key, bucket) must equal the batch twin
    exactly (cents values as the counter stream)."""
    from datafusion_uba_spark.streaming import streaming_counter_increase

    sdf = streaming_counter_increase(
        _stream(spark).withColumn(
            "value", F.round(F.col("value") * 100).cast("long")
        )
    )
    assert sdf.isStreaming
    run_to_memory(sdf, "counter_parity", output_mode="update")
    got = _counter_stream_got(spark, "counter_parity")
    assert got == _counter_batch_want(batch_events) and len(got) > 0


def test_streaming_counter_increase_multi_batch_and_late(
    spark, batch_events, tmp_path
):
    """Cross-batch diff-chain state: time-ordered files streamed one
    per micro-batch must seed each batch's first diff with the carried
    last sample and still sum to the batch answer; then a
    contract-violating (unordered) split must DROP the out-of-order
    rows and count them in late_dropped, never silently reorder."""
    import os
    import shutil

    from datafusion_uba_spark.streaming import streaming_counter_increase

    src = str(tmp_path / "ev_ctr")
    os.makedirs(src)
    for i, (lo, hi) in enumerate(
        [("2024-01-01", "2024-01-11"), ("2024-01-11", "2024-01-21"),
         ("2024-01-21", "2024-02-01")]
    ):
        stage = str(tmp_path / f"cstage{i}")
        (
            batch_events.where(F.to_date("ts") >= lo)
            .where(F.to_date("ts") < hi)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        shutil.copy(
            os.path.join(stage, part), os.path.join(src, f"{i:02d}.parquet")
        )
    sdf = streaming_counter_increase(
        stream_events(spark, src, max_files_per_trigger=1,
                      path_glob_filter="*.parquet").withColumn(
            "value", F.round(F.col("value") * 100).cast("long")
        )
    )
    q = run_to_memory(sdf, "counter_incr_mb", output_mode="update")
    assert len(q.recentProgress) >= 3
    got = _counter_stream_got(spark, "counter_incr_mb")
    assert got == _counter_batch_want(batch_events)
    late = spark.table("counter_incr_mb").agg(
        F.sum("late_dropped")
    ).collect()[0][0]
    assert late == 0  # ordered split: nothing dropped

    # violating split: reverse the file order -> older batches arrive
    # after newer ones and must be dropped-and-counted
    src2 = str(tmp_path / "ev_ctr_rev")
    os.makedirs(src2)
    for i, name in enumerate(sorted(os.listdir(src), reverse=True)):
        shutil.copy(os.path.join(src, name), os.path.join(src2, f"{i:02d}.parquet"))
    sdf2 = streaming_counter_increase(
        stream_events(spark, src2, max_files_per_trigger=1,
                      path_glob_filter="*.parquet").withColumn(
            "value", F.round(F.col("value") * 100).cast("long")
        )
    )
    run_to_memory(sdf2, "counter_incr_rev", output_mode="update")
    late2 = spark.table("counter_incr_rev").agg(
        F.sum("late_dropped")
    ).collect()[0][0]
    assert late2 > 0


def test_streaming_counter_increase_evicts_state(spark, tmp_path):
    """r11 eviction: with a watermark, a key idle past the watermark
    is removed via event-time timeout, and its next sample re-seeds
    the diff chain (contributes 0, the fresh-key rule) instead of
    diffing against the evicted value — pinned by crafted values
    where the two behaviors differ."""
    import os

    import pandas as pd

    from datafusion_uba_spark.streaming import streaming_counter_increase

    src = str(tmp_path / "ev_evict")
    os.makedirs(src)

    def write(i, rows):
        pdf = pd.DataFrame(rows, columns=["event_id", "user_id",
                                          "event_type", "ts", "value"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        stage = str(tmp_path / f"estage{i}")
        spark.createDataFrame(pdf).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        import shutil
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(stage, part),
                    os.path.join(src, f"{i:02d}.parquet"))

    # batch 1: key A counts 100 -> 150 (+50)
    write(0, [(1, 1, "A", "2024-01-01 00:00:00", 100),
              (2, 1, "A", "2024-01-01 00:10:00", 150)])
    # batch 2: key B far ahead — after this batch the watermark
    # advances hours past A's last event + timeout
    write(1, [(3, 1, "B", "2024-01-01 06:00:00", 7)])
    # batch 3: B again — timeouts are evaluated for IDLE keys at the
    # start of a batch using the PREVIOUS batch's watermark, so THIS
    # batch is where A's state actually times out and is removed
    write(2, [(4, 1, "B", "2024-01-01 06:30:00", 9)])
    # batch 4: A returns BELOW its old value: with carried state this
    # would be a reset (+30 clamped); with eviction it re-seeds (+0)
    write(3, [(5, 1, "A", "2024-01-01 07:00:00", 30),
              (6, 1, "A", "2024-01-01 07:05:00", 40)])

    sdf = streaming_counter_increase(
        stream_events(spark, src, max_files_per_trigger=1,
                      path_glob_filter="*.parquet"),
        bucket_s=86400,
        watermark="1 hour",
    )
    run_to_memory(sdf, "counter_evict", output_mode="update")
    agg = (
        spark.table("counter_evict")
        .groupBy("k")
        .agg(F.sum("increase").alias("inc"), F.sum("resets").alias("r"))
    )
    got = {r["k"]: (r["inc"], r["r"]) for r in agg.collect()}
    # A: +50 in batch 1; after eviction batch 4 re-seeds (30
    # contributes 0) then +10 — carried state would read (90, 1)
    assert got["A"] == (60, 0), got
    assert got["B"] == (2, 0)  # 7 -> 9


def test_streaming_cdc_snapshot_parity(spark, tmp_path):
    """Streaming type-1 state: a changelog split into 3 files (the
    third carrying an out-of-order change against a key deleted in an
    earlier batch), folded into the persisted snapshot one file per
    micro-batch via foreachBatch -> cdc_refresh. The served snapshot
    must equal the one-shot batch apply over the whole log — pinning
    that stored tombstones out-rank late older changes across
    micro-batch boundaries."""
    from datafusion_uba_spark.operators.scd import cdc_apply, cdc_init
    from datafusion_uba_spark.operators.scd import cdc_serve
    from datafusion_uba_spark.streaming import streaming_cdc_snapshot

    schema = "user_id long, seq long, op string, payload long"
    b1 = spark.createDataFrame(
        [(1, 1, "U", 10), (2, 5, "D", 0), (3, 1, "U", 30)], schema
    )
    b2 = spark.createDataFrame(
        [(1, 2, "U", 11), (4, 1, "U", 40)], schema
    )
    b3 = spark.createDataFrame(
        [(2, 3, "U", 99), (3, 9, "D", 0)], schema
    )
    src = str(tmp_path / "cdc_log")
    b1.coalesce(1).write.mode("overwrite").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)
    b3.coalesce(1).write.mode("append").parquet(src)
    table = "cdc_stream_store"
    try:
        cdc_init(b1.limit(0), table, ["user_id"], ["seq"], n_buckets=4)
        sdf = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", "1")
            .option("pathGlobFilter", "*.parquet")
            .parquet(src)
        )
        q = streaming_cdc_snapshot(
            sdf, table, ["user_id"], ["seq"], n_buckets=4
        )
        n_batches = len(
            [p for p in q.recentProgress if p["numInputRows"] > 0]
        )
        got = sorted(
            (r["user_id"], r["seq"], r["payload"])
            for r in cdc_serve(spark, table).collect()
        )
        full = b1.unionByName(b2).unionByName(b3)
        want = sorted(
            (r["user_id"], r["seq"], r["payload"])
            for r in cdc_apply(full, ["user_id"], ["seq"], "op").collect()
        )
        assert got == want
        assert got == [(1, 2, 11), (4, 1, 40)]
        assert n_batches >= 3, f"expected >=3 micro-batches, got {n_batches}"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_streaming_semantic_dedup_against_parity(spark, tmp_path):
    """Embedding ingest, streamed: a batch of probe vectors (copies of
    corpus vectors under new ids + genuinely novel vectors) flows
    through a file stream into streaming_semantic_dedup_against with
    a persisted SemDeDup index; emitted (cluster, id_a, id_b,
    cosine_u) rows must equal the batch semantic_pairs_from_index —
    and the operator must be fully stateless (append mode, no
    watermark needed)."""
    from datafusion_uba_spark.operators import dedup
    from datafusion_uba_spark.streaming import (
        streaming_semantic_dedup_against,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    corpus = emb.where("vec_id % 4 != 0")
    dupes = emb.where("vec_id % 4 = 0 AND vec_id < 200").select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    novel = spark.createDataFrame(
        [(2_000_000 + i, [float((i * 37 + j * 11) % 97) for j in range(64)])
         for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    inc_dir = str(tmp_path / "emb_increment")
    dupes.unionByName(novel).write.parquet(inc_dir)
    inc = spark.read.parquet(inc_dir)

    try:
        dedup.semantic_index_build(corpus, "sem_stream_idx", k=16)
        want = {
            tuple(r)
            for r in dedup.semantic_pairs_from_index(
                spark, "sem_stream_idx", inc, threshold=0.4
            ).collect()
        }
        assert want, "expected copied vectors to match the corpus"

        # batch frame through the SAME streaming helper
        batch_got = {
            tuple(r)
            for r in streaming_semantic_dedup_against(
                inc, "sem_stream_idx", threshold=0.4
            ).collect()
        }
        assert batch_got == want

        schema = inc.schema
        semb = spark.readStream.schema(schema).parquet(inc_dir)
        out = streaming_semantic_dedup_against(
            semb, "sem_stream_idx", threshold=0.4
        )
        run_to_memory(out, "sem_ingest", output_mode="append")
        got = {
            tuple(r) for r in spark.table("sem_ingest").collect()
        }
        assert got == want
    finally:
        dedup.drop_semantic_index(spark, "sem_stream_idx")


def test_streaming_semantic_dedup_interleaved_upserts(spark, tmp_path):
    """The production daily loop, three days of it: day-1 probe ->
    upsert day-1 -> day-2 probe -> upsert day-2 -> day-3 probe. Each
    day's file stream probes the PERSISTED index as of that morning
    (fresh query per day — the daily-job pattern), and each day's
    stream output must equal the batch semantic_pairs_from_index at
    the same index state. The headline pin: a vector ingested on
    day 1 is found as the duplicate of its day-3 copy THROUGH the
    index — the corpus is never re-clustered (the meta row, k, and
    centroids stay byte-identical across both upserts)."""
    from datafusion_uba_spark.operators import dedup
    from datafusion_uba_spark.operators.dedup import _sem_read_meta
    from datafusion_uba_spark.streaming import (
        streaming_semantic_dedup_against,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    corpus = emb.where("vec_id % 4 != 0")
    day1 = emb.where("vec_id % 4 = 0 AND vec_id < 120").select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    day2 = spark.createDataFrame(
        [(3_000_000 + i,
          [float((i * 53 + j * 17) % 89) for j in range(64)])
         for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    # day-3 = exact copies of day-1 vectors under fresh ids: only an
    # index that RETAINED day-1 can call them duplicates
    day3 = day1.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )

    def probe_stream(df, day, state):
        d = str(tmp_path / f"sem_day{day}")
        df.write.parquet(d)
        static = spark.read.parquet(d)
        want = {
            tuple(r)
            for r in dedup.semantic_pairs_from_index(
                spark, "sem_daily_idx", static, threshold=0.4
            ).collect()
        }
        sdf = spark.readStream.schema(static.schema).parquet(d)
        out = streaming_semantic_dedup_against(
            sdf, "sem_daily_idx", threshold=0.4
        )
        run_to_memory(out, f"sem_day{day}_{state}", output_mode="append")
        got = {
            tuple(r)
            for r in spark.table(f"sem_day{day}_{state}").collect()
        }
        assert got == want, f"day {day}: stream != batch oracle"
        return got, static

    try:
        dedup.semantic_index_build(corpus, "sem_daily_idx", k=16)
        meta0 = _sem_read_meta(spark, "sem_daily_idx").asDict()

        got1, s1 = probe_stream(day1, 1, "a")
        assert dedup.semantic_index_upsert(s1, "sem_daily_idx") > 0

        got2, s2 = probe_stream(day2, 2, "a")
        assert dedup.semantic_index_upsert(s2, "sem_daily_idx") > 0

        got3, _ = probe_stream(day3, 3, "a")
        day1_ids = {r["vec_id"] for r in day1.collect()}
        cross = {
            (a, b) for (_, a, b, c) in got3
            if a in day1_ids and b == a + 1_000_000
            and c == 1_000_000
        }
        assert cross == {(i, i + 1_000_000) for i in day1_ids}, (
            "day-3 copies must match their day-1 originals at exact "
            "cosine 1.0 through the persisted index"
        )
        # never re-clustered: geometry identical after two upserts
        meta3 = _sem_read_meta(spark, "sem_daily_idx").asDict()
        assert meta3 == meta0
    finally:
        dedup.drop_semantic_index(spark, "sem_daily_idx")


def test_streaming_prescreened_dedup_multi_batch_parity(spark, tmp_path):
    """Stream-static face of the r13 bit-set prescreen: arrivals mixed
    from novel docs (clear bit — must bypass the corpus), corpus
    copies (set bit — confirm join drops them), and a within-stream
    duplicate whose second arrival lands in a LATER micro-batch
    (maxFilesPerTrigger=1), pinning cross-batch fingerprint state.
    The stream's final rows must equal the batch twin
    dedup_against_prescreened over the union of all arrivals — ids
    included (first arrival is also min id by construction)."""
    from datafusion_uba_spark.operators import dedup
    from datafusion_uba_spark.streaming import (
        streaming_exact_dedup_against_prescreened,
    )

    corpus = spark.createDataFrame(
        [(i, f"corpus doc number {i}") for i in range(50)],
        "doc_id long, text string",
    )
    day = "2024-03-01 00:00:{:02d}"
    file1 = [
        (100, "fresh document alpha", day.format(1)),
        (101, "corpus doc number 7", day.format(2)),   # corpus copy
        (102, "fresh document beta", day.format(3)),
        (103, "fresh document alpha", day.format(4)),  # in-batch dup
    ]
    file2 = [
        (200, "fresh document alpha", day.format(5)),  # cross-BATCH dup
        (201, "fresh document gamma", day.format(6)),
        (202, "corpus doc number 33", day.format(7)),  # corpus copy
    ]
    schema = "doc_id long, text string, ts string"
    src = str(tmp_path / "presc_src")
    os.makedirs(src)
    import glob
    import shutil

    for i, rows in enumerate([file1, file2], start=1):
        stage = str(tmp_path / f"presc_stage{i}")
        spark.createDataFrame(rows, schema).withColumn(
            "ts", F.to_timestamp("ts")
        ).coalesce(1).write.parquet(stage)
        (part,) = glob.glob(f"{stage}/part-*.parquet")
        dst = f"{src}/file{i}.parquet"
        shutil.copyfile(part, dst)
        # one file per micro-batch, in file order: the source orders
        # by modification time, so pin distinct mtimes explicitly
        os.utime(dst, (1_000_000 * i, 1_000_000 * i))

    arrivals = spark.read.parquet(src)
    want = {
        (r["doc_id"], r["fingerprint"])
        for r in dedup.dedup_against_prescreened(
            arrivals, corpus
        ).collect()
    }
    assert len(want) == 3  # alpha (id 100), beta, gamma

    sdf = (
        spark.readStream.schema(arrivals.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_exact_dedup_against_prescreened(
        sdf, corpus, time_col="ts", watermark="1 hour"
    )
    run_to_memory(out, "presc_stream", output_mode="append")
    got = {
        (r["doc_id"], r["fingerprint"])
        for r in spark.table("presc_stream").collect()
    }
    assert got == want

    # unbounded-stream contract: no watermark -> refuse
    with pytest.raises(ValueError, match="requires"):
        streaming_exact_dedup_against_prescreened(sdf, corpus)
    with pytest.raises(ValueError, match="BOTH"):
        streaming_exact_dedup_against_prescreened(
            arrivals, corpus, time_col="ts"
        )
    # batch frames through the same helper: exact batch twin answer —
    # including the natural parity call that passes (time_col,
    # watermark) with a batch frame (Spark 4 rejects the watermark
    # collapse on batch frames at action time, so it must be routed
    # to the min-id branch, not crash)
    for kwargs in ({}, {"time_col": "ts", "watermark": "1 hour"}):
        batch_got = {
            (r["doc_id"], r["fingerprint"])
            for r in streaming_exact_dedup_against_prescreened(
                arrivals, corpus, **kwargs
            ).collect()
        }
        assert batch_got == want, kwargs


def test_quality_classifier_streams_stateless(spark, tmp_path):
    """quality_classifier_scores is a pure per-row fold (zero shuffles,
    no aggregation state), so the SAME call works on a readStream frame
    unmodified in append mode — the quality-gate pass a crawl-ingest
    stream applies before anything stateful. Stream output must equal
    the batch twin row-for-row."""
    import os

    from datafusion_uba_spark.operators.text import (
        quality_classifier_scores,
    )

    rows = [
        (1, "the query engine reads the table"),
        (2, ""),
        (3, "zz yy xx"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "qc_stream")
    os.makedirs(d, exist_ok=True)
    docs.write.mode("overwrite").parquet(d)

    batch = {
        tuple(r) for r in quality_classifier_scores(
            spark.read.parquet(d)
        ).collect()
    }
    sdocs = spark.readStream.schema(docs.schema).parquet(d)
    sdf = quality_classifier_scores(sdocs)
    assert sdf.isStreaming
    run_to_memory(sdf, "qc_stream_parity", output_mode="append")
    got = {tuple(r) for r in spark.sql("SELECT * FROM qc_stream_parity").collect()}
    assert got == batch and len(got) == 3


def test_dsir_score_against_streams_stateless(spark, tmp_path):
    """dsir_score_against is a pure per-row fold over a broadcast
    delta-map column, so the day-N+1 crawl can be scored against
    yesterday's corpus distributions on a readStream frame unmodified
    (append mode, no state). Stream output must equal the batch twin,
    including an unseen-bucket token (contributes 0) and an empty
    document."""
    import os

    from pyspark.sql import functions as SF

    from datafusion_uba_spark.operators.hashing import md5_prefix_int
    from datafusion_uba_spark.operators.text import (
        dsir_score_against,
        tokens_from_norm,
        normalize_text,
    )

    # yesterday's "distributions": a hand-built 2-bucket delta map
    b_hot = spark.range(1).select(
        md5_prefix_int(SF.concat(SF.lit("f:"), SF.lit("hot")), 4)
        .cast("int")
        .alias("b")
    ).collect()[0]["b"]
    feat_map = spark.createDataFrame(
        [([(b_hot, 500)],)], "e array<struct<b int, d long>>"
    ).select(
        SF.map_from_entries(
            SF.transform("e", lambda x: SF.struct(x.b.alias("key"),
                                                  x.d.alias("value")))
        ).alias("__fm")
    )

    rows = [(1, "hot hot cold"), (2, ""), (3, "cold")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "dsir_stream")
    os.makedirs(d, exist_ok=True)
    docs.write.mode("overwrite").parquet(d)

    def score(frame):
        toks = frame.select(
            "doc_id",
            SF.coalesce(
                tokens_from_norm(normalize_text("text")),
                SF.array().cast("array<string>"),
            ).alias("__toks"),
        )
        return dsir_score_against(
            toks.crossJoin(SF.broadcast(feat_map)), id_col="doc_id"
        )

    batch = {tuple(r) for r in score(spark.read.parquet(d)).collect()}
    sdf = score(spark.readStream.schema(docs.schema).parquet(d))
    assert sdf.isStreaming
    run_to_memory(sdf, "dsir_stream_parity", output_mode="append")
    got = {
        tuple(r)
        for r in spark.sql("SELECT * FROM dsir_stream_parity").collect()
    }
    assert got == batch and len(got) == 3
    by_id = {t[0]: t for t in got}
    # doc 1: two 'hot' hits (500 each) + one unseen-bucket token (0)
    assert by_id[1] == (1, 3, 1000, 333, True)
    assert by_id[2] == (2, 0, 0, 0, False)
    assert by_id[3] == (3, 1, 0, 0, False)


def test_streaming_ann_topk_from_index_parity(spark, tmp_path):
    """Online ANN serving: query vectors split into 3 files streamed
    one file per micro-batch (maxFilesPerTrigger=1) through
    streaming_ann_topk_from_index -> foreachBatch ->
    ivf_topk_from_index, appending to a sink table. Because queries
    are independent requests, the union of per-batch answers must
    equal the one-shot batch probe over all queries — same scorer,
    same index, exact (rank, cosine_u) parity — and the sink's
    batch_id stamps must show >= 3 distinct micro-batches."""
    from datafusion_uba_spark.operators import similarity
    from datafusion_uba_spark.streaming import streaming_ann_topk_from_index

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where("vec_id < 9").select("vec_id", "embedding")
    src = str(tmp_path / "ann_queries")
    for lo, hi in ((0, 3), (3, 6), (6, 9)):
        queries.where(f"vec_id >= {lo} AND vec_id < {hi}").coalesce(
            1
        ).write.mode("append").parquet(src)
    sink = "ann_stream_sink"
    try:
        similarity.ivf_build_index(emb, "ann_stream_idx", n_cells=16)
        sq = (
            spark.readStream.schema(queries.schema)
            .option("maxFilesPerTrigger", "1")
            .option("pathGlobFilter", "*.parquet")
            .parquet(src)
        )
        q = streaming_ann_topk_from_index(
            sq, "ann_stream_idx", sink, k=5, n_probe=4
        )
        n_batches = len(
            [p for p in q.recentProgress if p["numInputRows"] > 0]
        )
        served = spark.table(sink)
        got = {
            (r.query_id, r.rank, r.vec_id, r.cosine_u)
            for r in served.collect()
        }
        want = {
            (r.query_id, r.rank, r.vec_id, r.cosine_u)
            for r in similarity.ivf_topk_from_index(
                spark, "ann_stream_idx", queries, k=5, n_probe=4
            ).collect()
        }
        assert got == want and len(got) == 9 * 5
        assert n_batches >= 3, f"expected >=3 micro-batches, got {n_batches}"
        # each query answered exactly once, in exactly one micro-batch
        # (no replays, no splits), and each batch served one whole file
        per_batch = {
            (r.batch_id, r.query_id) for r in served.collect()
        }
        batches_of = {}
        for b, qid in per_batch:
            batches_of.setdefault(qid, set()).add(b)
        assert all(len(bs) == 1 for bs in batches_of.values()), batches_of
        from collections import Counter

        sizes = Counter(b for b, _ in per_batch)
        assert sorted(sizes.values()) == [3, 3, 3], sizes
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {sink}")
        similarity.drop_ivf_index(spark, "ann_stream_idx")


def test_stream_avro_py_ingest(spark, tmp_path):
    """r18: streaming Avro drop-zone ingest — files decoded per
    micro-batch through the dependency-free codec; a second
    availableNow pass picks up ONLY newly-landed files when reusing a
    checkpoint-free memory run (full re-read), and the reader-schema
    evolution path holds through the stream."""
    from datafusion_uba_spark.sources.avro_py import write_avro_py
    from datafusion_uba_spark.streaming import run_to_memory, stream_avro_py

    d = str(tmp_path / "avro_drop")
    df1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, s string"
    )
    write_avro_py(df1.coalesce(1), d)

    sdf = stream_avro_py(spark, d)
    run_to_memory(sdf, "avro_stream_t1")
    got1 = {tuple(r) for r in spark.table("avro_stream_t1").collect()}
    assert got1 == {(1, "a"), (2, "b")}

    # a new drop lands; a fresh availableNow run reads both files
    df2 = spark.createDataFrame([(3, "c")], "id long, s string")
    import os

    os.rename(
        os.path.join(d, "part-00000.avro"),
        os.path.join(d, "drop-00000.avro"),
    )
    write_avro_py(df2.coalesce(1), d)
    sdf2 = stream_avro_py(spark, d)
    run_to_memory(sdf2, "avro_stream_t2")
    got2 = {tuple(r) for r in spark.table("avro_stream_t2").collect()}
    assert got2 == {(1, "a"), (2, "b"), (3, "c")}

    # evolution through the stream: reader adds a defaulted column
    reader = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "id", "type": ["null", "long"]},
            {"name": "s", "type": ["null", "string"]},
            {"name": "v", "type": "long", "default": 7},
        ],
    }
    sdf3 = stream_avro_py(spark, d, reader_schema=reader)
    run_to_memory(sdf3, "avro_stream_t3")
    got3 = {tuple(r) for r in spark.table("avro_stream_t3").collect()}
    assert got3 == {(1, "a", 7), (2, "b", 7), (3, "c", 7)}

    # empty dir without a schema is a loud bootstrap error
    import pytest as _pytest

    empty = str(tmp_path / "nothing")
    os.makedirs(empty)
    with _pytest.raises(ValueError, match="bootstrap"):
        stream_avro_py(spark, empty)
    # ...but an explicit schema works over an empty dir (zero rows)
    sdf4 = stream_avro_py(spark, empty, schema="id long, s string")
    run_to_memory(sdf4, "avro_stream_t4")
    assert spark.table("avro_stream_t4").count() == 0
