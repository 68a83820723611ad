"""range_join: boundary goldens + property pin vs a naive model (the
DuckDB BETWEEN-join parity runs in test_oracle_parity via the
session_of_event registry row)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_uba_spark.operators.interval import range_join

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def test_range_join_golden(spark):
    pts = spark.createDataFrame(
        [(1, 5), (1, 10), (1, 15), (2, 5)], "k long, t long"
    )
    ivl = spark.createDataFrame(
        # intervals spanning multiple buckets, nested, and boundary hits
        [(1, 0, 10, "a"), (1, 10, 20, "b"), (2, 6, 9, "c")],
        "k long, s long, e long, name string",
    )
    got = {
        (r.k, r.t, r.name)
        for r in range_join(
            pts, ivl, on="k", point_ts="t", start_col="s", end_col="e",
            bucket_width=4,
        ).collect()
    }
    assert got == {
        (1, 5, "a"),
        (1, 10, "a"),  # end boundary inclusive
        (1, 10, "b"),  # start boundary inclusive -> both intervals
        (1, 15, "b"),
        # (2, 5): interval c starts later -> no match
    }


def _model(pts, ivls):
    return {
        (k, t, s, e, i)
        for (k, t) in pts
        for i, (ik, s, e) in enumerate(ivls)
        if ik == k and s <= t <= e
    }


@given(
    pts=st.lists(
        st.tuples(st.integers(1, 2), st.integers(0, 30)),
        min_size=1,
        max_size=8,
        unique=True,
    ),
    ivls=st.lists(
        st.tuples(
            st.integers(1, 2), st.integers(0, 30), st.integers(0, 12)
        ).map(lambda x: (x[0], x[1], x[1] + x[2])),
        min_size=0,
        max_size=6,
    ),
    width=st.sampled_from([1, 3, 7, 64]),
)
@settings(**_SETTINGS)
def test_range_join_matches_model(spark, pts, ivls, width):
    pdf = spark.createDataFrame(list(pts), "k long, t long")
    idf = spark.createDataFrame(
        [(k, s, e, i) for i, (k, s, e) in enumerate(ivls)] or
        [(0, 0, 0, -1)],
        "k long, s long, e long, ivl_id long",
    )
    got = {
        (r.k, r.t, r.s, r.e, r.ivl_id)
        for r in range_join(
            pdf, idf, on="k", point_ts="t", start_col="s", end_col="e",
            bucket_width=width,
        ).collect()
    }
    want = _model(pts, ivls) if ivls else set()
    assert got == want


def test_merge_intervals_crafted(spark):
    """r11 gaps-and-islands merge: overlap fuses, touching fuses
    (half-open), a gap splits, containment collapses; empty/inverted
    intervals raise in-plan."""
    import pytest as _pt
    from pyspark.errors import SparkRuntimeException

    from datafusion_uba_spark.operators.interval import merge_intervals

    rows = [
        ("a", 0, 10), ("a", 5, 20),    # overlap -> [0, 20)
        ("a", 20, 30),                 # touches -> fuses to [0, 30)
        ("a", 40, 50),                 # gap -> new island
        ("a", 41, 45),                 # contained -> same island
        ("b", 100, 101),
    ]
    df = spark.createDataFrame(rows, "key string, start long, end long")
    got = {
        (r["key"], r["island_start"]): (
            r["island_end"], r["n_intervals"], r["covered"]
        )
        for r in merge_intervals(df).collect()
    }
    assert got == {
        ("a", 0): (30, 3, 30),
        ("a", 40): (50, 2, 10),
        ("b", 100): (101, 1, 1),
    }

    bad = spark.createDataFrame([("a", 5, 5)], "key string, start long, end long")
    with _pt.raises(SparkRuntimeException, match="empty or inverted"):
        merge_intervals(bad).collect()


def test_max_concurrency_golden(spark):
    """Crafted sweep cases with bucket=100us, day=1000us: overlap
    inside a bucket, an interval spanning buckets (active across the
    clip boundary), a point interval, and the +1-before--1 tie rule
    (touching intervals count as concurrent)."""
    from datafusion_uba_spark.operators.interval import max_concurrency

    iv = spark.createDataFrame(
        [
            # day 0: three overlapping at t=150..160 (one spans buckets
            # 0->1 and must stay counted after the clip at 100)
            (50, 160),
            (140, 260),
            (150, 155),
            # day 1: touching pair (end == next start) -> concurrent=2
            (1100, 1200),
            (1200, 1300),
            # day 2: point interval alone + a disjoint later one
            (2500, 2500),
            (2700, 2750),
        ],
        "s long, e long",
    )
    got = {
        (r.bucket_i, r.max_concurrent)
        for r in max_concurrency(
            iv, start_col="s", end_col="e", bucket_us=100,
            out_bucket_us=1000,
        ).collect()
    }
    assert got == {(0, 3), (1, 2), (2, 1)}


def test_max_concurrency_inverted_raises(spark):
    from datafusion_uba_spark.operators.interval import max_concurrency

    iv = spark.createDataFrame([(10, 5)], "s long, e long")
    import pytest as _pt

    with _pt.raises(Exception, match="inverted interval"):
        max_concurrency(iv, start_col="s", end_col="e").collect()


def test_max_concurrency_bad_bucket_ratio(spark):
    from datafusion_uba_spark.operators.interval import max_concurrency

    iv = spark.createDataFrame([(1, 2)], "s long, e long")
    import pytest as _pt

    with _pt.raises(ValueError, match="multiple"):
        max_concurrency(iv, start_col="s", end_col="e", bucket_us=7)
