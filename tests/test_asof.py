"""as-of join: crafted boundary goldens + a property pin against a
naive Python model (the DuckDB ASOF JOIN parity lives in
test_oracle_parity via the asof_view_value registry row)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_uba_spark.operators.asof import asof_join

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_golden(spark):
    left = _mk(spark, [(1, 10), (1, 5), (1, 4), (2, 7)], "k long, t long")
    right = _mk(
        spark,
        [(1, 5, "a"), (1, 9, "b"), (2, 8, "c")],
        "k long, t long, v string",
    )
    got = {
        (r.k, r.t, r.t_asof, r.v_asof)
        for r in asof_join(left, right, on="k", left_ts="t").collect()
    }
    assert got == {
        (1, 10, 9, "b"),  # latest right <= 10
        (1, 5, 5, "a"),   # boundary: equal ts matches (inclusive)
        (1, 4, None, None),  # nothing at or before 4
        (2, 7, None, None),  # right exists only later
    }


def test_asof_forward_golden(spark):
    left = _mk(spark, [(1, 10), (1, 5), (2, 9)], "k long, t long")
    right = _mk(
        spark, [(1, 5, "a"), (1, 9, "b")], "k long, t long, v string"
    )
    got = {
        (r.k, r.t, r.t_asof, r.v_asof)
        for r in asof_join(
            left, right, on="k", left_ts="t", direction="forward"
        ).collect()
    }
    assert got == {
        (1, 10, None, None),  # nothing at or after 10
        (1, 5, 5, "a"),       # boundary inclusive
        (2, 9, None, None),
    }


def test_asof_tolerance(spark):
    left = _mk(spark, [(1, 100), (1, 20)], "k long, t long")
    right = _mk(spark, [(1, 10, "a")], "k long, t long, v string")
    got = {
        (r.k, r.t, r.t_asof, r.v_asof)
        for r in asof_join(
            left, right, on="k", left_ts="t", tolerance=15
        ).collect()
    }
    assert got == {
        (1, 100, None, None),  # 90 > 15: match nulled
        (1, 20, 10, "a"),      # 10 <= 15
    }


def test_asof_forward_tie_determinism(spark):
    # forward ties must ALSO pick the largest payload (an ordering bug
    # made forward ties pick the smallest while backward picked the
    # largest; hypothesis missed the case, this golden pins it)
    left = _mk(spark, [(1, 5)], "k long, t long")
    right = _mk(
        spark, [(1, 9, "b"), (1, 9, "z")], "k long, t long, v string"
    )
    rows = asof_join(
        left, right, on="k", left_ts="t", direction="forward"
    ).collect()
    assert [(r.t_asof, r.v_asof) for r in rows] == [(9, "z")]


def test_asof_tie_determinism(spark):
    # two right rows on the same (key, ts): the largest payload struct
    # wins, every run
    left = _mk(spark, [(1, 10)], "k long, t long")
    right = _mk(
        spark, [(1, 10, "a"), (1, 10, "z")], "k long, t long, v string"
    )
    for _ in range(3):
        rows = asof_join(left, right, on="k", left_ts="t").collect()
        assert [(r.t_asof, r.v_asof) for r in rows] == [(10, "z")]


def _model(left, right, direction="backward", tol=None):
    out = set()
    for (k, t) in left:
        if direction == "backward":
            cands = [
                (rt, v) for (rk, rt, v) in right if rk == k and rt <= t
            ]
            if tol is not None:
                cands = [(rt, v) for (rt, v) in cands if t - rt <= tol]
            # latest ts wins; largest payload on ts ties
            best = max(cands) if cands else None
        else:
            cands = [
                (rt, v) for (rk, rt, v) in right if rk == k and rt >= t
            ]
            if tol is not None:
                cands = [(rt, v) for (rt, v) in cands if rt - t <= tol]
            # earliest ts wins; largest payload on ts ties
            best = (
                max(
                    (rt, v)
                    for (rt, v) in cands
                    if rt == min(c[0] for c in cands)
                )
                if cands
                else None
            )
        if best:
            out.add((k, t, best[0], best[1]))
        else:
            out.add((k, t, None, None))
    return out


_ts = st.integers(min_value=0, max_value=20)


@given(
    left=st.lists(st.tuples(st.integers(1, 2), _ts), min_size=1, max_size=8),
    right=st.lists(
        st.tuples(st.integers(1, 2), _ts, st.integers(0, 9)),
        min_size=0,
        max_size=8,
    ),
    direction=st.sampled_from(["backward", "forward"]),
)
@settings(**_SETTINGS)
def test_asof_matches_model(spark, left, right, direction):
    ldf = _mk(spark, list(set(left)), "k long, t long")
    rdf = _mk(
        spark, list(set(right)) or [(0, 0, 0)], "k long, t long, v long"
    )
    got = {
        (r.k, r.t, r.t_asof, r.v_asof)
        for r in asof_join(
            ldf, rdf, on="k", left_ts="t", direction=direction
        ).collect()
    }
    assert got == _model(set(left), set(right) or {(0, 0, 0)}, direction)


def test_asof_nearest_ties_to_backward(spark):
    """r11 nearest direction: equidistant right rows resolve to the
    BACKWARD match (pandas merge_asof's rule); one-sided cases fall
    back to whichever direction has a match; tolerance applies per
    direction."""
    from datafusion_uba_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 250), (3, 1, 400), (4, 2, 10)],
        "id long, k long, ts long",
    )
    right = spark.createDataFrame(
        [(1, 90, "b90"), (1, 110, "f110"),   # id1: 10 both ways -> b90
         (1, 260, "f260"),                    # id2: fwd 10 vs back 140
         (1, 390, "b390")],                   # id3: back 10 (no fwd)
        "k long, ts long, tag string",
    )
    got = {
        r["id"]: (r["ts_asof"], r["tag_asof"])
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            right_cols=["tag"], direction="nearest", tolerance=50,
        ).collect()
    }
    assert got[1] == (90, "b90")      # tie -> backward
    assert got[2] == (260, "f260")    # forward closer
    assert got[3] == (390, "b390")    # only backward in tolerance
    assert got[4] == (None, None)     # no right rows for key 2

    import pytest as _pt
    with _pt.raises(ValueError, match="direction"):
        asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                  direction="sideways")
