"""Round-2 hardening tests: macro constant folding, known_m provability,
slt runner valuesort/complete-splice/DECIMAL columns/multi-line cells,
retention_count scatter strategy, and the reference slt corpus verbatim.
"""

import os
import textwrap

import pytest
from pyspark.sql import functions as F

from datafusion_uba_spark.operators.retention import retention_count
from datafusion_uba_spark.plans import sql_macro
from datafusion_uba_spark.slt import runner
from datafusion_uba_spark.sources import load_table

# --- macro constant folding -------------------------------------------------


def test_const_int_basic():
    assert sql_macro._const_int("20230107-20230101") == 6
    assert sql_macro._const_int("(2+3)*2") == 10
    assert sql_macro._const_int("-1 + 7") == 6


@pytest.mark.parametrize(
    "bad", ["9**9**9", "", "   ", "1 +", "x", "__import__('os')", "1//1", "1%2"]
)
def test_const_int_rejects(bad):
    with pytest.raises(ValueError):
        sql_macro._const_int(bad)


def test_unroll_window_limit():
    with pytest.raises(ValueError, match="unroll limit"):
        sql_macro.expand_macros(
            "SELECT retention_count(a, b, 100000, d) FROM t GROUP BY u"
        )


# --- known_m provability ------------------------------------------------------


def test_sum_unrolls_only_from_proven_alias():
    funnel = """
    select retention_sum(stats) from (
      select u, retention_count(b, t, 2, d) as stats from e group by u)
    """
    out = sql_macro.expand_macros(funnel)
    assert "collect_list" not in out  # unrolled path

    unrelated = """
    select retention_count(b, t, 2, d) as stats from e group by u
    ;
    select retention_sum(other_col) from pre_registered
    """
    # r9 contract: an unproven column can no longer silently plan the
    # collect_list fold — without a session to probe the window length,
    # expand_macros refuses (sql(spark, ...) probes and unrolls instead)
    with pytest.raises(ValueError, match="not provable"):
        sql_macro.expand_macros(unrelated)


def test_sum_qualified_alias_still_proven():
    q = """
    select retention_sum(t.stats) from (
      select u, retention_count(b, tg, 3, d) as stats from e group by u) t
    """
    out = sql_macro.expand_macros(q)
    assert "collect_list" not in out


# --- slt runner ---------------------------------------------------------------


def test_rewrite_statement_decimal_columns():
    got = runner.rewrite_statement(
        "CREATE TABLE t (a DECIMAL(10,2), b INT) AS VALUES (1.5, 2)"
    )
    assert "__t(a, b)" in got
    assert "TEMPORARY VIEW t" in got


def test_expand_row_multiline_dashes():
    rows = runner._expand_row(["plan", "Sort: x\n  Project: y"])
    assert rows == [["plan"], ["Sort: x"], ["--Project: y"]]


def test_valuesort(spark):
    slt = textwrap.dedent(
        """\
        query II valuesort
        SELECT * FROM (VALUES (3, 1), (2, 4)) AS t(a, b)
        ----
        1
        2
        3
        4
        """
    )
    failures, _ = runner.run_text(spark, slt)
    assert failures == []


def test_complete_mode_splices_preserving_structure(spark, tmp_path):
    slt = textwrap.dedent(
        """\
        # leading comment survives

        statement ok
        CREATE TABLE ct (a INT) AS VALUES (1), (2)

        # mid comment survives
        query I rowsort
        SELECT a FROM ct
        ----
        999

        halt

        # after halt stays untouched
        query I
        SELECT broken
        """
    )
    path = tmp_path / "c.slt"
    path.write_text(slt)
    failures = runner.run_file(spark, str(path), complete=True)
    assert failures == []
    completed = path.read_text()
    assert "# leading comment survives" in completed
    assert "# mid comment survives" in completed
    assert "halt" in completed
    assert "# after halt stays untouched" in completed
    assert "SELECT broken" in completed  # untouched beyond halt
    assert "999" not in completed  # stale block replaced
    # and the completed file now passes verification
    assert runner.run_file(spark, str(path)) == []


def test_decimal_normalization():
    from decimal import Decimal

    assert runner.norm_value(Decimal("1.50")) == "1.5"
    assert runner.norm_value(Decimal("0.333333333333333")) == "0.333333333333"
    assert runner.norm_value("line\n\n") == "line"


# --- retention_count scatter strategy ----------------------------------------


def test_scatter_matches_unrolled(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    win = ev.where(day.between("2024-01-01", "2024-01-07")).withColumn(
        "__d", F.datediff(day, F.lit("2024-01-01").cast("date"))
    )
    kwargs = dict(
        born_event=F.col("event_type") == "signup",
        target_event=F.col("event_type") == "purchase",
        max_unit=6,
        time_diff=F.col("__d"),
        group_by="user_id",
    )
    a = retention_count(win, strategy="unrolled", **kwargs).collect()
    b = retention_count(win, strategy="scatter", **kwargs).collect()
    am = {r.user_id: r.stats for r in a}
    bm = {r.user_id: r.stats for r in b}
    assert am == bm and len(am) > 0


def test_auto_strategy_switches():
    # plan-only check: auto at a 365-day window must not build 732 aggs
    assert sql_macro.MAX_UNROLL_WINDOW >= 366  # SQL macro still serves a year
    from datafusion_uba_spark.operators.retention import UNROLL_LIMIT

    assert UNROLL_LIMIT < 365


# --- reference slt corpus, verbatim ------------------------------------------

_REF_SLT = "/root/reference/tests/sqllogictests/test_files/retention.slt"


@pytest.mark.skipif(not os.path.exists(_REF_SLT), reason="reference absent")
def test_reference_retention_slt_verbatim(spark):
    failures = runner.run_file(spark, _REF_SLT)
    assert failures == [], "\n\n".join(
        f"line {f.line}: {f.message}" for f in failures
    )
