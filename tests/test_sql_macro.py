"""The macro layer must run the reference's SQL-string queries verbatim
(modulo table names) — retention.slt:12-22,31-41,46-56 shapes."""

import pytest

from datafusion_uba_spark.plans.sql_macro import expand_macros, sql


@pytest.fixture(scope="module")
def event_view(spark):
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW slt_events AS
        SELECT * FROM VALUES
          (1, 'add', 20230101), (2, 'add', 20230101), (3, 'add', 20230101),
          (1, 'buy', 20230101), (2, 'buy', 20230101), (3, 'buy', 20230101)
        AS t(distinct_id, event, ds)
        """
    )
    return "slt_events"


def to_py(m):
    return [list(r) for r in m]


def test_count_sql(spark, event_view):
    got = sql(
        spark,
        """
        SELECT distinct_id,
               retention_count(event = 'add', event = 'buy',
                               20230101 - 20230101, ds - 20230101) AS stats
        FROM slt_events GROUP BY distinct_id ORDER BY distinct_id
        """,
    ).collect()
    assert [(r["distinct_id"], to_py(r["stats"])) for r in got] == [
        (1, [[1], [1]]),
        (2, [[1], [1]]),
        (3, [[1], [1]]),
    ]


def test_funnel_sql_unrolled(spark, event_view):
    # funnel in one statement → unrolled SUM-per-cell expansion
    got = sql(
        spark,
        """
        SELECT retention_sum(stats) AS retention FROM (
          SELECT distinct_id,
                 retention_count(event = 'add', event = 'buy',
                                 20230101 - 20230101, ds - 20230101) AS stats
          FROM slt_events GROUP BY distinct_id
        ) t
        """,
    ).collect()
    assert to_py(got[0]["retention"]) == [[3], [3]]


def test_sum_sql_standalone_probed(spark):
    # standalone retention_sum (window length unknown from the text) →
    # the length is PROBED with one aggregate pass, then unrolled into
    # per-cell SUMs — never the r≤8 collect_list fold (r8 verdict #1)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW slt_stats AS
        SELECT * FROM VALUES
          (1, array(array(1Y, 1Y), array(1Y, 0Y))),
          (2, array(array(1Y, 0Y), array(0Y, 1Y)))
        AS t(distinct_id, stats)
        """
    )
    df = sql(spark, "SELECT retention_sum(stats) AS r FROM slt_stats")
    got = df.collect()
    assert to_py(got[0]["r"]) == [[2, 1], [1, 1], [0]]
    # scale-safety pin: the expanded statement plans a hash aggregate
    # over per-cell sums, with NO per-group array gathering
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan
    assert "HashAggregate" in plan


def test_sum_sql_standalone_expand_without_session_raises(spark):
    # expand_macros alone has no session to probe with: it must refuse
    # the standalone sum rather than plan an unscalable fold
    with pytest.raises(ValueError, match="not provable"):
        expand_macros("SELECT retention_sum(stats) AS r FROM slt_stats")


def test_sum_sql_standalone_empty_input(spark):
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW slt_stats_empty AS
        SELECT * FROM VALUES (1, array(array(1Y), array(1Y)))
        AS t(distinct_id, stats) WHERE 1 = 0
        """
    )
    got = sql(
        spark, "SELECT retention_sum(stats) AS r FROM slt_stats_empty"
    ).collect()
    assert to_py(got[0]["r"]) == []


def test_sum_sql_standalone_same_event(spark):
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW slt_stats2 AS
        SELECT * FROM VALUES
          (1, array(array(1Y, 1Y), array(2Y, 2Y))),
          (2, array(array(1Y, 1Y), array(2Y, 2Y)))
        AS t(distinct_id, stats)
        """
    )
    got = sql(spark, "SELECT retention_sum(stats) AS r FROM slt_stats2").collect()
    assert to_py(got[0]["r"]) == [[2, 2], [0, 2], [0]]


def test_missing_born_case(spark):
    # retention.slt:24-41 analog
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW slt_err AS
        SELECT * FROM VALUES
          (1, 'error', 20230101), (2, 'add', 20230101), (3, 'add', 20230101),
          (1, 'buy', 20230101), (2, 'buy', 20230101), (3, 'buy', 20230101)
        AS t(distinct_id, event, ds)
        """
    )
    got = sql(
        spark,
        """
        SELECT distinct_id,
               retention_count(event = 'add', event = 'buy', 0, ds - 20230101) AS stats
        FROM slt_err GROUP BY distinct_id ORDER BY distinct_id
        """,
    ).collect()
    assert [to_py(r["stats"]) for r in got] == [[[0], [1]], [[1], [1]], [[1], [1]]]


def test_passthrough_no_macro():
    assert expand_macros("SELECT 1 AS x") == "SELECT 1 AS x"


def test_non_constant_max_unit_rejected():
    with pytest.raises(ValueError, match="constant integer"):
        expand_macros("SELECT retention_count(a, b, some_col, d) FROM t GROUP BY u")


def test_direct_nesting_rejected():
    with pytest.raises(ValueError, match="derived table"):
        expand_macros(
            "SELECT retention_sum(retention_count(a, b, 1, d)) FROM t"
        )


def test_string_literal_with_paren_and_comma(spark, event_view):
    # arg parsing must survive quoted strings containing , and )
    got = sql(
        spark,
        """
        SELECT distinct_id,
               retention_count(event = 'add', event in ('buy', 'x,)y'),
                               0, ds - 20230101) AS stats
        FROM slt_events GROUP BY distinct_id ORDER BY distinct_id
        """,
    ).collect()
    assert to_py(got[0]["stats"]) == [[1], [1]]


def test_sum_mixed_with_aliased_count_probed(spark):
    # r9 advice (medium): a statement mixing an aliased retention_count
    # with a standalone retention_sum over an UNRELATED column used to
    # build the probe from the raw text, leaving retention_count
    # unexpanded -> UNRESOLVED_ROUTINE. The probe is now built from the
    # same top-level walk as the final expansion.
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW slt_mixed AS
        SELECT * FROM VALUES
          (1, 'add', 20230101, array(array(1Y, 1Y), array(1Y, 0Y))),
          (2, 'buy', 20230101, array(array(1Y, 0Y), array(0Y, 1Y)))
        AS t(distinct_id, event, ds, prior)
        """
    )
    got = sql(
        spark,
        """
        SELECT retention_count(event = 'add', event = 'buy',
                               20230101 - 20230101, ds - 20230101) AS stats,
               retention_sum(prior) AS rs
        FROM slt_mixed
        """,
    ).collect()
    assert to_py(got[0]["stats"]) == [[1], [1]]
    assert to_py(got[0]["rs"]) == [[2, 1], [1, 1], [0]]


def test_sum_probe_ignores_trailing_order_by_limit(spark):
    # r9 advice (low): the probe used to run through the full statement
    # INCLUDING its LIMIT, so a group beyond the cutoff with a wider
    # stats array was silently truncated to the probed (smaller) m. The
    # probe now strips the trailing ORDER BY / LIMIT, so m is the width
    # over ALL groups.
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW slt_ragged AS
        SELECT * FROM VALUES
          (1, array(array(1Y), array(1Y))),
          (2, array(array(1Y, 1Y), array(1Y, 2Y)))
        AS t(g, stats)
        """
    )
    stmt = """
        SELECT g, retention_sum(stats) AS r FROM slt_ragged
        GROUP BY g ORDER BY g LIMIT 1
        """
    expanded = expand_macros(stmt, spark)
    # probed width is 2 (group g=2's width, beyond the LIMIT) — the
    # expansion indexes cell [0][1], which an un-stripped probe (m=1)
    # would never emit; the final statement keeps its ORDER BY/LIMIT
    assert "[0][1]" in expanded
    assert "LIMIT 1" in expanded
    # ragged widths then fail LOUDLY at execution (ANSI array indexing)
    # instead of silently truncating group g=1's matrix to width 1
    from pyspark.errors import ArrayIndexOutOfBoundsException

    with pytest.raises(ArrayIndexOutOfBoundsException):
        spark.sql(expanded).collect()


def test_sum_probe_limit_uniform_width_ok(spark):
    # the legitimate shape: uniform widths + GROUP BY + LIMIT runs fine
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW slt_uniform AS
        SELECT * FROM VALUES
          (1, array(array(1Y, 1Y), array(1Y, 0Y))),
          (2, array(array(1Y, 0Y), array(0Y, 2Y)))
        AS t(g, stats)
        """
    )
    got = sql(
        spark,
        """
        SELECT g, retention_sum(stats) AS r FROM slt_uniform
        GROUP BY g ORDER BY g LIMIT 1
        """,
    ).collect()
    assert len(got) == 1 and got[0]["g"] == 1
    assert to_py(got[0]["r"]) == [[1, 1], [1, 0], [0]]


def test_strip_trailing_order_limit_unit():
    from datafusion_uba_spark.plans.sql_macro import (
        _strip_trailing_order_limit as strip,
    )

    # outer ORDER BY ... LIMIT stripped at the ORDER keyword
    assert strip("SELECT a FROM t ORDER BY a LIMIT 3", 8) == "SELECT a FROM t "
    # bare LIMIT stripped
    assert strip("SELECT a FROM t LIMIT 3", 8) == "SELECT a FROM t "
    # ORDER BY inside OVER(...) is depth > 0: untouched
    s = "SELECT rank() OVER (ORDER BY a) FROM t"
    assert strip(s, 0) == s
    # ORDER BY inside a subquery is depth > 0: untouched
    s = "SELECT * FROM (SELECT a FROM t ORDER BY a LIMIT 2) q"
    assert strip(s, 0) == s
    # quoted identifiers containing the keyword are not clause starts
    s = "SELECT `limit` FROM t"
    assert strip(s, 0) == s
    # keyword as a suffix of an identifier is not a clause start
    s = "SELECT no_limit FROM t"
    assert strip(s, 0) == s
    # clause before the last substitution end (floor): unchanged
    s = "SELECT a FROM t ORDER BY b"
    assert strip(s, len(s)) == s


def test_strip_trailing_order_limit_comment_blind():
    # r10 review finding: comments must not defeat the strip (an
    # apostrophe in a -- comment flipped the string state) nor become
    # clause starts themselves
    from datafusion_uba_spark.plans.sql_macro import (
        _strip_trailing_order_limit as strip,
    )

    s = "SELECT a FROM t -- user's note\nORDER BY a LIMIT 1"
    assert strip(s, 8) == "SELECT a FROM t -- user's note\n"
    s = "SELECT a /* order matters */ FROM t WHERE x = 1"
    assert strip(s, 0) == s
    s = "SELECT a FROM t /* note */ LIMIT 2"
    assert strip(s, 8) == "SELECT a FROM t /* note */ "
    # unterminated block comment: leave the text untouched
    s = "SELECT a FROM t /* oops LIMIT 2"
    assert strip(s, 0) == s


def test_strip_trailing_order_limit_backslash_escape():
    # r10 advice: a backslash-escaped quote ('it\'s') must not end the
    # string literal — otherwise the scanner desynchronizes and a
    # trailing LIMIT survives into the probe (silent width truncation)
    from datafusion_uba_spark.plans.sql_macro import (
        _strip_trailing_order_limit as strip,
    )

    s = "SELECT a FROM t WHERE x = 'it\\'s' LIMIT 3"
    assert strip(s, 8) == "SELECT a FROM t WHERE x = 'it\\'s' "
    # keyword INSIDE the escaped literal is not a clause start
    s = "SELECT a FROM t WHERE x = 'don\\'t LIMIT me'"
    assert strip(s, 8) == s
    # double-quoted variant
    s = 'SELECT a FROM t WHERE x = "say \\" ORDER" LIMIT 1'
    assert strip(s, 8) == 'SELECT a FROM t WHERE x = "say \\" ORDER" '
    # backslash inside backticks is literal, not an escape
    s = "SELECT `a\\` FROM t LIMIT 2"
    assert strip(s, 8) == "SELECT `a\\` FROM t "


def test_split_args_backslash_escape():
    from datafusion_uba_spark.plans.sql_macro import _split_args

    assert _split_args("'it\\'s, not', x") == ["'it\\'s, not'", "x"]


def test_slt_runner_probes_standalone_sum(spark):
    # r10 review finding: the slt engine must pass its session so a
    # standalone retention_sum in a script probes instead of raising
    from datafusion_uba_spark.slt.runner import SparkEngine

    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW slt_probe_stats AS
        SELECT * FROM VALUES
          (1, array(array(1Y, 1Y), array(1Y, 0Y)))
        AS t(distinct_id, stats)
        """
    )
    eng = SparkEngine(spark)
    rows, _types = eng.query(
        "SELECT retention_sum(stats) AS r FROM slt_probe_stats"
    )
    assert len(rows) == 1
