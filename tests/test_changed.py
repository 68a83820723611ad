"""Git-derived changed-row attestation (r14 verdict #2).

The derivation maps diff hunks to top-level symbols, propagates
dirtiness through the symbol-level use/import graph, and returns the
registry rows whose query fn or oracle SQL is affected. These tests
plant synthetic diffs (injected hunks — no git mutation) and assert
the derived set, plus the end-to-end guarantee: derived rows jump the
driver-verification queue.
"""

from __future__ import annotations

from pathlib import Path

from datafusion_uba_spark.changed import (
    build_package_index,
    derive_changed_rows,
    dirty_symbols,
    parse_diff_hunks,
)
from datafusion_uba_spark.queries import REGISTRY

REPO = Path(__file__).resolve().parents[1]
PKG_ROOT = REPO / "datafusion_uba_spark"


def _span(module_rel: str, symbol: str) -> tuple[int, int]:
    index = build_package_index(PKG_ROOT)
    mod = "datafusion_uba_spark." + module_rel.replace("/", ".").removesuffix(".py")
    return index[mod].spans[symbol]


def _hunk_over(module_rel: str, symbol: str) -> dict[str, list[tuple[int, int]]]:
    lo, _hi = _span(module_rel, symbol)
    path = f"datafusion_uba_spark/{module_rel}"
    return {path: [(lo, lo)]}  # one-line touch inside the symbol


def test_parse_diff_hunks():
    diff = """\
diff --git a/datafusion_uba_spark/queries.py b/datafusion_uba_spark/queries.py
index 111..222 100644
--- a/datafusion_uba_spark/queries.py
+++ b/datafusion_uba_spark/queries.py
@@ -10,2 +12,3 @@ def f():
+x
+y
+z
@@ -50 +60,0 @@ def g():
-gone
diff --git a/tools/x.py b/tools/x.py
--- a/tools/x.py
+++ b/tools/x.py
@@ -1 +1 @@
+q
"""
    hunks = parse_diff_hunks(diff)
    assert hunks["datafusion_uba_spark/queries.py"] == [(12, 14), (60, 60)]
    assert hunks["tools/x.py"] == [(1, 1)]


def test_direct_fn_edit_derives_its_rows():
    """A hunk inside a query function's body derives exactly the rows
    registered under that function (including aliases)."""
    hunks = _hunk_over("queries.py", "q_returned_items")
    derived = derive_changed_rows(REPO, REGISTRY, hunks=hunks, current_round=99)
    assert derived.get("returned_items") == 99
    assert derived.get("tpch_q10") == 99  # alias of the same fn
    # an unrelated relational row must NOT be swept in
    assert "pricing_summary" not in derived


def test_operator_edit_propagates_cross_module():
    """Editing an operator symbol dirties the query fns that import it
    — but NOT every row in the importing module (symbol granularity,
    not module granularity: module-level flooding would starve the
    50-slot capture window)."""
    hunks = _hunk_over("operators/retention.py", "retention_count")
    derived = derive_changed_rows(REPO, REGISTRY, hunks=hunks, current_round=7)
    assert derived.get("retention_count") == 7
    # retention_sum's query fn consumes _stats_df -> retention_count too
    assert derived.get("retention_sum") == 7
    # queries.py defines ~50 rows; the sweep must stay targeted
    assert len(derived) < 15
    assert "pricing_summary" not in derived
    assert "tpch_q6" not in derived


def test_same_module_helper_propagates():
    """Editing a private helper inside an operator module dirties the
    public operators that call it, transitively out to registry rows."""
    index = build_package_index(PKG_ROOT)
    mod = "datafusion_uba_spark.operators.retention"
    helpers = [
        s
        for s in index[mod].spans
        if s.startswith("_") and any(s in u for u in index[mod].uses.values())
    ]
    assert helpers, "expected at least one private helper in retention.py"
    hunks = _hunk_over("operators/retention.py", helpers[0])
    dirty = dirty_symbols(index, hunks, PKG_ROOT)
    # the helper itself is dirty, and at least one public symbol follows
    assert (mod, helpers[0]) in dirty
    assert any(m == mod and not s.startswith("_") for m, s in dirty)


def test_function_local_from_import_propagates():
    """Operator modules are mostly imported INSIDE query fns (the
    dominant style in queries_llm.py: `from ...similarity import
    quantize` at function scope). The r15 advisor flagged that only
    tree.body imports were indexed, so editing those operator modules
    propagated to NO rows — the silent recreation of the
    forgot-to-list failure mode. A hunk over similarity.quantize must
    derive the rows whose fns bind it locally."""
    hunks = _hunk_over("operators/similarity.py", "quantize")
    derived = derive_changed_rows(REPO, REGISTRY, hunks=hunks, current_round=11)
    assert derived.get("doc_embedding_enrich") == 11
    # and must stay symbol-targeted, not module-flooded
    assert "pricing_summary" not in derived


def test_function_local_module_import_attr_propagates():
    """`from ...operators import pq` inside q_ann_topk_pq is a
    module binding; pq.pq_topk attribute uses must propagate too."""
    hunks = _hunk_over("operators/pq.py", "pq_topk")
    derived = derive_changed_rows(REPO, REGISTRY, hunks=hunks, current_round=12)
    assert derived.get("ann_topk_pq") == 12


def test_init_relative_import_resolution(tmp_path):
    """pkg/sub/__init__.py's `from . import x` must resolve to
    pkg.sub.x, not pkg.x — _module_name already dropped '__init__', so
    the resolver strips (level - 1) components there (r15 advisor)."""
    pkg = tmp_path / "datafusion_uba_spark"
    sub = pkg / "sub"
    sub.mkdir(parents=True)
    (pkg / "__init__.py").write_text("")
    (sub / "x.py").write_text("def inner():\n    return 1\n")
    (sub / "__init__.py").write_text(
        "from .x import inner\n\n\ndef outer():\n    return inner()\n"
    )
    (pkg / "m.py").write_text(
        "from .sub import outer\n\n\ndef top():\n    return outer()\n"
    )
    index = build_package_index(pkg)
    assert index["datafusion_uba_spark.sub"].import_symbol["inner"] == (
        "datafusion_uba_spark.sub.x",
        "inner",
    )
    # and from a plain MODULE file, level 1 still strips one component
    assert index["datafusion_uba_spark.m"].import_symbol["outer"] == (
        "datafusion_uba_spark.sub",
        "outer",
    )
    # end-to-end: dirtying sub/x.py:inner reaches m.py:top
    dirty = dirty_symbols(
        index, {"datafusion_uba_spark/sub/x.py": [(1, 1)]}, pkg
    )
    assert ("datafusion_uba_spark.m", "top") in dirty


def test_oracle_constant_edit_derives_row():
    """A hunk over an oracle-SQL constant derives its row, including
    f-string composition (_ORACLE_PER_DAY feeds both retention
    oracles)."""
    hunks = _hunk_over("queries.py", "_ORACLE_PER_DAY")
    derived = derive_changed_rows(REPO, REGISTRY, hunks=hunks, current_round=42)
    assert derived.get("retention_count") == 42
    assert derived.get("retention_sum") == 42


def test_non_package_hunks_ignored():
    derived = derive_changed_rows(
        REPO, REGISTRY, hunks={"tools/scale_check.py": [(1, 500)]}, current_round=9
    )
    assert derived == {}


def test_derived_rows_jump_the_queue(monkeypatch):
    """End-to-end: a synthetic diff's derived rows, fed through
    CHANGED_THIS_ROUND, lead the registry order ahead of the staleness
    backlog — the driver's 50-row capture attests them same-round."""
    import datafusion_uba_spark.queries as q

    hunks = _hunk_over("queries.py", "q_returned_items")
    derived = derive_changed_rows(REPO, REGISTRY, hunks=hunks, current_round=10**6)
    assert derived
    monkeypatch.setattr(q, "CHANGED_THIS_ROUND", derived)
    order = q._verification_order(q.REGISTRY)
    assert set(order[: len(derived)]) == set(derived)


def test_live_derivation_matches_git_state():
    """The import-time CHANGED_THIS_ROUND must be exactly the override
    dict merged over the git-derived set (no stale hand entries)."""
    import datafusion_uba_spark.queries as q

    derived = derive_changed_rows(REPO, REGISTRY)
    assert q.CHANGED_THIS_ROUND == {**derived, **q.CHANGED_OVERRIDES}


def test_git_path_end_to_end(tmp_path):
    """The real git plumbing (round-boundary commit lookup + diff
    parsing), exercised against a throwaway repo: a mini package with
    a query fn calling a helper, a CORRECTNESS_r03 artifact committed
    as the round boundary, then a working-tree edit to the HELPER —
    derive_changed_rows must find the boundary commit, diff against
    the worktree, and propagate helper -> fn -> row at round 4. This
    path silently degrades to {} in production, so only a test like
    this catches it breaking."""
    import subprocess

    pkg = tmp_path / "datafusion_uba_spark"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    mini = pkg / "mini.py"
    mini.write_text(
        "def helper(x):\n"
        "    return x + 1\n"
        "\n"
        "\n"
        "def my_query(df):\n"
        "    return helper(df)\n"
    )
    (tmp_path / "CORRECTNESS_r03.json").write_text('{"row": {}}')

    def git(*args):
        subprocess.run(
            ["git", "-c", "user.email=t@t", "-c", "user.name=t", *args],
            cwd=tmp_path,
            check=True,
            capture_output=True,
        )

    git("init", "-q")
    git("add", "-A")
    git("commit", "-q", "-m", "round 3")

    def fn(df):
        return df

    fn.__module__ = "datafusion_uba_spark.mini"
    fn.__name__ = "my_query"
    registry = {"row": (fn, None), "other": (fn2 := (lambda d: d), None)}
    fn2.__module__ = "datafusion_uba_spark.mini"
    fn2.__name__ = "no_such_fn"

    # clean worktree -> nothing derived
    assert derive_changed_rows(tmp_path, registry) == {}

    # edit the HELPER only (uncommitted, like mid-round work)
    mini.write_text(mini.read_text().replace("x + 1", "x + 2"))
    derived = derive_changed_rows(tmp_path, registry)
    assert derived == {"row": 4}

    # UNTRACKED newer artifact (the driver writes CORRECTNESS_r04 at
    # round end, before the builder commits it): the boundary must fall
    # back to the newest COMMITTED artifact's commit instead of
    # silently deriving {} (r15 advisor) — same edit, now round 5
    (tmp_path / "CORRECTNESS_r04.json").write_text('{"row": {}}')
    derived = derive_changed_rows(tmp_path, registry)
    assert derived == {"row": 5}


def test_registry_literal_edit_derives_row():
    """Remapping an existing registry entry touches only the dict
    literal (no fn/oracle symbol), so the changed LINES are scanned for
    quoted registry keys: a hunk over the '"sessionize": (...)' line
    must boost the sessionize row."""
    import re as _re

    qpath = PKG_ROOT / "queries_uba.py"
    target = None
    for i, ln in enumerate(qpath.read_text().splitlines(), start=1):
        if _re.search(r'"sessionize"\s*:', ln):
            target = i
            break
    assert target, "expected sessionize registry line in queries_uba.py"
    derived = derive_changed_rows(
        REPO,
        REGISTRY,
        hunks={"datafusion_uba_spark/queries_uba.py": [(target, target)]},
        current_round=77,
    )
    assert derived.get("sessionize") == 77
