"""Git-derived changed-row attestation.

The registry's driver-verification queue boosts rows whose behavior
changed this round so the next 50-row correctness capture attests the
change (see ``queries.CHANGED_THIS_ROUND``). Through r14 that set was
a hand-maintained dict — the attestation was only as good as the
builder remembering to list a changed row. This module DERIVES it:

1. The round boundary is the commit that last touched the newest
   ``CORRECTNESS_r*.json`` (the driver writes one per round, at round
   end). Everything in ``git diff -U0 <that commit>`` against the
   working tree is this round's work.
2. Diff hunks are mapped to *top-level symbols* (functions, classes,
   module constants) via each module's AST span, then propagated
   through a symbol-level use/import graph to a fixed point: a symbol
   is dirty if its own lines changed, or if it uses a dirty symbol —
   same-module helpers, ``from pkg.mod import name`` bindings, and
   ``mod.attr`` attribute uses through whole-module imports all
   propagate. So editing ``operators/dedup.py:_shingle`` dirties
   ``dedup.minhash_lsh`` and, through it, every registry row whose
   query function calls it — and nothing else (module-level
   granularity would flood the 50-slot capture window: a one-line
   dedup fix would boost all ~75 queries_llm rows and starve the
   staleness backlog).
3. A registry row is changed iff its query function's symbol is dirty
   or its oracle-SQL constant's symbol is dirty (oracle constants are
   matched by object identity against module globals, so f-string
   composition like ``_ORACLE_RETENTION_STATS`` building on
   ``_ORACLE_PER_DAY`` propagates through the AST Name load).

Everything degrades to the empty set on any failure (no git, shallow
clone, torn artifacts): the derivation only ever *adds* boost, and the
hand dict (``queries.CHANGED_OVERRIDES``) remains as an override for
cross-round gaps git can't see (e.g. a semantic change whose capture
the driver skipped in a previous round).
"""

from __future__ import annotations

import ast
import json
import re
import subprocess
import sys
from pathlib import Path

PKG = "datafusion_uba_spark"

# ---------------------------------------------------------------------------
# round boundary + git hunks
# ---------------------------------------------------------------------------


def latest_captured_round(repo_root: Path) -> int:
    """Newest round number with a driver CORRECTNESS artifact (0 if none)."""
    best = 0
    for art in repo_root.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", art.stem)
        if m:
            best = max(best, int(m.group(1)))
    return best


def _round_boundary_commit(repo_root: Path, rnd: int) -> str | None:
    """Commit that last touched round ``rnd``'s CORRECTNESS artifact."""
    arts = sorted(repo_root.glob(f"CORRECTNESS_r*{rnd}.json"))
    arts = [a for a in arts if re.fullmatch(rf"CORRECTNESS_r0*{rnd}", a.stem)]
    if not arts:
        return None
    out = subprocess.run(
        ["git", "log", "-1", "--format=%H", "--", arts[-1].name],
        cwd=repo_root,
        capture_output=True,
        text=True,
        timeout=30,
    )
    sha = out.stdout.strip()
    return sha or None


def _latest_boundary(repo_root: Path) -> tuple[int, str] | None:
    """(round, commit) of the newest CORRECTNESS artifact that IS
    committed. The newest file on disk may be untracked mid-round (the
    driver writes it before the builder commits it); keying the
    boundary off that file alone would yield no commit and silently
    disable the whole attestation boost (r15 advisor) — so walk rounds
    downward until git knows one."""
    for rnd in range(latest_captured_round(repo_root), 0, -1):
        sha = _round_boundary_commit(repo_root, rnd)
        if sha:
            return rnd, sha
    return None


def parse_diff_hunks(diff_text: str) -> dict[str, list[tuple[int, int]]]:
    """``git diff -U0`` text -> {new-side path: [(start, end)] 1-based}."""
    hunks: dict[str, list[tuple[int, int]]] = {}
    path: str | None = None
    for line in diff_text.splitlines():
        if line.startswith("+++ "):
            p = line[4:].strip()
            path = None if p == "/dev/null" else p.removeprefix("b/")
        elif line.startswith("@@") and path is not None:
            m = re.search(r"\+(\d+)(?:,(\d+))?", line)
            if not m:
                continue
            start = int(m.group(1))
            count = int(m.group(2)) if m.group(2) is not None else 1
            if count == 0:
                # pure deletion: the surrounding line still "changed"
                hunks.setdefault(path, []).append((max(start, 1), max(start, 1)))
            else:
                hunks.setdefault(path, []).append((start, start + count - 1))
    return hunks


def git_hunks_since_round(repo_root: Path, rnd: int) -> dict[str, list[tuple[int, int]]]:
    """Diff hunks (committed + working tree) since round ``rnd``'s boundary.

    Falls back to the newest COMMITTED artifact when round ``rnd``'s own
    artifact is untracked (see ``_latest_boundary``) — the diff window
    just widens to span the uncommitted artifact's round too, which only
    ever ADDS boost."""
    base = _round_boundary_commit(repo_root, rnd)
    if base is None:
        bound = _latest_boundary(repo_root)
        if bound is None:
            return {}
        base = bound[1]
    out = subprocess.run(
        ["git", "diff", "-U0", base, "--", PKG],
        cwd=repo_root,
        capture_output=True,
        text=True,
        timeout=60,
    )
    if out.returncode != 0:
        return {}
    return parse_diff_hunks(out.stdout)


# ---------------------------------------------------------------------------
# package symbol index
# ---------------------------------------------------------------------------


class _ModuleIndex:
    __slots__ = ("spans", "uses", "attr_uses", "import_symbol", "import_module")

    def __init__(self) -> None:
        self.spans: dict[str, tuple[int, int]] = {}  # symbol -> (lo, hi)
        self.uses: dict[str, set[str]] = {}  # symbol -> local names loaded
        self.attr_uses: dict[str, set[tuple[str, str]]] = {}  # symbol -> {(local, attr)}
        self.import_symbol: dict[str, tuple[str, str]] = {}  # local -> (module, name)
        self.import_module: dict[str, str] = {}  # local -> module


def _module_name(pkg_root: Path, py_file: Path) -> str:
    rel = py_file.relative_to(pkg_root.parent)
    parts = list(rel.with_suffix("").parts)
    if parts[-1] == "__init__":
        parts = parts[:-1]
    return ".".join(parts)


def _is_submodule(pkg_root: Path, module: str, name: str) -> bool:
    base = pkg_root.parent / Path(*module.split("."))
    return (base / f"{name}.py").is_file() or (base / name / "__init__.py").is_file()


def _symbol_targets(node: ast.stmt) -> list[str]:
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        return [node.name]
    if isinstance(node, ast.Assign):
        return [t.id for t in node.targets if isinstance(t, ast.Name)]
    if isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
        return [node.target.id]
    return []


def _collect_loads(node: ast.AST) -> tuple[set[str], set[tuple[str, str]]]:
    names: set[str] = set()
    attrs: set[tuple[str, str]] = set()
    for sub in ast.walk(node):
        if isinstance(sub, ast.Name) and isinstance(sub.ctx, ast.Load):
            names.add(sub.id)
        elif isinstance(sub, ast.Attribute) and isinstance(sub.value, ast.Name):
            attrs.add((sub.value.id, sub.attr))
    return names, attrs


def _record_imports(
    mi: _ModuleIndex,
    node: ast.stmt,
    mod: str,
    is_init: bool,
    pkg_root: Path,
) -> bool:
    """Record an Import/ImportFrom's bindings into ``mi``; returns
    whether the node was an import statement at all."""
    if isinstance(node, ast.Import):
        for alias in node.names:
            if alias.name.startswith(PKG):
                mi.import_module[alias.asname or alias.name.split(".")[0]] = (
                    alias.name
                )
        return True
    if isinstance(node, ast.ImportFrom):
        src = node.module or ""
        if node.level:  # relative import -> absolute
            base = mod.split(".")
            # From a module file, level 1 = its containing package, so
            # strip `level` trailing components. From a package
            # __init__.py the module name ALREADY denotes the package
            # (_module_name drops '__init__'), so level 1 resolves to
            # the package itself — strip one component fewer (r15
            # advisor: pkg/sub/__init__.py level-1 was resolving to
            # pkg.x instead of pkg.sub.x).
            strip = node.level - 1 if is_init else node.level
            base = base[: len(base) - strip] if strip else base
            src = ".".join(base + ([src] if src else []))
        if not src.startswith(PKG):
            return True
        for alias in node.names:
            if alias.name == "*":
                # star import: bind a wildcard marker
                mi.import_symbol[f"*{src}"] = (src, "*")
                continue
            local = alias.asname or alias.name
            if _is_submodule(pkg_root, src, alias.name):
                mi.import_module[local] = f"{src}.{alias.name}"
            else:
                mi.import_symbol[local] = (src, alias.name)
        return True
    return False


def build_package_index(pkg_root: Path) -> dict[str, _ModuleIndex]:
    """AST index of every module in the package: top-level symbol spans,
    per-symbol name/attribute loads, and import bindings.

    Import bindings are collected from module top level AND from inside
    each top-level symbol's body (the dominant style in the query
    modules is function-local `from .operators import similarity`; the
    r15 advisor flagged that skipping those made edits to such operator
    modules propagate to NO rows). Local bindings are merged into the
    one module-level index: a local name shadowing a different symbol
    elsewhere in the module can only OVER-propagate (a harmless extra
    boost), never miss one."""
    index: dict[str, _ModuleIndex] = {}
    for py_file in sorted(pkg_root.rglob("*.py")):
        try:
            tree = ast.parse(py_file.read_text())
        except SyntaxError:
            continue
        mod = _module_name(pkg_root, py_file)
        is_init = py_file.name == "__init__.py"
        mi = _ModuleIndex()
        for node in tree.body:
            if _record_imports(mi, node, mod, is_init, pkg_root):
                continue
            targets = _symbol_targets(node)
            if targets:
                # function-local / method-local imports inside this
                # symbol's body bind names the symbol then loads
                for sub in ast.walk(node):
                    if isinstance(sub, (ast.Import, ast.ImportFrom)):
                        _record_imports(mi, sub, mod, is_init, pkg_root)
            if not targets:
                continue
            lo = min(
                [node.lineno]
                + [d.lineno for d in getattr(node, "decorator_list", [])]
            )
            hi = node.end_lineno or node.lineno
            names, attrs = _collect_loads(node)
            for t in targets:
                # a symbol reassigned later keeps the widest span union
                if t in mi.spans:
                    plo, phi = mi.spans[t]
                    mi.spans[t] = (min(plo, lo), max(phi, hi))
                    mi.uses[t] |= names
                    mi.attr_uses[t] |= attrs
                else:
                    mi.spans[t] = (lo, hi)
                    mi.uses[t] = set(names)
                    mi.attr_uses[t] = set(attrs)
        index[mod] = mi
    return index


# ---------------------------------------------------------------------------
# dirty-symbol fixed point
# ---------------------------------------------------------------------------


def _overlaps(span: tuple[int, int], ranges: list[tuple[int, int]]) -> bool:
    lo, hi = span
    return any(not (hi < a or lo > b) for a, b in ranges)


def dirty_symbols(
    index: dict[str, _ModuleIndex],
    hunks: dict[str, list[tuple[int, int]]],
    pkg_root: Path,
) -> set[tuple[str, str]]:
    """Fixed point of (module, symbol) pairs whose behavior may have
    changed, seeded by diff-hunk overlap and propagated through uses."""
    file_of = {
        _module_name(pkg_root, f): str(f.relative_to(pkg_root.parent))
        for f in pkg_root.rglob("*.py")
    }
    dirty: set[tuple[str, str]] = set()
    for mod, mi in index.items():
        ranges = hunks.get(file_of.get(mod, ""), [])
        if not ranges:
            continue
        for sym, span in mi.spans.items():
            if _overlaps(span, ranges):
                dirty.add((mod, sym))

    changed = True
    while changed:
        changed = False
        for mod, mi in index.items():
            star_sources = [
                src for local, (src, n) in mi.import_symbol.items() if n == "*"
            ]
            for sym in mi.spans:
                if (mod, sym) in dirty:
                    continue
                hit = False
                for used in mi.uses[sym]:
                    if used in mi.spans and (mod, used) in dirty:
                        hit = True
                        break
                    bind = mi.import_symbol.get(used)
                    if bind and bind[1] != "*" and (bind[0], bind[1]) in dirty:
                        hit = True
                        break
                    # star imports: any dirty symbol of that name in source
                    if any((src, used) in dirty for src in star_sources):
                        hit = True
                        break
                if not hit:
                    for local, attr in mi.attr_uses[sym]:
                        target = mi.import_module.get(local)
                        if target and (target, attr) in dirty:
                            hit = True
                            break
                if hit:
                    dirty.add((mod, sym))
                    changed = True
    return dirty


# ---------------------------------------------------------------------------
# registry mapping
# ---------------------------------------------------------------------------


def _oracle_symbol(sql: str, modules: list[str]) -> tuple[str, str] | None:
    """(module, symbol) whose runtime value IS this oracle string."""
    for mod in modules:
        m = sys.modules.get(mod)
        if m is None:
            continue
        for attr, val in vars(m).items():
            if val is sql:
                return (mod, attr)
    return None


def derive_changed_rows(
    repo_root: Path,
    registry: dict,
    *,
    hunks: dict[str, list[tuple[int, int]]] | None = None,
    current_round: int | None = None,
) -> dict[str, int]:
    """Registry rows whose query fn or oracle SQL changed this round,
    mapped to the current round number (= latest captured round + 1).

    ``hunks`` is injectable for tests; by default it is the git diff
    from the newest CORRECTNESS artifact's commit to the working tree.
    Returns {} on any failure — derivation only ever adds boost.
    """
    try:
        last = latest_captured_round(repo_root)
        rnd = current_round if current_round is not None else last + 1
        if hunks is None:
            # cheap pre-check before shelling out: a non-checkout
            # install (pip sdist, exported tree) has no .git — don't
            # pay two failed subprocess spawns per import (r15 advisor)
            if last == 0 or not (repo_root / ".git").exists():
                return {}
            hunks = git_hunks_since_round(repo_root, last)
        hunks = {p: r for p, r in hunks.items() if p.startswith(PKG)}
        if not hunks:
            return {}
        pkg_root = repo_root / PKG
        index = build_package_index(pkg_root)
        dirty = dirty_symbols(index, hunks, pkg_root)
        if not dirty:
            return {}
        query_modules = sorted({fn.__module__ for fn, _ in registry.values()})
        out: dict[str, int] = {}
        for name, (fn, sql) in registry.items():
            if (fn.__module__, fn.__name__) in dirty:
                out[name] = rnd
                continue
            if sql is not None:
                osym = _oracle_symbol(sql, [fn.__module__] + query_modules)
                if osym is not None and osym in dirty:
                    out[name] = rnd
        # registry-literal edits: remapping an existing row to a
        # different fn/oracle touches only the dict literal, whose
        # symbol ("REGISTRY" etc.) maps to no row — so additionally
        # scan the changed LINES themselves for quoted registry keys
        # ("name": entries). Over-matching an unrelated dict key that
        # happens to equal a row name just boosts one row — harmless.
        key_re = re.compile(r'"([A-Za-z0-9_]+)"\s*:')
        for path, ranges in hunks.items():
            try:
                lines = (repo_root / path).read_text().splitlines()
            except OSError:
                continue
            for lo, hi in ranges:
                for ln in lines[max(lo - 1, 0) : hi]:
                    for m in key_re.finditer(ln):
                        if m.group(1) in registry:
                            out.setdefault(m.group(1), rnd)
        return out
    except Exception:  # pragma: no cover - degradation guard
        return {}


def _read_artifact_rows(repo_root: Path) -> dict[str, int]:  # pragma: no cover
    """Debug helper: name -> last captured round (mirrors queries.py)."""
    last: dict[str, int] = {}
    for art in sorted(repo_root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", art.stem)
        if not m:
            continue
        try:
            rows = json.loads(art.read_text())
        except (OSError, ValueError):
            continue
        if isinstance(rows, dict):
            for n in rows:
                last[n] = max(last.get(n, -1), int(m.group(1)))
    return last
