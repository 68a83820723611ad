"""sqllogictest runner for the Spark engine.

Re-creates the reference's conformance loop (SURVEY §3.3): parse
``.slt`` files, execute statements/queries against a SparkSession (with
the retention macro layer applied), normalize results, compare against
expected blocks — or splice regenerated result blocks into the original
text in ``complete`` mode (comments, blank-line structure, and ``halt``
directives are preserved verbatim).

Normalization follows the reference's rules
(tests/sqllogictests/src/engines/conversion.rs:23-86,
normalize.rs:30-112): NULL → "NULL", empty string → "(empty)", booleans
lowercase, floats and decimals rounded to 12 decimal places then
trailing-zero stripped, NaN/Infinity/-Infinity spelled out, trailing
newlines trimmed from varchar, nested arrays rendered Arrow-style
``[1, 2]``, and multi-line final cells expanded to one row per line
with leading spaces rewritten to ``-`` (normalize.rs:80-112).

Sort modes: ``nosort``, ``rowsort`` (sort result lines), ``valuesort``
(sort every individual value ignoring row/column grouping — values
containing spaces are not round-trippable under valuesort, matching the
upstream format's limitation).

Statement dialect shims: ``CREATE TABLE t (cols) AS VALUES …`` (slt DDL,
retention.slt:5-9) is rewritten to a Spark temporary view; the column
list is parsed with balanced parentheses so types like DECIMAL(10,2)
survive.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import SparkSession

from datafusion_uba_spark.plans.sql_macro import _split_args, expand_macros

# --- value normalization ----------------------------------------------------


def _round12(d: Decimal) -> str:
    q = d.quantize(Decimal("1e-12"), rounding=ROUND_HALF_UP)
    return format(q.normalize(), "f")


def _norm_float(v: float) -> str:
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    return _round12(Decimal(repr(v)))


# Workspace-path normalization (normalize.rs:125-133): result cells
# containing the engine's checkout/data root (EXPLAIN output file
# paths, mostly) are rewritten to the literal WORKSPACE_ROOT so slt
# files are machine-independent. Ours is the repo root; override via
# set_workspace_root for corpora recorded elsewhere.
import os as _os

WORKSPACE_ROOT = _os.path.dirname(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)


def set_workspace_root(path: str) -> None:
    global WORKSPACE_ROOT
    WORKSPACE_ROOT = path.rstrip("/")


def _norm_paths(s: str) -> str:
    return s.replace(WORKSPACE_ROOT, "WORKSPACE_ROOT") if WORKSPACE_ROOT else s


def norm_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return _norm_float(v)
    if isinstance(v, Decimal):
        # Decimal(p,s) values render at declared scale, then round(12)
        # + normalize like the reference (conversion.rs:77-86)
        return _round12(v)
    if isinstance(v, str):
        return _norm_paths(v.rstrip("\n")) if v else "(empty)"
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(norm_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _expand_row(row: list[str]) -> list[list[str]]:
    """Reference normalize.rs:80-112: a multi-line LAST cell becomes one
    row per line, leading spaces rewritten to '-' (sqllogictest ignores
    whitespace differences)."""
    if not row or "\n" not in row[-1]:
        return [row]
    head, cell = list(row[:-1]), row[-1]
    out = [head]
    for line in cell.split("\n"):
        content = line.lstrip(" ")
        out.append(["-" * (len(line) - len(content)) + content])
    return out


_TYPE_CODES = {
    "boolean": "B",
    "tinyint": "I",
    "smallint": "I",
    "int": "I",
    "bigint": "I",
    "float": "R",
    "double": "R",
    "string": "T",
    "date": "D",
    "timestamp": "P",
    "timestamp_ntz": "P",
}


def type_code(dtype: str) -> str:
    if dtype.startswith("decimal"):
        return "R"
    return _TYPE_CODES.get(dtype, "?")


# --- file parsing -------------------------------------------------------------


@dataclass
class Record:
    kind: str  # "statement" | "query"
    sql: str
    line: int
    expect_error: bool = False
    types: str = ""
    sort: str = "nosort"
    expected: list[str] = field(default_factory=list)
    # [start, end) line indices of the expected block (complete mode)
    exp_span: tuple[int, int] | None = None


def parse_slt(text: str) -> list[Record]:
    lines = text.splitlines()
    records: list[Record] = []
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        if line.startswith("statement"):
            expect_error = "error" in line
            i += 1
            sql_lines = []
            while i < len(lines) and lines[i].strip() and not lines[i].startswith("#"):
                sql_lines.append(lines[i])
                i += 1
            records.append(
                Record("statement", "\n".join(sql_lines), i, expect_error=expect_error)
            )
        elif line.startswith("query"):
            parts = line.split()
            types = parts[1] if len(parts) > 1 else ""
            sort = parts[2] if len(parts) > 2 else "nosort"
            i += 1
            sql_lines = []
            while i < len(lines) and lines[i].strip() != "----":
                sql_lines.append(lines[i])
                i += 1
            i += 1  # skip ----
            exp_start = i
            expected = []
            while i < len(lines) and lines[i].strip():
                expected.append(lines[i].rstrip())
                i += 1
            records.append(
                Record(
                    "query",
                    "\n".join(sql_lines),
                    i,
                    types=types,
                    sort=sort,
                    expected=expected,
                    exp_span=(exp_start, i),
                )
            )
        elif line in ("halt",):
            break
        else:
            i += 1
    return records


# --- statement dialect shims --------------------------------------------------

_CREATE_HEAD = re.compile(r"^\s*CREATE\s+TABLE\s+(\w+)\s*\(", re.IGNORECASE)
_AS_VALUES = re.compile(r"^\s*AS\s*(VALUES.*)$", re.IGNORECASE | re.DOTALL)


def rewrite_statement(sql_text: str) -> str:
    m = _CREATE_HEAD.match(sql_text)
    if not m:
        return sql_text
    # balanced-paren scan so DECIMAL(10,2)-style column types survive
    depth, i = 1, m.end()
    in_str: str | None = None
    while i < len(sql_text) and depth > 0:
        c = sql_text[i]
        if in_str:
            if c == in_str:
                in_str = None
        elif c in ("'", '"'):
            in_str = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        i += 1
    if depth != 0:
        return sql_text
    m2 = _AS_VALUES.match(sql_text[i:])
    if not m2:
        return sql_text
    name, values = m.group(1), m2.group(1)
    cols = _split_args(sql_text[m.end() : i - 1])
    col_names = ", ".join(c.strip().split()[0] for c in cols if c.strip())
    return (
        f"CREATE OR REPLACE TEMPORARY VIEW {name} AS "
        f"SELECT * FROM ({values}) AS __t({col_names})"
    )


# --- engines ------------------------------------------------------------------
#
# The reference's pg-compat mode (tests/sqllogictests/README.md:112-140)
# runs the SAME slt scripts against a second engine (Postgres via
# PG_COMPAT=true) to verify cross-engine conformance of files prefixed
# ``pg_compat_``. This container has no Postgres, so the alternate
# engine here is DuckDB — same idea, same file convention: a
# ``pg_compat_*.slt`` file must pass verbatim on BOTH engines
# (pinned by tests/test_slt.py::test_pg_compat_corpus_both_engines).


class SparkEngine:
    """Default engine: Spark SQL with the retention macro layer."""

    name = "spark"

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def statement(self, sql: str) -> None:
        self.spark.sql(expand_macros(rewrite_statement(sql), self.spark))

    def query(self, sql: str) -> tuple[list[tuple], str]:
        df = self.spark.sql(expand_macros(sql, self.spark))
        types = "".join(type_code(t) for _, t in df.dtypes)
        return [tuple(r) for r in df.collect()], types


class DuckDBEngine:
    """Alternate conformance engine (the reference's Postgres role).

    No macro layer: pg_compat scripts are portable ANSI SQL by
    definition. Type codes come from DuckDB's logical types so the slt
    ``query IRT...`` headers check out identically on both engines.
    """

    name = "duckdb"

    _INT = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
            "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT")

    def __init__(self, con=None):
        import duckdb

        self.con = con if con is not None else duckdb.connect()

    @classmethod
    def _code(cls, t: str) -> str:
        t = str(t).upper()
        if t in cls._INT:
            return "I"
        if t in ("FLOAT", "DOUBLE") or t.startswith("DECIMAL"):
            return "R"
        if t == "VARCHAR":
            return "T"
        if t == "BOOLEAN":
            return "B"
        if t == "DATE":
            return "D"
        if t.startswith("TIMESTAMP"):
            return "P"
        return "?"

    def statement(self, sql: str) -> None:
        self.con.execute(rewrite_statement(sql))

    def query(self, sql: str) -> tuple[list[tuple], str]:
        rel = self.con.sql(sql)
        types = "".join(self._code(t) for t in rel.types)
        return [tuple(r) for r in rel.fetchall()], types


# --- execution ----------------------------------------------------------------


@dataclass
class SltFailure:
    line: int
    sql: str
    message: str


def _run_query(engine, rec: Record) -> tuple[list[str], str]:
    raw_rows, actual_types = engine.query(rec.sql)
    cell_rows = [[norm_value(v) for v in row] for row in raw_rows]
    expanded = [r for row in cell_rows for r in _expand_row(row)]
    rows = [" ".join(r) for r in expanded]
    if rec.sort == "rowsort":
        rows = sorted(rows)
    elif rec.sort == "valuesort":
        rows = sorted(v for r in expanded for v in r)
    return rows, actual_types


def _expected_for_compare(rec: Record) -> list[str]:
    if rec.sort == "valuesort":
        return sorted(v for line in rec.expected for v in line.split(" ") if v)
    return rec.expected


def run_text(
    spark: SparkSession | None,
    text: str,
    complete: bool = False,
    engine=None,
) -> tuple[list[SltFailure], str | None]:
    """Run slt text. Returns (failures, completed_text if complete).

    ``engine`` defaults to SparkEngine(spark); pass DuckDBEngine() (and
    spark=None) to run the same script on the alternate conformance
    engine — the reference's PG_COMPAT switch.

    Complete mode splices regenerated result blocks into the ORIGINAL
    text — comments, blank-line structure, statements, and anything
    after a ``halt`` stay byte-identical.
    """
    if engine is None:
        engine = SparkEngine(spark)
    records = parse_slt(text)
    failures: list[SltFailure] = []
    # (exp_span, new_rows) replacements for complete mode
    patches: list[tuple[tuple[int, int], list[str]]] = []
    for rec in records:
        if rec.kind == "statement":
            try:
                engine.statement(rec.sql)
                if rec.expect_error:
                    failures.append(
                        SltFailure(rec.line, rec.sql, "expected error, got success")
                    )
            except Exception as exc:
                if not rec.expect_error:
                    failures.append(SltFailure(rec.line, rec.sql, str(exc)[:500]))
        else:
            try:
                rows, actual_types = _run_query(engine, rec)
            except Exception as exc:
                failures.append(SltFailure(rec.line, rec.sql, str(exc)[:500]))
                continue
            if complete:
                if rec.exp_span is not None:
                    patches.append((rec.exp_span, rows))
                continue
            if rec.types and rec.types != actual_types:
                failures.append(
                    SltFailure(
                        rec.line,
                        rec.sql,
                        f"type codes: expected {rec.types}, got {actual_types}",
                    )
                )
            expected = _expected_for_compare(rec)
            if rows != expected:
                failures.append(
                    SltFailure(
                        rec.line,
                        rec.sql,
                        "result mismatch:\nexpected:\n  "
                        + "\n  ".join(expected)
                        + "\nactual:\n  "
                        + "\n  ".join(rows),
                    )
                )
    if not complete:
        return failures, None
    lines = text.splitlines()
    out: list[str] = []
    pos = 0
    for (start, end), rows in sorted(patches, key=lambda p: p[0][0]):
        out.extend(lines[pos:start])
        out.extend(rows)
        pos = end
    out.extend(lines[pos:])
    return failures, "\n".join(out) + ("\n" if text.endswith("\n") else "")


def run_file(
    spark: SparkSession | None,
    path: str,
    complete: bool = False,
    engine=None,
) -> list[SltFailure]:
    with open(path) as f:
        text = f.read()
    failures, completed = run_text(spark, text, complete=complete, engine=engine)
    if complete and completed is not None:
        with open(path, "w") as f:
            f.write(completed)
        return []
    return failures
