"""sqllogictest runner for the Spark engine.

Re-creates the reference's conformance loop (SURVEY §3.3): parse
``.slt`` files, execute statements/queries against a SparkSession (with
the retention macro layer applied), normalize results, compare against
expected blocks — or rewrite the file in ``complete`` mode.

Normalization follows the reference's rules
(tests/sqllogictests/src/engines/conversion.rs:23-86,
normalize.rs:30-56): NULL → "NULL", empty string → "(empty)", booleans
lowercase, floats rounded to 12 decimal places then trailing-zero
stripped, NaN/Infinity/-Infinity spelled out, nested arrays rendered
Arrow-style ``[1, 2]``.

Statement dialect shims: ``CREATE TABLE t (cols) AS VALUES …`` (slt DDL,
retention.slt:5-9) is rewritten to a Spark temporary view.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import SparkSession

from datafusion_uba_spark.plans.sql_macro import expand_macros

# --- value normalization ----------------------------------------------------


def _norm_float(v: float) -> str:
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    d = Decimal(repr(v)).quantize(Decimal("1e-12"), rounding=ROUND_HALF_UP)
    s = format(d.normalize(), "f")
    return s


def norm_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return _norm_float(v)
    if isinstance(v, str):
        return v if v else "(empty)"
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(norm_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


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
                )
            )
        elif line in ("halt",):
            break
        else:
            i += 1
    return records


# --- statement dialect shims --------------------------------------------------

_CREATE_AS_VALUES = re.compile(
    r"^\s*CREATE\s+TABLE\s+(\w+)\s*\(([^)]*)\)\s*AS\s*(VALUES.*)$",
    re.IGNORECASE | re.DOTALL,
)


def rewrite_statement(sql_text: str) -> str:
    m = _CREATE_AS_VALUES.match(sql_text)
    if m:
        name, cols, values = m.group(1), m.group(2), m.group(3)
        col_names = ", ".join(c.strip().split()[0] for c in cols.split(","))
        return (
            f"CREATE OR REPLACE TEMPORARY VIEW {name} AS "
            f"SELECT * FROM ({values}) AS __t({col_names})"
        )
    return sql_text


# --- execution ----------------------------------------------------------------


@dataclass
class SltFailure:
    line: int
    sql: str
    message: str


def _run_query(spark: SparkSession, rec: Record) -> tuple[list[str], str]:
    df = spark.sql(expand_macros(rec.sql))
    actual_types = "".join(type_code(t) for _, t in df.dtypes)
    rows = [
        " ".join(norm_value(v) for v in row) for row in (tuple(r) for r in df.collect())
    ]
    if rec.sort == "rowsort":
        rows = sorted(rows)
    return rows, actual_types


def run_text(
    spark: SparkSession, text: str, complete: bool = False
) -> tuple[list[SltFailure], str | None]:
    """Run slt text. Returns (failures, completed_text if complete)."""
    records = parse_slt(text)
    failures: list[SltFailure] = []
    completed: list[str] = []
    for rec in records:
        if rec.kind == "statement":
            try:
                spark.sql(expand_macros(rewrite_statement(rec.sql)))
                if rec.expect_error:
                    failures.append(
                        SltFailure(rec.line, rec.sql, "expected error, got success")
                    )
                completed.append(
                    ("statement error\n" if rec.expect_error else "statement ok\n")
                    + rec.sql
                )
            except Exception as exc:
                if not rec.expect_error:
                    failures.append(SltFailure(rec.line, rec.sql, str(exc)[:500]))
                completed.append("statement error\n" + rec.sql)
        else:
            try:
                rows, actual_types = _run_query(spark, rec)
            except Exception as exc:
                failures.append(SltFailure(rec.line, rec.sql, str(exc)[:500]))
                continue
            if not complete:
                if rec.types and rec.types != actual_types:
                    failures.append(
                        SltFailure(
                            rec.line,
                            rec.sql,
                            f"type codes: expected {rec.types}, got {actual_types}",
                        )
                    )
                if rows != rec.expected:
                    failures.append(
                        SltFailure(
                            rec.line,
                            rec.sql,
                            "result mismatch:\nexpected:\n  "
                            + "\n  ".join(rec.expected)
                            + "\nactual:\n  "
                            + "\n  ".join(rows),
                        )
                    )
            completed.append(
                f"query {actual_types} {rec.sort}\n{rec.sql}\n----\n" + "\n".join(rows)
            )
    return failures, ("\n\n".join(completed) + "\n") if complete else None


def run_file(
    spark: SparkSession, path: str, complete: bool = False
) -> list[SltFailure]:
    with open(path) as f:
        text = f.read()
    failures, completed = run_text(spark, text, complete=complete)
    if complete and completed is not None:
        with open(path, "w") as f:
            f.write(completed)
        return []
    return failures
