"""Data-quality audit operators — the deequ/great-expectations slice a
100 TB ingest pipeline runs before anything else touches the data.

Reference parity: the reference has no data-quality surface; this
family is part of the pipeline extension the driver mandates. Design
follows Amazon Deequ's core insight (Schelter et al., "Automating
Large-Scale Data Quality Verification", VLDB 2018): every check is an
AGGREGATE over the data, so arbitrarily many checks on one table fold
into ONE scan + ONE hash-aggregate pass — conditional aggregates, not
one job per rule. Cross-table rules (referential integrity) are the
exception: each is one left-join conditional aggregate, keyed on the
foreign key.

Output contract: one row per check — (check_name, violations, total) with
violations == 0 meaning pass — so the audit result is itself a tiny
DataFrame a pipeline can gate on, store, or diff between runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "check_rows",
    "null_checks",
    "unique_check",
    "fk_check",
    "dq_union",
    "check_rows_with_unique",
    "fk_check_with_parent_rows",
    "equi_depth_histogram",
    "table_diff",
    "key_skew_profile",
]


def _count_if(cond: Column) -> Column:
    # coalesce: SUM over ZERO rows is NULL, which would break the
    # "violations == 0 means pass" gate contract on empty input
    return F.coalesce(
        F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)
    ).cast("long")


def check_rows(
    df: DataFrame, checks: list[tuple[str, Column]]
) -> DataFrame:
    """Run row-predicate checks in ONE aggregate pass: ``checks`` is a
    list of (name, violation_condition) pairs; every condition becomes
    a conditional-sum aggregate over the same scan. Returns one row
    per check: (check_name, violations, total)."""
    if not checks:
        raise ValueError("check_rows: need at least one check")
    aggs = [F.count(F.lit(1)).cast("long").alias("__total")] + [
        _count_if(cond).alias(f"__c{i}") for i, (_, cond) in enumerate(checks)
    ]
    row = df.agg(*aggs)
    # unpivot the single aggregate row into (check_name, violations, total)
    # with a stack() — still one job, no collect
    pairs = ", ".join(
        "'{}', __c{}".format(name.replace("'", "''"), i)
        for i, (name, _) in enumerate(checks)
    )
    return row.selectExpr(
        f"stack({len(checks)}, {pairs}) AS (check_name, violations)", "__total"
    ).select("check_name", "violations", F.col("__total").alias("total"))


def null_checks(df: DataFrame, cols: list[str]) -> DataFrame:
    """Null-rate profile: one (``<col>_null``, violations, total) row
    per column, single pass."""
    return check_rows(df, [(f"{c}_null", F.col(c).isNull()) for c in cols])


def unique_check(df: DataFrame, key_cols: list[str], name: str) -> DataFrame:
    """Primary-key uniqueness: violations = rows carrying a duplicated
    key (total occupancy of keys seen more than once, NOT the number
    of duplicate keys — the row count a dedup would have to touch).
    One hash aggregate on the key, one tiny re-aggregate."""
    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__n"))
    return per_key.agg(
        F.coalesce(
            F.sum(F.when(F.col("__n") > 1, F.col("__n")).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("violations"),
        F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias("total"),
    ).select(F.lit(name).alias("check_name"), "violations", "total")


def fk_check(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    name: str,
) -> DataFrame:
    """Referential integrity: violations = child rows whose foreign key
    has no match in the parent (NULL keys are violations too — an
    unjoinable fact row is broken regardless of why). Plan: LEFT OUTER
    equi-join on the key against the parent's distinct-key projection
    (narrow column, never the parent's payload), then ONE conditional
    aggregate counts unmatched rows and total together — no separate
    count job, no 1x1 cross join. The child shuffles once on the key;
    a parent small enough broadcasts under AQE."""
    parent_keys = parent.select(
        F.col(parent_key).alias("__pk")
    ).where(F.col("__pk").isNotNull()).distinct()
    joined = child.select(F.col(child_key).alias("__fk")).join(
        parent_keys, F.col("__fk") == F.col("__pk"), "left"
    )
    return joined.agg(
        _count_if(F.col("__pk").isNull()).alias("violations"),
        F.count(F.lit(1)).cast("long").alias("total"),
    ).select(F.lit(name).alias("check_name"), "violations", "total")


def _stack_report(
    row: DataFrame, entries: list[tuple[str, str, str]]
) -> DataFrame:
    """Unpivot a one-row aggregate into (check_name, violations, total)
    rows via stack() — still one job, no collect. ``entries`` is
    (name, violations_col, total_col); names are quote-escaped."""
    triples = ", ".join(
        "'{}', {}, {}".format(name.replace("'", "''"), v, t)
        for name, v, t in entries
    )
    return row.selectExpr(
        f"stack({len(entries)}, {triples}) AS (check_name, violations, total)"
    )


def check_rows_with_unique(
    df: DataFrame,
    checks: list[tuple[str, Column]],
    key_cols: list[str],
    unique_name: str,
) -> DataFrame:
    """Row-predicate checks AND key-uniqueness in ONE scan of ``df``:
    a single hash aggregate on the key carries the per-key row count
    plus a conditional count per predicate (map-side partial combine,
    so the shuffle moves |keys| rows of a few longs); a tiny final
    aggregate then yields every row-check total (sum of per-key
    counts) and the duplicate occupancy (sum of n where n > 1) — the
    exact values ``check_rows`` + ``unique_check`` produce in two
    scans. The key shuffle was already the price of the uniqueness
    check alone; the row predicates ride it for free."""
    if not checks:
        raise ValueError("check_rows_with_unique: need at least one check")
    per_key = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"__c{i}")
            for i, (_, cond) in enumerate(checks)
        ],
    )
    row = per_key.agg(
        F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias("__total"),
        F.coalesce(
            F.sum(F.when(F.col("__n") > 1, F.col("__n")).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("__dup"),
        *[
            F.coalesce(F.sum(f"__c{i}"), F.lit(0))
            .cast("long")
            .alias(f"__v{i}")
            for i in range(len(checks))
        ],
    )
    entries = [
        (name, f"__v{i}", "__total") for i, (name, _) in enumerate(checks)
    ] + [(unique_name, "__dup", "__total")]
    return _stack_report(row, entries)


def fk_check_with_parent_rows(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    fk_name: str,
    parent_checks: list[tuple[str, Column]],
) -> DataFrame:
    """Referential integrity AND the parent's row-predicate checks in
    ONE scan of each table: both sides pre-aggregate per key (child →
    row count; parent → row count + a conditional count per
    predicate), FULL OUTER join on the key, then ONE aggregate reads
    off the orphan occupancy (child groups with no parent — NULL child
    keys never equi-match, so they count as orphans, matching
    ``fk_check``), the child total, the parent total, and every parent
    check total. Same values as ``fk_check`` + ``check_rows``; the two
    per-key shuffles were already the price of the FK join alone."""
    if not parent_checks:
        raise ValueError("fk_check_with_parent_rows: need parent checks")
    child_keys = child.groupBy(
        F.col(child_key).alias("__fk")
    ).agg(F.count(F.lit(1)).alias("__cn"))
    parent_keys = parent.groupBy(
        F.col(parent_key).alias("__pk")
    ).agg(
        F.count(F.lit(1)).alias("__pn"),
        *[
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"__c{i}")
            for i, (_, cond) in enumerate(parent_checks)
        ],
    )
    joined = child_keys.join(
        parent_keys, F.col("__fk") == F.col("__pk"), "full_outer"
    )
    row = joined.agg(
        F.coalesce(
            F.sum(F.when(F.col("__pk").isNull(), F.col("__cn")).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("__orphans"),
        F.coalesce(F.sum("__cn"), F.lit(0)).cast("long").alias("__ctotal"),
        F.coalesce(F.sum("__pn"), F.lit(0)).cast("long").alias("__ptotal"),
        *[
            F.coalesce(F.sum(f"__c{i}"), F.lit(0))
            .cast("long")
            .alias(f"__v{i}")
            for i in range(len(parent_checks))
        ],
    )
    entries = [(fk_name, "__orphans", "__ctotal")] + [
        (name, f"__v{i}", "__ptotal")
        for i, (name, _) in enumerate(parent_checks)
    ]
    return _stack_report(row, entries)


def dq_union(*audits: DataFrame) -> DataFrame:
    """Union audit frames into the single (check_name, violations, total)
    report, ordered by check name for stable output."""
    out = audits[0]
    for a in audits[1:]:
        out = out.unionByName(a)
    return out.orderBy("check_name")


def equi_depth_histogram(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    n_buckets: int = 8,
) -> DataFrame:
    """Equi-depth (equal-height) histogram per group — the statistic
    query optimizers actually keep (equal-WIDTH buckets collapse under
    skew; equal-depth buckets adapt so every bucket carries ~n/k rows
    and quantile boundaries fall out of the bucket edges). One
    hash-partitioned sort per group (ntile over the total order
    (value, tiebreak)), one hash aggregate to (group, bucket) — output
    cardinality |groups| x k regardless of row count.

    The total order makes every bucket boundary engine-deterministic:
    SQL-standard ntile (first n mod k buckets get one extra row) over
    identical orders yields identical bucket membership everywhere.

    Output: (group, bucket 1..k, n_rows, lo, hi) — lo/hi are the
    bucket's min/max value (exact, same unit as ``value_col``)."""
    if n_buckets < 1:
        raise ValueError("equi_depth_histogram: n_buckets must be >= 1")
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(value_col, tiebreak_col)
    bucketed = df.select(
        F.col(group_col).alias("__g"),
        F.col(value_col).alias("__v"),
        F.ntile(n_buckets).over(w).alias("__b"),
    )
    return (
        bucketed.groupBy("__g", "__b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("__v").alias("lo"),
            F.max("__v").alias("hi"),
        )
        .select(
            F.col("__g").alias(group_col),
            F.col("__b").cast("long").alias("bucket"),
            "n_rows",
            "lo",
            "hi",
        )
    )


def table_diff(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Key-based diff of two same-schema tables — the CDC/migration
    validation primitive ("did the backfill change anything it
    shouldn't?"): emits one row per key that differs, tagged
    ``only_a`` / ``only_b`` / ``changed``; unchanged keys (the 100 TB
    bulk) are dropped before anything wide moves. NULL-safe compare
    (<=>), so NULL -> value and value -> NULL both read as changed.

    Plan: each side shuffles ONCE on the key into a full-outer join;
    the verdict is a projection. Callers diffing by content rather
    than column set can pass a single hash column as ``compare_cols``.

    Duplicate keys raise in-plan (a diff keyed on a non-key is
    meaningless): each side is counted per key first — the aggregate
    rides the same shuffle the join needs, so the guard is free.

    Output: key columns + diff_status."""
    if not key_cols:
        raise ValueError("table_diff: need at least one key column")
    compare_cols = compare_cols or [
        c for c in a.columns if c not in key_cols
    ]

    def prep(df: DataFrame, side: str) -> DataFrame:
        g = df.groupBy(
            *[F.col(k).alias(f"__{side}_{k}") for k in key_cols]
        ).agg(
            F.count(F.lit(1)).alias(f"__{side}_n"),
            *[
                F.first(c).alias(f"__{side}_{c}")
                for c in compare_cols
            ],
        )
        return g.withColumn(
            f"__{side}_n",
            F.when(
                F.col(f"__{side}_n") > 1,
                F.raise_error(
                    F.concat(
                        F.lit(f"table_diff: duplicate key in {side}: "),
                        F.concat_ws(
                            ",",
                            *[F.col(f"__{side}_{k}").cast("string")
                              for k in key_cols],
                        ),
                    )
                ).cast("long"),
            ).otherwise(F.col(f"__{side}_n")),
        )

    pa, pb = prep(a, "a"), prep(b, "b")
    cond = None
    for k in key_cols:
        c = F.col(f"__a_{k}") == F.col(f"__b_{k}")
        cond = c if cond is None else cond & c
    joined = pa.join(pb, cond, "full_outer")
    in_a = F.col("__a_n").isNotNull()
    in_b = F.col("__b_n").isNotNull()
    same = None
    for c in compare_cols:
        eq = F.col(f"__a_{c}").eqNullSafe(F.col(f"__b_{c}"))
        same = eq if same is None else same & eq
    status = (
        F.when(in_a & ~in_b, "only_a")
        .when(~in_a & in_b, "only_b")
        .when(~same, "changed")
    )
    return (
        joined.select(
            *[
                F.coalesce(F.col(f"__a_{k}"), F.col(f"__b_{k}")).alias(k)
                for k in key_cols
            ],
            status.alias("diff_status"),
        )
        .where(F.col("diff_status").isNotNull())
    )


def key_skew_profile(
    df: DataFrame, key_cols: list[str], top_n: int = 10
) -> DataFrame:
    """Skew diagnostic for a prospective join/aggregation key — the
    question to ask BEFORE shipping a shuffle at 100 TB: how much of
    the table lands on the hottest reducer? One row per profiled key
    column set: total rows, distinct keys, and the occupancy of the
    top-1 and top-``top_n`` keys in exact basis points. top1_bp near
    10000/n_partitions is healthy; top1_bp in the thousands means the
    hottest key alone saturates one task — salt it or let AQE's skew
    join split it.

    Plan: one hash aggregate to per-key counts; the totals (sum,
    count, max) ride ONE aggregate over that frame, and the top-n
    slice is a TakeOrderedAndProject (sort+limit — never a global
    sort of the key space); the two one-row partials combine by union,
    so no one-row join appears anywhere.

    Output: (key, n_rows, n_distinct, top1_bp, topn_bp)."""
    if not key_cols:
        raise ValueError("key_skew_profile: need at least one key column")
    if top_n < 1:
        raise ValueError("key_skew_profile: top_n must be >= 1")
    per_key = df.groupBy(
        *[F.col(k) for k in key_cols]
    ).agg(F.count(F.lit(1)).alias("__n"))
    totals = per_key.agg(
        F.sum("__n").cast("long").alias("__rows"),
        F.count(F.lit(1)).cast("long").alias("__distinct"),
        F.max("__n").cast("long").alias("__top1"),
        F.lit(0).cast("long").alias("__topn"),
    )
    topn = (
        per_key.orderBy(
            F.col("__n").desc(), *[F.col(k).asc() for k in key_cols]
        )
        .limit(top_n)
        .agg(
            F.lit(0).cast("long").alias("__rows"),
            F.lit(0).cast("long").alias("__distinct"),
            F.lit(0).cast("long").alias("__top1"),
            F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias("__topn"),
        )
    )
    combined = totals.unionByName(topn).agg(
        F.sum("__rows").alias("n_rows"),
        F.sum("__distinct").alias("n_distinct"),
        F.sum("__top1").alias("__top1"),
        F.sum("__topn").alias("__topn"),
    )
    return combined.select(
        F.lit("+".join(key_cols)).alias("key"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.floor(F.col("__top1") * 10000 / F.col("n_rows"))
        .cast("long")
        .alias("top1_bp"),
        F.floor(F.col("__topn") * 10000 / F.col("n_rows"))
        .cast("long")
        .alias("topn_bp"),
    )
