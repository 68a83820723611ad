"""As-of (nearest-event) join — a temporal operator Spark's DataFrame
API lacks as a primitive, composed here from built-ins.

For every left row, attach the payload of the LATEST right row with
``right_ts <= left_ts`` (direction="backward", the common case:
"state as of this moment"), or the EARLIEST with ``right_ts >=
left_ts`` (direction="forward"), per join key, optionally bounded by a
tolerance.

Plan (the union trick — one shuffle, no range join, no UDF):

1. Tag right rows (src=0) carrying ``struct(right_ts, payload...)``
   and left rows (src=1) carrying null.
2. Union and run ``last(carried, ignoreNulls=True)`` over a window
   partitioned by key, ordered by (ts, src, carried) rows UNBOUNDED
   PRECEDING..CURRENT (forward direction just flips the orderings).
   Right rows sort before left rows at equal ts, so the boundary is
   inclusive; the carried struct itself is the final ordering term, so
   among right rows tied on (key, ts) the LARGEST payload struct wins
   deterministically.
3. Keep left rows; null out matches outside ``tolerance``.

Scale: one hash shuffle of |L|+|R| rows partitioned by key + an
in-partition sort — the same cost profile as a co-partitioned merge
join, with per-key skew the only hazard (same hazard the dedicated
as-of joins in kdb/QuestDB/DuckDB have). State is O(1) per row scan —
nothing is buffered beyond the sort.

Cited parity: DuckDB's ASOF JOIN (the oracle twin used in
queries_uba) defines the same backward semantics: the greatest
right_ts <= left_ts per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _check_reserved(df: DataFrame, names: tuple[str, ...]) -> None:
    """Raise if an input frame already uses one of the operator's
    internal working-column names — letting it through would produce
    ambiguous-reference errors or silently wrong output downstream."""
    clash = sorted(set(df.columns) & set(names))
    if clash:
        raise ValueError(
            f"input columns {clash} collide with reserved internal "
            f"names; rename them before calling this operator"
        )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: Column | int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row, plus the payload of its nearest
    right row per key (backward: latest right_ts <= left_ts; forward:
    earliest right_ts >= left_ts; nearest: whichever of the two is
    closer in time, ties to backward — pandas merge_asof's rule).
    Unmatched left rows keep NULLs.

    ``right_cols`` are the payload columns (default: all right columns
    except key + timestamp); they appear in the output as
    ``<name><suffix>`` along with ``<right_ts><suffix>``. ``tolerance``
    (in the timestamp's own units) nulls out matches farther than that
    from the left timestamp.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward', or 'nearest'"
        )
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts or left_ts
    _check_reserved(left, ("__t", "__src", "__carried", "__m", "__mb", "__mf"))
    _check_reserved(right, ("__t", "__src", "__carried", "__m", "__mb", "__mf"))
    payload = right_cols or [
        c for c in right.columns if c not in (*keys, rts)
    ]

    # JOIN NULL semantics (matching DuckDB's ASOF JOIN, the oracle
    # twin): a NULL join key or NULL right_ts never matches anything.
    # Without this, Window.partitionBy would group NULL keys into ONE
    # partition (SQL joins never match NULL = NULL), and a NULL-ts
    # right row would sort first under asc ordering and be carried as
    # a bogus match.
    right = right.where(F.col(rts).isNotNull())
    for k in keys:
        right = right.where(F.col(k).isNotNull())

    carried = F.struct(
        F.col(rts).alias("__rts"), *[F.col(c).alias(c) for c in payload]
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(rts).alias("__t"),
        F.lit(0).alias("__src"),
        carried.alias("__carried"),
    )
    l_cols = left.columns
    l = left.select(
        "*",
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__src"),
        F.lit(None).cast(r.schema["__carried"].dataType).alias("__carried"),
    )
    # align schemas for the union: left's own columns, nulled on right
    r_aligned = r.select(
        *[
            F.col(k) if k in keys
            else F.lit(None).cast(left.schema[k].dataType).alias(k)
            for k in l_cols
        ],
        "__t",
        "__src",
        "__carried",
    )
    unioned = l.select(*l_cols, "__t", "__src", "__carried").unionByName(
        r_aligned
    )

    # carried ASC in BOTH directions: the window's last() takes the
    # final right row at each (key, ts), so ascending carried makes
    # the LARGEST payload struct win ties symmetrically (a carried
    # DESC here would silently flip forward ties to smallest-wins —
    # caught by test_asof_forward_tie_determinism)
    def one_dir(src: DataFrame, d: str, out: str) -> DataFrame:
        if d == "backward":
            order = [F.col("__t").asc(), F.col("__src").asc(),
                     F.col("__carried").asc()]
        else:
            order = [F.col("__t").desc(), F.col("__src").asc(),
                     F.col("__carried").asc()]
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        m = F.last("__carried", ignorenulls=True).over(w)
        # A NULL left timestamp never matches (NULL comparisons are
        # false in a join): under the forward direction's DESC
        # ordering Spark sorts NULLs LAST, so without the guard a
        # NULL-ts left row would sit after every right row and carry
        # one.
        m = F.when(F.col("__t").isNotNull(), m)
        if tolerance is not None:
            tol = (
                tolerance
                if isinstance(tolerance, Column)
                else F.lit(tolerance)
            )
            gap = (
                F.col("__t") - m["__rts"]
                if d == "backward"
                else m["__rts"] - F.col("__t")
            )
            m = F.when(gap <= tol, m)
        return src.withColumn(out, m)

    if direction in ("backward", "forward"):
        matched = one_dir(unioned, direction, "__m").where(
            F.col("__src") == 1
        )
    else:
        # nearest: BOTH direction passes over the same union — one
        # shuffle (same key partitioning), two in-partition sorts —
        # then pick the closer match, ties to backward (pandas
        # merge_asof's rule)
        both = one_dir(one_dir(unioned, "backward", "__mb"),
                       "forward", "__mf").where(F.col("__src") == 1)
        gap_b = F.col("__t") - F.col("__mb.__rts")
        gap_f = F.col("__mf.__rts") - F.col("__t")
        matched = both.withColumn(
            "__m",
            F.when(F.col("__mb").isNull(), F.col("__mf"))
            .when(F.col("__mf").isNull(), F.col("__mb"))
            .when(gap_b <= gap_f, F.col("__mb"))
            .otherwise(F.col("__mf")),
        )

    out_cols = [F.col(c) for c in l_cols]
    out_cols.append(F.col("__m.__rts").alias(f"{rts}{suffix}"))
    out_cols.extend(F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in payload)
    return matched.select(*out_cols)
