"""Z-order (Morton) multi-dimensional data layout.

The 100 TB problem: parquet scan pruning works off per-file / per-row-
group min-max statistics, and a corpus sorted by ONE column prunes
only predicates on that column — a `WHERE user_id BETWEEN a AND b AND
value BETWEEN c AND d` box query against a user_id-sorted layout still
admits every file for the value dimension. Interleaving the bits of
both dimensions into one Morton key and range-partition-sorting by it
gives every file a small HYPERCUBE of the key space, so min-max stats
prune on all interleaved dimensions at once — the same layout trick as
Delta Lake's OPTIMIZE ZORDER BY / the classic UB-tree, built here from
Spark built-ins only (shift/and/or are whole-stage-codegen
expressions; the write is repartitionByRange + sortWithinPartitions,
one range shuffle).

Everything is integer-exact by construction — bucketization uses only
subtraction and right-shift (never float division), so the identical
arithmetic replays bit-for-bit in DuckDB:
``zorder_key_sql`` emits the oracle expression from the same
interleave spec that builds the Spark column (single source of truth;
registry row `zorder_keys` in queries.py).

tests/test_layout.py measures the actual pruning win: on a 2-D box
predicate, the z-ordered layout admits a fraction of the files a
single-column sort admits, using real parquet footer stats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bucket_shift",
    "quantile_bounds",
    "quantile_bucket",
    "zorder_bucket",
    "zorder_key",
    "zorder_key_sql",
    "zorder_layout",
]


def bucket_shift(lo: int, hi: int, bits: int) -> int:
    """Right-shift that maps [lo, hi] onto [0, 2**bits) buckets.

    Integer-exact: ``s = max(0, bit_length(hi - lo) - bits)``; the
    bucket of x is then ``(x - lo) >> s`` and is always < 2**bits.
    (DuckDB replays bit_length as ``length(bin(hi - lo))`` — equal for
    every positive range, and both sides clamp at 0 for range 0.)
    No log2 anywhere: float log of a near-power-of-two differing in
    the last ulp between engines would silently shear every bucket.
    """
    if hi < lo:
        raise ValueError(f"bucket_shift: hi < lo ({hi} < {lo})")
    return max(0, (hi - lo).bit_length() - bits)


def zorder_bucket(
    col: Column, lo: int, shift: int, bits: int | None = None
) -> Column:
    """Bucketize an integer column with the shift from bucket_shift.

    ``bits`` clamps values outside the caller's [lo, hi] into
    [0, 2**bits) (greatest/least — still codegen): without it a
    caller-supplied bound tighter than the data silently produces
    negative or overflowing buckets whose stray set bits corrupt the
    Morton key far beyond the offending dimension. Callers that derive
    bounds from the data itself (the zorder_keys registry row, whose
    DuckDB oracle replays the unclamped arithmetic) can omit it."""
    b = F.shiftright((col - F.lit(lo)).cast("long"), shift)
    if bits is None:
        return b
    return F.greatest(
        F.lit(0).cast("long"),
        F.least(F.lit((1 << bits) - 1).cast("long"), b),
    )


def _interleave_spec(k: int, bits: int) -> list[tuple[int, int, int]]:
    """(dim, source_bit, target_bit) triples — the ONE definition of
    the Morton interleave, consumed by both zorder_key (Spark) and
    zorder_key_sql (DuckDB oracle)."""
    return [(i, b, b * k + i) for b in range(bits) for i in range(k)]


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Morton key of k bucketized columns (each in [0, 2**bits)).

    Pure shift/and/or expression tree — k*bits terms, all inside
    whole-stage codegen; bits=8 with k=2 is 16 terms producing a
    16-bit key, plenty for file-level layout (files per dimension
    rarely exceed 2**8 distinct stat ranges).
    """
    out: Column | None = None
    for i, b, t in _interleave_spec(len(cols), bits):
        term = F.shiftleft(F.shiftright(cols[i], b).bitwiseAND(F.lit(1)), t)
        out = term if out is None else out.bitwiseOR(term)
    assert out is not None
    return out.cast("long")


def zorder_key_sql(col_exprs: list[str], bits: int = 8) -> str:
    """The identical Morton key as an ANSI-SQL expression (DuckDB
    oracle replay) — generated from the same _interleave_spec."""
    terms = [
        f"((({col_exprs[i]} >> {b}) & 1) << {t})"
        for i, b, t in _interleave_spec(len(col_exprs), bits)
    ]
    return "(" + " | ".join(terms) + ")"


def quantile_bounds(
    df: DataFrame, col: str | list[str], bits: int, accuracy: int = 10_000
) -> list | dict[str, list]:
    """2**bits - 1 approx-quantile cut points for rank bucketization
    (one pass, mergeable GK sketch — no sort shuffle). Pass a LIST of
    columns to sketch them all in ONE aggregate job (returns
    col -> cut points) — zorder_layout's quantile branch goes through
    here, so there is exactly one definition of the cut-point pass."""
    cols = [col] if isinstance(col, str) else list(col)
    n = 1 << bits
    probs = [i / n for i in range(1, n)]
    row = df.agg(
        *[
            F.percentile_approx(c, probs, accuracy).alias(f"__q_{i}")
            for i, c in enumerate(cols)
        ]
    ).collect()[0]
    out = {c: list(row[f"__q_{i}"]) for i, c in enumerate(cols)}
    return out[cols[0]] if isinstance(col, str) else out


def quantile_bucket(col: Column, bounds: list) -> Column:
    """Bucket of ``col`` against sorted cut points: #bounds <= x,
    always in [0, len(bounds)]. The cut points ride along as a literal
    array (broadcast in the task binary); the per-row cost is one
    vectorized pass over 2**bits - 1 literals — a one-time layout
    cost, not a query-time one."""
    arr = F.array(*[F.lit(b) for b in bounds])
    return F.size(F.filter(arr, lambda b: b <= col)).cast("long")


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    n_files: int = 64,
    bounds: dict[str, tuple[int, int]] | None = None,
    key_col: str = "__z",
    bucketize: str = "width",
) -> DataFrame:
    """Re-layout ``df`` in Morton order on integer columns ``cols``.

    Returns the frame range-partitioned into ``n_files`` partitions
    and sorted by the z-key within each — write it with
    ``.write.parquet(...)`` and every file's footer min-max stats
    cover a compact hypercube of (cols) space.

    ``bounds`` maps col -> (lo, hi); when omitted they are computed
    with one min/max aggregate (a collect of 2*k scalars — metadata-
    scale, same construction-time-job discipline as ivf_build_index).
    The plan is: [stats agg] -> one range exchange on the z-key ->
    per-partition sort; the corpus is shuffled exactly once, which is
    the unavoidable cost of any physical re-layout.

    ``bucketize`` picks the bucketization:

    - ``"width"`` (default): equal-width via subtract+shift —
      integer-exact (oracle-replayable; registry row zorder_keys) but
      SKEW-SENSITIVE: a heavy-tailed column collapses most rows into
      a few buckets, and with them most of the z-key's discriminating
      bits, so files in the dense region stop pruning.
    - ``"quantile"``: rank bucketization against 2**bits - 1
      approx-quantile cut points (one extra pass, no sort shuffle) —
      every bucket holds ~equal row mass regardless of distribution,
      which is what keeps per-file stat ranges tight at 100 TB where
      real columns are Zipfian, not uniform. Measured win on skewed
      data in tests/test_layout.py.
    """
    if not cols:
        raise ValueError("zorder_layout: need at least one column")
    if bucketize not in ("width", "quantile"):
        raise ValueError(f"zorder_layout: unknown bucketize {bucketize!r}")
    buckets = []
    if bucketize == "quantile":
        # ONE stats pass for all columns (k sketches in one aggregate,
        # via quantile_bounds), not k separate jobs
        cuts = quantile_bounds(df, cols, bits)
        buckets = [quantile_bucket(F.col(c), cuts[c]) for c in cols]
    else:
        if bounds is None:
            aggs = []
            for c in cols:
                aggs += [
                    F.min(c).alias(f"__lo_{c}"),
                    F.max(c).alias(f"__hi_{c}"),
                ]
            row = df.agg(*aggs).collect()[0]
            bounds = {c: (row[f"__lo_{c}"], row[f"__hi_{c}"]) for c in cols}
        for c in cols:
            lo, hi = bounds[c]
            # clamped (bits=...): caller-supplied bounds tighter than
            # the data must degrade pruning, not corrupt the key
            buckets.append(
                zorder_bucket(
                    F.col(c), lo, bucket_shift(lo, hi, bits), bits=bits
                )
            )
    keyed = df.withColumn(key_col, zorder_key(buckets, bits))
    return keyed.repartitionByRange(n_files, key_col).sortWithinPartitions(
        key_col
    )
