"""Z-order layout: correctness pins plus the measured pruning win.

The claim the layout exists for: against a 2-D box predicate, a
z-ordered parquet layout's per-file min-max footer stats admit far
fewer files than a single-column-sorted layout of the same data.
Measured here on REAL parquet footers via pyarrow — not a plan-string
assertion, the actual statistics a 100 TB scan would prune with.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from datafusion_uba_spark.operators import layout

BITS = 8
N_FILES = 64
BOX = (96, 127)  # 32 of 256 buckets on each dim -> 1/64 of key space


@pytest.fixture(scope="module")
def grid(spark):
    # 200k rows, x/y independent pseudo-random in [0, 256) — the
    # adversarial case for a single-column sort (y is uncorrelated
    # with x, so an x-sorted layout has full-range y stats per file)
    return spark.range(200_000).select(
        F.col("id"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(256)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(256)).alias("y"),
    )


def _admitted(path: str, box) -> tuple[int, int]:
    """(row groups admitted by footer stats for x AND y in box, total)."""
    lo, hi = box
    admitted = total = 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            total += 1
            row = md.row_group(rg)
            st = {
                row.column(i).path_in_schema: row.column(i).statistics
                for i in range(row.num_columns)
            }
            if (
                st["x"].max >= lo
                and st["x"].min <= hi
                and st["y"].max >= lo
                and st["y"].min <= hi
            ):
                admitted += 1
    return admitted, total


def test_zorder_prunes_2d_box_better_than_linear_sort(spark, grid, tmp_path):
    lin_path = str(tmp_path / "linear")
    z_path = str(tmp_path / "zorder")
    # the comparison is statistical (range-partitioner boundaries come
    # from reservoir samples); 10x the default sample size tightens
    # both layouts' file boundaries so the >= 2x pruning margin holds
    # under any executor scheduling (one in-suite flake observed at
    # the default 100 samples/partition)
    prev = spark.conf.get(
        "spark.sql.execution.rangeExchange.sampleSizePerPartition", "100"
    )
    spark.conf.set(
        "spark.sql.execution.rangeExchange.sampleSizePerPartition", "1000"
    )
    try:
        (
            grid.repartitionByRange(N_FILES, "x")
            .sortWithinPartitions("x")
            .write.parquet(lin_path)
        )
        zdf = layout.zorder_layout(
            grid,
            ["x", "y"],
            bits=BITS,
            n_files=N_FILES,
            bounds={"x": (0, 255), "y": (0, 255)},
        )
        zdf.drop("__z").write.parquet(z_path)
    finally:
        spark.conf.set(
            "spark.sql.execution.rangeExchange.sampleSizePerPartition", prev
        )

    lin_adm, lin_tot = _admitted(lin_path, BOX)
    z_adm, z_tot = _admitted(z_path, BOX)
    assert lin_tot >= N_FILES and z_tot >= N_FILES  # fixture sanity

    # linear: x prunes to ~1/8 of files, but EVERY surviving file has
    # full-range y stats, so none are eliminated by y
    assert lin_adm >= lin_tot // 10
    # z-order: the box is 1/64 of key space; allow generous slack for
    # boundary files and range-partitioner sampling skew, and require
    # at least a 2x win over the linear layout
    assert z_adm * 2 <= lin_adm, (z_adm, lin_adm)

    # pruning must not change answers: both layouts return the same
    # box count as the unwritten frame
    lo, hi = BOX
    want = grid.where(
        F.col("x").between(lo, hi) & F.col("y").between(lo, hi)
    ).count()
    for p in (lin_path, z_path):
        got = (
            spark.read.parquet(p)
            .where(F.col("x").between(lo, hi) & F.col("y").between(lo, hi))
            .count()
        )
        assert got == want, p


def test_quantile_bucketize_beats_width_on_skewed_data(spark, tmp_path):
    """The 100 TB failure mode of equal-width bucketing: a heavy-
    tailed column collapses ~99% of rows into bucket 0 (range 2**20,
    mass concentrated below 100), so the z-key loses that dimension's
    discriminating bits and a dense-region box stops pruning.
    Quantile (rank) bucketization keeps every bucket at ~equal row
    mass, so files in the dense region carry tight y-stats again —
    measured here on real parquet footers."""
    h1 = F.xxhash64("id", F.lit(1))
    h2 = F.xxhash64("id", F.lit(2))
    h3 = F.xxhash64("id", F.lit(3))
    skewed = spark.range(200_000).select(
        "id",
        F.pmod(h1, F.lit(256)).alias("x"),
        # 1% tail spread over [0, 2**20), 99% dense mass in [0, 100)
        F.when(F.pmod(h3, F.lit(100)) == 0, F.pmod(h2, F.lit(1 << 20)))
        .otherwise(F.pmod(h2, F.lit(100)))
        .alias("y"),
    )
    width_path = str(tmp_path / "width")
    quant_path = str(tmp_path / "quantile")
    for mode, path in (("width", width_path), ("quantile", quant_path)):
        layout.zorder_layout(
            skewed, ["x", "y"], bits=BITS, n_files=N_FILES, bucketize=mode
        ).drop("__z").write.parquet(path)

    # dense-region box: ~10% of the y row mass (all inside width-
    # bucket 0), an eighth of x
    box_x, box_y = (96, 127), (0, 9)

    def admitted(path, bx, by):
        a = t = 0
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                t += 1
                row = md.row_group(rg)
                st = {
                    row.column(i).path_in_schema: row.column(i).statistics
                    for i in range(row.num_columns)
                }
                if (
                    st["x"].max >= bx[0]
                    and st["x"].min <= bx[1]
                    and st["y"].max >= by[0]
                    and st["y"].min <= by[1]
                ):
                    a += 1
        return a, t

    w_adm, w_tot = admitted(width_path, box_x, box_y)
    q_adm, q_tot = admitted(quant_path, box_x, box_y)
    assert w_tot >= N_FILES and q_tot >= N_FILES
    # measured: quantile 3/64 vs width 9/64 (width's y-stats can't
    # discriminate inside its one dense bucket, so only x prunes)
    assert q_adm * 2 <= w_adm, (q_adm, w_adm)

    # the stark case — a y-only dense-region predicate: equal-width
    # admits EVERY file (measured 64/64, zero pruning); quantile keeps
    # pruning (measured 10/64)
    w_adm2, _ = admitted(width_path, (0, 255), box_y)
    q_adm2, _ = admitted(quant_path, (0, 255), box_y)
    assert w_adm2 == w_tot, "width layout should admit every file here"
    assert q_adm2 * 3 <= w_adm2, (q_adm2, w_adm2)

    # layouts don't change answers
    want = skewed.where(
        F.col("x").between(*box_x) & F.col("y").between(*box_y)
    ).count()
    for p in (width_path, quant_path):
        got = (
            spark.read.parquet(p)
            .where(F.col("x").between(*box_x) & F.col("y").between(*box_y))
            .count()
        )
        assert got == want, p

    with pytest.raises(ValueError, match="bucketize"):
        layout.zorder_layout(skewed, ["x"], bucketize="rank")


def test_zorder_key_is_collision_free_and_plan_shuffles_once(spark, grid):
    # interleaving k bits-per-dim buckets is a bijection onto the
    # 2k-bit key: distinct zkeys == distinct (x, y) pairs
    keyed = grid.select(
        layout.zorder_key([F.col("x"), F.col("y")], bits=BITS).alias("z"),
        "x",
        "y",
    )
    assert (
        keyed.select("z").distinct().count()
        == grid.select("x", "y").distinct().count()
    )

    # the re-layout plan moves the corpus exactly once: one range
    # exchange (plus AQE reuse nodes), no extra shuffle from the sort
    zdf = layout.zorder_layout(
        grid, ["x", "y"], bits=BITS, n_files=8,
        bounds={"x": (0, 255), "y": (0, 255)},
    )
    plan = zdf._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange rangepartitioning") == 1
    assert "Exchange hashpartitioning" not in plan


def test_zorder_bounds_agg_matches_explicit_bounds(spark, grid):
    # omitted bounds -> one stats aggregate; same layout as explicit
    auto = layout.zorder_layout(grid, ["x", "y"], bits=BITS, n_files=4)
    explicit = layout.zorder_layout(
        grid, ["x", "y"], bits=BITS, n_files=4,
        bounds={"x": (0, 255), "y": (0, 255)},
    )
    assert (
        auto.select("id", "__z").exceptAll(explicit.select("id", "__z")).count()
        == 0
    )


def test_too_tight_caller_bounds_clamp_instead_of_corrupting(spark):
    """r7 ADVICE: zorder_layout with caller-supplied bounds tighter
    than the data used to emit negative / overflowing buckets whose
    stray bits corrupted the Morton key. Now out-of-range values clamp
    into the edge buckets — pruning degrades at the edges, the key
    stays well-formed."""
    bits = 4
    df = spark.range(0, 200).selectExpr(
        "id AS x", "(199 - id) AS y"
    )
    laid = layout.zorder_layout(
        df, ["x", "y"], bits=bits, n_files=2,
        bounds={"x": (50, 149), "y": (50, 149)},  # data is [0, 199]
    )
    keys = [r["__z"] for r in laid.select("__z").collect()]
    assert all(0 <= z < (1 << (2 * bits)) for z in keys), (
        min(keys), max(keys),
    )
    # the clamped extremes land in the edge buckets, not random ones
    lo_row = laid.where("x = 0").select("__z").collect()[0]["__z"]
    assert lo_row >= 0
    # direct bucket check: below-lo -> 0, above-hi -> 2**bits - 1
    shift = layout.bucket_shift(50, 149, bits)
    probe = spark.range(1).selectExpr(
        "CAST(0 AS LONG) AS below", "CAST(199 AS LONG) AS above"
    ).select(
        layout.zorder_bucket(F.col("below"), 50, shift, bits=bits)
        .alias("b"),
        layout.zorder_bucket(F.col("above"), 50, shift, bits=bits)
        .alias("a"),
    ).collect()[0]
    assert probe["b"] == 0
    assert probe["a"] == (1 << bits) - 1


def test_bucket_shift_contract():
    # always < 2**bits, integer-exact, clamps at zero-range
    for lo, hi, bits in [(0, 255, 8), (0, 256, 8), (5, 5, 8), (0, 10**12, 8)]:
        s = layout.bucket_shift(lo, hi, bits)
        assert (hi - lo) >> s < (1 << bits), (lo, hi, s)
        # shift is minimal: one less would overflow the bucket range
        if s > 0:
            assert (hi - lo) >> (s - 1) >= (1 << bits)
    with pytest.raises(ValueError, match="hi < lo"):
        layout.bucket_shift(3, 2, 8)
    with pytest.raises(ValueError, match="at least one column"):
        layout.zorder_layout(None, [])
