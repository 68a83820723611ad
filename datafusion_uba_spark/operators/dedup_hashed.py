"""Hash-keyed exact n-gram Jaccard pairs — the staged r18 successor
to ``dedup.ngram_jaccard_pairs``'s string-keyed pipeline.

Motivation (measured, tools/SCALE_RESULTS.md round-17): on the exact
constpair fixture the string pipeline's broadcast joins flip to
SortMergeJoin as the corpus grows (freq join at 32x sf0.1, both
verify joins at 64x on one local[32] box), and from then on every
shuffle and sort moves ~30-byte shingle STRINGS. Work stays exactly
linear (candidates and pairs proven exactly k-fold), but the byte
volume makes the fixed-bandwidth knee steep: verify went 5.7 s ->
52 s for one doubling.

This variant runs the whole post-shingling pipeline on ``xxhash64``
LONGS (8 bytes fixed): document frequency, the PPJoin prefix
ordering, the candidate self-join, and the verification arrays. That
is ~4x fewer bytes through every exchange and sort, and the
broadcast thresholds are crossed correspondingly later.

Exactness is NOT assumed from the hash — it is PROVEN per run: one
aggregate compares ``count(distinct shingle)`` with
``count(distinct xxhash64(shingle, seed))`` over the corpus. Equal
counts mean the hash is injective ON THIS CORPUS, so document
frequencies, prefix orders (any consistent total order on shingle
identities preserves the PPJoin completeness theorem — the order
only tunes candidate COUNT), intersection sizes, and therefore every
jaccard_bp are identical to the string pipeline's. On a collision
the seed advances and the proof re-runs (the probability any seed
collides on N shingles is ~N^2/2^65 — at a TRILLION distinct
shingles that is ~3e-5 — so the loop terminates immediately in
practice); exhausting the seed budget raises rather than returning
approximate counts.

Output contract is byte-identical to ``dedup.ngram_jaccard_pairs``:
``(doc_a, doc_b, common_shingles, jaccard_bp)``, doc_a < doc_b,
integer basis points.

The candidate-generation block intentionally mirrors
``dedup.ngram_jaccard_pairs`` (same staging, same explode_outer
rationale, same integer prefix arithmetic) rather than refactoring
it out of ``operators/dedup.py``: editing that module this round
would git-boost four registry rows out of the driver's 50-slot
capture window (see tools/SCALE_RESULTS.md round-17). Round 18
folds the two together and retires the duplication.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datafusion_uba_spark.operators.dedup import _shingle_df


def injective_hash_seed(
    shingles: DataFrame,
    col: str = "__s",
    max_tries: int = 8,
    hash_fn=None,
) -> int:
    """Smallest seed for which ``xxhash64(col, seed)`` is injective on
    the distinct values of ``col`` — proven by one aggregate
    (count-distinct of values vs count-distinct of hashes). Raises
    after ``max_tries`` collisions instead of ever returning a seed
    whose counts would be approximate. ``hash_fn(col, seed_lit)`` is
    injectable for tests."""
    hf = hash_fn or (lambda c, s: F.xxhash64(c, s))
    n_shingles = None
    for seed in range(max_tries):
        row = shingles.agg(
            F.countDistinct(F.col(col)).alias("ns"),
            F.countDistinct(hf(F.col(col), F.lit(seed))).alias("nh"),
        ).head()
        if row.ns == row.nh:
            return seed
        n_shingles = row.ns
    raise ValueError(
        f"no injective xxhash64 seed in {max_tries} tries over "
        f"{n_shingles} distinct shingles (collision probability "
        "~n^2/2^65 per seed — this indicates adversarial input, not "
        "chance)"
    )


def ngram_jaccard_pairs_hashed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
    hash_fn=None,
) -> DataFrame:
    """Exact near-duplicate pairs by word-n-gram Jaccard, hash-keyed.

    Same semantics and output schema as
    ``dedup.ngram_jaccard_pairs`` (prefix_filter always on here); see
    the module docstring for the exactness proof and the byte-volume
    rationale. One extra corpus pass (the injectivity aggregate) buys
    every downstream exchange/sort running on 8-byte longs."""
    tau_bp = int(round(threshold * 10000))
    hf = hash_fn or (lambda c, s: F.xxhash64(c, s))
    sh = _shingle_df(df, text_col, id_col, n)

    inv_s = (
        sh.select("__id", F.explode_outer("__sh").alias("__s"))
        .where(F.col("__s").isNotNull())
    )
    seed = injective_hash_seed(inv_s, "__s", hash_fn=hash_fn)
    seed_lit = F.lit(seed)

    # from here on, shingle identity IS the hash — strings never
    # cross another exchange
    inv = inv_s.select("__id", hf(F.col("__s"), seed_lit).alias("__h"))
    freq = inv.groupBy("__h").agg(F.count(F.lit(1)).alias("__df"))
    if max_df is not None:
        freq = freq.where(F.col("__df") <= max_df)
    per_doc = (
        inv.join(freq, "__h")
        .groupBy("__id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("__df", "__h"))
            ).alias("__ord"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    p = (
        F.col("__n")
        - F.floor((F.col("__n") * tau_bp + 9999) / 10000).cast("long")
        + 1
    )
    index = per_doc.select(
        "__id",
        F.explode(
            F.slice(
                F.transform(F.col("__ord"), lambda x: x["__h"]),
                F.lit(1),
                p.cast("int"),
            )
        ).alias("__h"),
    )
    a = index.alias("a")
    b = index.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__h") == F.col("b.__h"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("doc_a"), F.col("b.__id").alias("doc_b")
        )
        .distinct()
    )

    # verification over per-doc HASH arrays: length equals the string
    # array's (transform preserves it), and under the proven
    # injectivity the intersect size equals the string intersect size
    def _harr(c: Column) -> Column:
        return F.transform(c, lambda s: hf(s, seed_lit))

    sh_a = sh.select(
        F.col("__id").alias("doc_a"), _harr(F.col("__sh")).alias("__sha")
    )
    sh_b = sh.select(
        F.col("__id").alias("doc_b"), _harr(F.col("__sh")).alias("__shb")
    )
    counted = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("__sha", "__shb"))
            .cast("long")
            .alias("common_shingles"),
            F.size("__sha").alias("__na"),
            F.size("__shb").alias("__nb"),
        )
    )
    jac_bp = F.floor(
        (F.col("common_shingles") * 10000)
        / (F.col("__na") + F.col("__nb") - F.col("common_shingles"))
    ).cast("long")
    return counted.select(
        "doc_a", "doc_b", "common_shingles", jac_bp.alias("jaccard_bp")
    ).where(F.col("jaccard_bp") >= tau_bp)
