"""Hash-keyed exact jaccard/containment — the permanent A/B parity
pin (r17 verdict #2: the staged ``operators/dedup_hashed.py`` module
was folded into ``operators/dedup.py`` in r18 and ``hashed=True``
became the default). The bar: byte-identical OUTPUT between
``hashed=True`` (xxhash64-long keys through every exchange) and
``hashed=False`` (the original string-keyed pipeline) on real corpora
and crafted boundaries, plus the injectivity-proof machinery that
makes the hash counts exact rather than approximate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_uba_spark.operators.dedup import (
    containment_pairs,
    injective_hash_seed,
    ngram_jaccard_pairs,
)
from datafusion_uba_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.01"


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_equality_on_real_corpus(spark):
    """Full output equality (ids, counts, basis points) against the
    string pipeline on the sf0.01 documents table — the same corpus
    the hash-gated dedup_ngram_jaccard registry row runs on."""
    docs = load_table(spark, SF_DIR, "documents")
    want = _rows(ngram_jaccard_pairs(docs, hashed=False))
    got = _rows(ngram_jaccard_pairs(docs))
    assert got == want
    assert len(got) > 0  # non-vacuous: the corpus has near-dups


def test_equality_threshold_boundary(spark):
    """Crafted pairs sitting exactly at/around tau: identical
    jaccard_bp and identical keep/drop decisions."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                       # J = 1.0
            (3, base + " extra"),            # high J
            (4, "alpha beta gamma delta"),   # partial overlap
            (5, "totally different words here nothing shared at all x y"),
        ],
        "doc_id long, text string",
    )
    for tau in (0.5, 0.8, 1.0):
        want = _rows(ngram_jaccard_pairs(docs, threshold=tau, hashed=False))
        got = _rows(ngram_jaccard_pairs(docs, threshold=tau))
        assert got == want, f"tau={tau}"


def test_equality_with_max_df(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(2000)
    want = _rows(ngram_jaccard_pairs(docs, max_df=50, hashed=False))
    got = _rows(ngram_jaccard_pairs(docs, max_df=50))
    assert got == want


def test_containment_equality_on_real_corpus(spark):
    """r18: containment_pairs rides the same hashed identity — full
    output equality against its string pipeline on the corpus the
    dedup_containment registry row runs on."""
    docs = load_table(spark, SF_DIR, "documents").limit(2000)
    want = _rows(containment_pairs(docs, hashed=False))
    got = _rows(containment_pairs(docs))
    assert got == want
    assert len(got) > 0


def test_containment_equality_crafted(spark):
    """Directional boundary: short doc quoted inside a long one, plus
    max_df interaction — identical both-direction outputs."""
    inner = "alpha beta gamma delta epsilon"
    outer = inner + " zeta eta theta iota kappa lam mu nu xi omicron"
    docs = spark.createDataFrame(
        [(1, inner), (2, outer), (3, "unrelated words entirely here now")],
        "doc_id long, text string",
    )
    for kwargs in ({}, {"max_df": 2}, {"threshold": 0.5}):
        want = _rows(containment_pairs(docs, hashed=False, **kwargs))
        got = _rows(containment_pairs(docs, **kwargs))
        assert got == want, f"kwargs={kwargs}"


def test_injective_seed_real_hash(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    sh = docs.select(F.explode(F.split("text", " ")).alias("__s"))
    assert injective_hash_seed(sh, "__s") == 0


def test_injective_seed_advances_and_raises(spark):
    """A hash that collides at seed 0 but not seed 1 returns 1; a
    hash that always collides raises instead of ever returning a
    seed with approximate counts."""
    vals = spark.createDataFrame(
        [("a",), ("b",), ("c",)], "__s string"
    )

    def collide_at_zero(c, seed_lit):
        # seed 0: constant (total collision); other seeds: injective
        return F.when(seed_lit == 0, F.lit(1)).otherwise(F.xxhash64(c))

    assert (
        injective_hash_seed(vals, "__s", hash_fn=collide_at_zero) == 1
    )

    def always_collides(c, seed_lit):
        return F.lit(7)

    with pytest.raises(ValueError, match="no injective"):
        injective_hash_seed(
            vals, "__s", max_tries=3, hash_fn=always_collides
        )
    # review fix: max_tries=0 raises the intended ValueError, not an
    # UnboundLocalError from the message's loop variable
    with pytest.raises(ValueError, match="no injective"):
        injective_hash_seed(vals, "__s", max_tries=0)


def test_hashed_pipeline_respects_injected_collisions(spark):
    """End-to-end guard: with a colliding hash injected, the pipeline
    must REFUSE (via the seed search) rather than emit inflated or
    deflated counts. The proof aggregate is eager, so the raise
    happens at plan-build time — no .collect() needed."""
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g h i j")], "doc_id long, text string"
    )

    def always_collides(c, seed_lit):
        return F.lit(7)

    with pytest.raises(ValueError, match="no injective"):
        ngram_jaccard_pairs(docs, hash_fn=always_collides)
    with pytest.raises(ValueError, match="no injective"):
        containment_pairs(docs, hash_fn=always_collides)
