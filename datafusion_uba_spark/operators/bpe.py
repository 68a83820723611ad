"""Real merge-table BPE token counting.

Upgrades the r12 "BPE-ish" regex counter (operators/text.py
bpe_token_count — a pre-tokenizer match count) to the actual greedy
merge walk a production tokenizer runs (Sennrich et al. 2016; the
GPT-2 merges.txt mechanism): pre-tokenize into letter runs / digit
runs / single marks, split each pre-token into characters, then
repeatedly merge the adjacent pair with the LOWEST merge rank
(leftmost-first, non-overlapping within a pass) until no ranked pair
remains. Token count = number of surviving symbols.

The merge table is the checked-in deterministic fixture
``fixtures/bpe_merges.txt`` (regenerable via tools/gen_bpe_merges.py);
ranks are line numbers.

Scale design — the Zipf factorization
-------------------------------------
A token count depends only on the pre-token STRING, so the Python
merge loop runs once per DISTINCT pre-token, never per occurrence:

1. explode pre-tokens and count per (doc, word) — all built-ins,
   one hash aggregate (map-side partial);
2. the distinct vocabulary (|vocab| rows — millions at 100 TB, vs
   trillions of occurrences) crosses the Arrow boundary ONCE through
   mapInPandas to get per-word symbol counts;
3. join the tiny (word, n_sym) table back (AQE broadcasts it at
   runtime) and sum n_sym * occurrences per document.

The corpus-sized work never leaves the JVM; the Python work is
corpus-size-independent. The DuckDB oracle replays the identical walk
with a recursive CTE over the same distinct vocabulary
(queries_llm._bpe_walk_cte), so registry rows anchored on these
counts are full value-hash oracles, not sketch twins.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datafusion_uba_spark.operators.text import (
    BPE_TOKEN_RE,
    normalize_text,
)

__all__ = [
    "MERGES_PATH",
    "load_merges",
    "encode_word",
    "bpe_symbol_counts",
    "bpe_token_counts",
]

MERGES_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "bpe_merges.txt",
)


def load_merges(path: str | None = None) -> list[tuple[str, str]]:
    """The checked-in merge table as [(lhs, rhs)], rank = list index."""
    merges = []
    with open(path or MERGES_PATH) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            a, b = line.split(" ")
            merges.append((a, b))
    return merges


def encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Greedy BPE over one pre-token: repeatedly merge the present
    pair with the lowest rank, leftmost-first non-overlapping within
    each pass. The Python reference the Spark and DuckDB sides both
    replicate exactly."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best = None, None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, pair
        if best is None:
            break
        x, y = best
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                out.append(x + y)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _pre_tokens(text: Column | str) -> Column:
    """array<string> of BPE pre-tokens over normalized text."""
    return F.regexp_extract_all(
        normalize_text(text), F.lit(BPE_TOKEN_RE), F.lit(0)
    )


def bpe_symbol_counts(
    vocab: DataFrame, word_col: str = "w", merges_path: str | None = None
) -> DataFrame:
    """(word, n_sym) for a DISTINCT-word frame — the one Arrow
    boundary. Ships only the word column; the merge table rides the
    closure (~150 pairs checked in; tools/bench_bpe_scale.py drives
    this with 10-50k-pair tables via ``merges_path``)."""
    import pandas as pd

    ranks = {p: i for i, p in enumerate(load_merges(merges_path))}
    schema = f"{word_col} string, n_sym int"

    def count(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            words = pdf[word_col]
            yield pd.DataFrame(
                {
                    word_col: words,
                    "n_sym": [
                        len(encode_word(w, ranks)) for w in words
                    ],
                }
            )

    return vocab.select(word_col).mapInPandas(count, schema)


def bpe_token_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    merges_path: str | None = None,
) -> DataFrame:
    """(id, n_bpe_tokens) per document via the Zipf factorization —
    see the module docstring. Empty/NULL documents count 0."""
    wc = (
        df.select(
            F.col(id_col), F.explode(_pre_tokens(text_col)).alias("w")
        )
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    lens = bpe_symbol_counts(wc.select("w").distinct(), merges_path=merges_path)
    per_doc = (
        wc.join(lens, "w")
        .groupBy(id_col)
        .agg(F.sum(F.col("occ") * F.col("n_sym")).alias("__n"))
    )
    return df.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("__n"), F.lit(0))
        .cast("long")
        .alias("n_bpe_tokens"),
    )
