"""BPE at realistic vocabulary scale (r13 verdict item 5).

The checked-in merge fixture is 149 pairs; a production tokenizer
carries 10-50k. This tool measures whether `encode_word` — the Python
loop that runs once per DISTINCT pre-token behind the one Arrow
boundary (operators/bpe.bpe_symbol_counts) — survives that table size,
and whether the end-to-end Spark path does.

Why the table must be TRAINED, not padded: a ranks dict is a hash map,
so dead entries cost nothing — the honest scale axis is how many
merges actually APPLY per word (more applying merges = more passes of
the greedy walk). So we synthesize a deterministic Zipfian vocabulary,
train real merge tables of increasing size on it with the classic
indexed incremental trainer (pair counts updated only for words
containing the merged pair — the naive full-recount trainer is
O(n_merges x |vocab|) and would dominate the measurement), and then
time the exact production encode path on each table.

Testdata can't provide this: sf0.1 documents hold only 31 distinct
pre-tokens (measured), so vocabulary is synthesized — deterministic
seed, Zipf-ish word lengths and letter skew, no testdata or external
content involved.

Run: python tools/bench_bpe_scale.py [--full-spark]
Appends a results block to tools/SCALE_RESULTS.md by hand (numbers
printed here; the md is curated).
"""

from __future__ import annotations

import random
import sys
import time
from collections import Counter

sys.path.insert(0, ".")

from datafusion_uba_spark.operators.bpe import encode_word  # noqa: E402

N_VOCAB = 100_000
SIZES = [150, 10_000, 50_000]


def synth_vocab(n: int, seed: int = 7) -> dict[str, int]:
    """Deterministic Zipfian (word -> occurrence count) vocabulary.
    Letter skew makes pair statistics realistic (common digraphs
    emerge and train into merges, like natural text)."""
    rng = random.Random(seed)
    letters = "etaoinshrdlucmfwypvbgkqjxz"
    weights = [1.0 / (i + 1) for i in range(len(letters))]
    vocab: dict[str, int] = {}
    while len(vocab) < n:
        ln = min(1 + int(rng.expovariate(1 / 4.5)), 16)
        w = "".join(rng.choices(letters, weights=weights, k=ln))
        if w not in vocab:
            # Zipf counts: rank-ordered by arrival
            vocab[w] = max(1, int(1_000_000 / (len(vocab) + 1)))
    return vocab


def train_indexed(
    vocab: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Classic indexed BPE trainer: same (count DESC, pair ASC)
    selection rule as tools/gen_bpe_merges.train, but pair counts are
    maintained INCREMENTALLY — each merge re-counts only the words
    that contain the merged pair (tracked via an inverted index), so
    50k merges over a 100k-word vocabulary stays tractable."""
    words: list[list[str]] = [list(w) for w in vocab]
    counts: list[int] = list(vocab.values())
    pair_counts: Counter = Counter()
    where: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        c = counts[i]
        for p in zip(syms, syms[1:]):
            pair_counts[p] += c
            where.setdefault(p, set()).add(i)
    # lazy-invalidation heap over (-count, pair): a pair's count
    # changes push a fresh entry; stale entries are discarded at pop
    # time by comparing against the live Counter. O(log H) per update
    # instead of a full pair-table scan per merge.
    import heapq

    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    def push(p: tuple[str, str]) -> None:
        c = pair_counts.get(p)
        if c:
            heapq.heappush(heap, (-c, p))

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            if pair_counts.get(p) == -negc and -negc >= 2:
                best = p
                break
        if best is None:
            break
        merges.append(best)
        x, y = best
        touched: set[tuple[str, str]] = set()
        for i in sorted(where.get(best, ())):
            syms, c = words[i], counts[i]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                touched.add(p)
                s = where.get(p)
                if s is not None:
                    s.discard(i)
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == x and syms[j + 1] == y:
                    out.append(x + y)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            for p in zip(out, out[1:]):
                pair_counts[p] += c
                touched.add(p)
                where.setdefault(p, set()).add(i)
        for p in touched:
            push(p)
    return merges


def main() -> None:
    t0 = time.perf_counter()
    vocab = synth_vocab(N_VOCAB)
    print(
        f"vocab: {len(vocab)} distinct words "
        f"({time.perf_counter() - t0:.1f}s)"
    )
    t0 = time.perf_counter()
    all_merges = train_indexed(vocab, max(SIZES))
    print(
        f"trained {len(all_merges)} merges "
        f"({time.perf_counter() - t0:.1f}s)"
    )
    words = list(vocab)
    results = {}
    for size in SIZES:
        table = all_merges[:size]
        if len(table) < size:
            print(f"note: only {len(table)} merges available for {size}")
        ranks = {p: i for i, p in enumerate(table)}
        t0 = time.perf_counter()
        total_syms = sum(len(encode_word(w, ranks)) for w in words)
        dt = time.perf_counter() - t0
        results[len(table)] = dt
        print(
            f"merges={len(table):>6}: encode {len(words)} distinct "
            f"words in {dt:.2f}s ({len(words) / dt:,.0f} words/s), "
            f"compression {total_syms / sum(len(w) for w in words):.3f} "
            f"sym/char"
        )
    # worst COST across table sizes over the cheapest — not the
    # largest table's cost (the 10k table can cost more than the 50k:
    # deeper walks, not-yet-collapsed symbols)
    base, worst = min(results.values()), max(results.values())
    print(
        f"table-size cost ratio (worst/cheapest): {worst / base:.2f}x "
        f"-- the encode loop is table-size-"
        f"{'FLAT' if worst / base < 3 else 'SENSITIVE (rework needed)'}"
    )

    if "--full-spark" in sys.argv:
        import os
        import tempfile

        from datafusion_uba_spark.operators import bpe
        from datafusion_uba_spark.session import get_spark
        from datafusion_uba_spark.sources import load_table

        fd, big_path = tempfile.mkstemp(suffix=".txt")
        with os.fdopen(fd, "w") as f:
            for a, b in all_merges:
                f.write(f"{a} {b}\n")
        spark = get_spark(app_name="bpe-scale")
        docs = load_table(spark, "/root/testdata/sf0.1", "documents")
        for path, label in [(None, "149-pair fixture"), (big_path, "big")]:
            t0 = time.perf_counter()
            n = (
                bpe.bpe_token_counts(docs, merges_path=path)
                .agg({"n_bpe_tokens": "sum"})
                .collect()[0][0]
            )
            print(
                f"spark bpe_token_counts sf0.1 [{label}]: "
                f"{time.perf_counter() - t0:.2f}s (sum={n})"
            )
        os.unlink(big_path)
        spark.stop()


if __name__ == "__main__":
    main()
