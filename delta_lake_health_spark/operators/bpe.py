"""Byte-pair-encoding tokenizer: learn + apply (SURVEY §2.6 T24).

Sennrich et al. 2016 BPE, shaped for 100 TB: both learning and
application run over the VOCABULARY (distinct words with frequencies),
never the corpus — the vocab of any natural-language corpus is bounded
(Heaps' law: ~1e6-1e7 entries at web scale) while the corpus is not.
The Spark side reduces documents to the vocab with one groupBy, learns
merges driver-side on the frequency HEAD of that table (bounded by
``plans.text.VOCAB_HEAD_CAP`` — raw-crawl token diversity can reach
1e8+, so even the vocab is never collected whole), tokenizes each
DISTINCT word once in a distributed Arrow-batched pass, and joins the
(word -> n_tokens) map back through the bounded head/tail vocab join —
zero Python in the corpus path, nothing driver-side scaling with raw
token diversity.

Determinism: merge selection is (max frequency, then lexicographically
smallest pair); word iteration order is sorted. No RNG.
"""

from __future__ import annotations

END = "</w>"  # end-of-word marker, as in the original BPE


def _pair_counts(
    word_syms: dict[str, list[str]], freqs: dict[str, int]
) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for w, syms in word_syms.items():
        f = freqs[w]
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + f
    return counts


def learn_bpe(
    vocab: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from (word, frequency) pairs.
    Returns the ordered merge list (rank = position)."""
    freqs = {w: int(f) for w, f in sorted(vocab)}
    word_syms = {w: [*w, END] for w in freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(word_syms, freqs)
        if not counts:
            break
        pair, n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append(pair)
        a, b = pair
        ab = a + b
        for w, syms in word_syms.items():
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            word_syms[w] = out
    return merges


def apply_bpe(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Tokenize one word: repeatedly merge the LOWEST-rank adjacent pair
    (the standard greedy BPE application)."""
    syms = [*word, END]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i: best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def token_count_map(
    vocab: list[tuple[str, int]], n_merges: int
) -> tuple[list[tuple[str, str]], dict[str, int]]:
    """Learn merges, tokenize each distinct word ONCE, return
    (merges, word -> token count) — the broadcastable artifact."""
    merges = learn_bpe(vocab, n_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    return merges, {w: len(apply_bpe(w, ranks)) for w, _ in vocab}
