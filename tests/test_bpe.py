"""BPE learn/apply (operators/bpe.py): parity with an independent
string-replace reference, hand-checked merges, and the fertility census
plan shape (vocab-bounded Python, broadcast corpus join)."""

from __future__ import annotations

from delta_lake_health_spark.operators.bpe import (
    END,
    apply_bpe,
    learn_bpe,
    token_count_map,
)


def _ref_learn(vocab, n_merges):
    """Independent reference: symbols as space-joined strings, merges by
    whole-string replace."""
    freqs = dict(vocab)
    words = {w: " ".join([*w, END]) for w in freqs}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, s in words.items():
            syms = s.split(" ")
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + freqs[w]
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], p))
        if counts[pair] < 2:
            break
        merges.append(pair)
        a, b = pair
        words = {
            w: s.replace(f"{a} {b}", a + b) for w, s in words.items()
        }
    return merges


def test_learn_matches_independent_reference():
    vocab = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
             ("low", 5)][:4]  # unique words
    assert learn_bpe(vocab, 10) == _ref_learn(vocab, 10)
    # the classic Sennrich example: 'es' then 'est' family merges appear
    merges = learn_bpe(vocab, 4)
    assert ("e", "s") in merges or ("s", "t") in merges


def test_apply_uses_lowest_rank_first():
    merges = learn_bpe([("aaab", 4), ("aab", 3)], 6)
    ranks = {p: i for i, p in enumerate(merges)}
    toks = apply_bpe("aaab", ranks)
    assert "".join(toks) == "aaab" + END  # lossless
    assert len(toks) <= 3  # merges actually applied
    # unseen word: only merges that fire are applied, still lossless
    toks2 = apply_bpe("abba", ranks)
    assert "".join(toks2) == "abba" + END


def test_token_count_map_counts(spark):
    vocab = [("hello", 10), ("help", 5), ("yell", 2)]
    merges, counts = token_count_map(vocab, 8)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in vocab:
        assert counts[w] == len(apply_bpe(w, ranks))
        assert 1 <= counts[w] <= len(w) + 1


def test_fertility_census_query(spark):
    from delta_lake_health_spark.plans.text import QUERIES

    rows = QUERIES["text_bpe_tokenize_fertility"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows and all(r.fertility >= 1.0 for r in rows)
    langs = [r.lang for r in rows]
    assert langs == sorted(langs)
    # fertility bounded above by chars+1 per word
    assert all(r.fertility < 40 for r in rows)
