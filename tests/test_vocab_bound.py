"""|vocab| scale bound (round 7, revised round 9, plans/text.py): no
driver-side or broadcast structure may scale with raw corpus token
diversity.

Three properties are asserted on the fixture:
1. The AQE-delegated vocab join (`_join_vocab_bounded`, round 9) is
   bit-identical to the explicit-broadcast form it replaced, and AQE
   converts it to BroadcastHashJoin at fixture scale — the runtime
   decision replaced the round-7 manual head/tail split whose
   driver-side decision pass serialized an extra corpus tokenize.
2. Floored BPE learning agrees with unfloored learning on the fixture —
   the merge list is identical when singleton words are dropped, so
   `text_bpe_tokenize_fertility`'s bounded-head collect changes nothing.
3. The floor itself: head cardinality never exceeds VOCAB_HEAD_CAP by
   construction (counted directly against a synthetic skewed vocab) —
   the floor still bounds DRIVER collects, which AQE cannot.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_health_spark.plans import text as T

SF = "/root/testdata/sf0.001"


def _collect_sorted(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "qname", ["text_unigram_surprise", "text_tfidf_keywords"]
)
def test_vocab_join_matches_explicit_broadcast(spark, qname):
    """_join_vocab_bounded (round 9: AQE-delegated plain join) must be
    bit-identical to the explicit-broadcast form it replaced, and AQE
    must actually convert it to a broadcast hash join at fixture scale
    (the measured vocab is far under autoBroadcastJoinThreshold)."""
    fn = T.QUERIES[qname]
    df = fn(spark, SF)
    baseline = _collect_sorted(df)

    # reference: force the explicit broadcast through the old seam
    orig = T._join_vocab_bounded

    def forced(tokens, vocab, key, cnt):
        return tokens.join(F.broadcast(vocab), key)

    T._join_vocab_bounded = forced
    try:
        assert _collect_sorted(fn(spark, SF)) == baseline, qname
    finally:
        T._join_vocab_bounded = orig

    # executed-plan shape: AQE turned the plain join into a broadcast
    df = fn(spark, SF)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, qname


def test_bpe_bounded_query_matches_unbounded_collect(spark):
    """The production query (bounded-head learning collect + distributed
    apply) must agree with the pre-round-7 form (full-vocab collect,
    driver-side tokenize, broadcast map) on the fixture: the fixture
    vocab has no tokens below the floor (31 words, min freq 29), so the
    learning sets — and therefore the merges and every fertility number —
    are identical."""
    from delta_lake_health_spark.operators.bpe import token_count_map

    docs = T.load(spark, SF, "documents")
    words = docs.select("lang", F.explode(T.toks()).alias("word"))
    vocab = [
        (r.word, r.f)
        for r in words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("f"))
        .collect()
    ]
    _, counts = token_count_map(vocab, T._BPE_MERGES)
    tokmap = spark.createDataFrame(
        list(counts.items()), "word string, n_bpe int"
    )
    unbounded = _collect_sorted(
        words.join(F.broadcast(tokmap), "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_bpe").cast("long").alias("n_bpe_tokens"),
            F.round(
                F.sum("n_bpe").cast("double") / F.count(F.lit(1)), 6
            ).alias("fertility"),
        )
        .orderBy("lang")
    )
    bounded = _collect_sorted(
        T.QUERIES["text_bpe_tokenize_fertility"](spark, SF)
    )
    assert bounded == unbounded


def test_bpe_learning_floor_drops_singletons_only_from_learning():
    """Unit-level floor semantics: a raw-crawl-style singleton tail is
    excluded from the learning set (bounding the collect) while words
    whose frequency clears the floor are kept verbatim."""
    import hashlib

    vocab = [("order", 900), ("window", 800), ("scan", 2)] + [
        (hashlib.md5(str(i).encode()).hexdigest()[:7], 1) for i in range(60)
    ]
    floored = [(w, f) for (w, f) in vocab if f >= 2]
    assert floored == [("order", 900), ("window", 800), ("scan", 2)]


def test_fertility_census_covers_singleton_words(spark):
    """The floor bounds LEARNING only: tokenization still covers the full
    vocab (distributed apply), so every corpus word lands in the census —
    n_words must equal the raw per-lang token counts."""
    rows = T.QUERIES["text_bpe_tokenize_fertility"](spark, SF).collect()
    docs = T.load(spark, SF, "documents")
    exact = {
        r.lang: r.n
        for r in docs.select("lang", F.explode(T.toks()).alias("w"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r.lang: r.n_words for r in rows} == exact


def test_vocab_head_is_bounded_by_cap(spark, monkeypatch):
    """Direct bound check on a synthetic zipf-ish vocab: with the floor
    max(2, ceil(total/cap)), the head can never exceed the cap."""
    vocab = spark.range(1000).select(
        F.concat(F.lit("w"), F.col("id")).alias("w"),
        # one hot token + a heavy tail of twos and singletons
        F.when(F.col("id") == 0, F.lit(100000))
        .when(F.col("id") < 500, F.lit(2))
        .otherwise(F.lit(1))
        .alias("c"),
    )
    for cap in (1, 10, 100):
        monkeypatch.setattr(T, "VOCAB_HEAD_CAP", cap)
        floor = vocab.agg(T._vocab_floor_col("c")).collect()[0][0]
        head_n = vocab.where(F.col("c") >= floor).count()
        assert head_n <= cap, (cap, floor, head_n)
