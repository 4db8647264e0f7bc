"""Text-analysis operators over the ``documents`` table (SURVEY §2.6).

All token work happens on array columns with JVM-side higher-order
functions (``split`` + ``transform``/``filter``/``aggregate``) — no Python
UDFs, so the whole pipeline stays inside whole-stage codegen and scales
linearly with corpus size (one narrow pass, zero shuffles until the final
aggregate).

The reference has no text operators (it is a Delta health toolkit); these
are the LLM-data-pipeline additions the brief requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_health_spark.sources.catalog import load

QUERIES: dict = {}
ORACLE: dict = {}

STOPWORDS = ("the", "a", "of", "and", "to", "in")
# Pseudo language-marker sets for the n-gram/stopword language-ID heuristic.
LANG_MARKERS = {
    "en": ("the", "a", "value", "table", "row"),
    "de": ("der", "die", "das", "und", "wert"),
    "fr": ("le", "la", "et", "valeur", "ligne"),
}

# BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space symbol.
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def query(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def _sql_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


def toks(col: str = "text"):
    return F.split(F.col(col), " ")


# --------------------------------------------------------------------------
# |vocab| scale bound (round 7, revised round 9): nothing driver-side
# or broadcast may scale with RAW corpus token diversity. A clean-text
# vocabulary obeys Heaps' law (~1e6-1e7 entries at web scale), but a
# raw 100 TB crawl's distinct-token count — typos, numbers, URLs,
# unicode junk — can reach 1e8+, which would sink any plan that
# broadcasts or collects the whole distinct-token table. Two bounds:
# - JOINS against vocab-shaped count tables are delegated to AQE
#   (_join_vocab_bounded): broadcast only when the MEASURED size fits
#   autoBroadcastJoinThreshold, skew-split shuffle otherwise — the
#   runtime decision replaced the round-7 manual head/tail split, whose
#   driver-side decision pass serialized an extra corpus tokenize ahead
#   of every consumer (the r7/r8 tf-idf drift).
# - DRIVER COLLECTS (BPE learning) stay bounded by the VOCAB_HEAD_CAP
#   frequency floor: tokens with corpus frequency
#   >= max(2, ceil(total/cap)) form the "head" (their number cannot
#   exceed the cap, because the frequencies sum to total). The floor is
#   derived from one scalar aggregate of the vocab table itself, so it
#   adapts to corpus size with no tuning.
VOCAB_HEAD_CAP = 1_000_000


def _vocab_floor_col(cnt: str) -> F.Column:
    """Frequency floor above which at most VOCAB_HEAD_CAP tokens exist."""
    return F.greatest(
        F.lit(2).cast("long"),
        F.ceil(F.sum(cnt) / F.lit(VOCAB_HEAD_CAP)).cast("long"),
    )


def _join_vocab_bounded(
    tokens: DataFrame, vocab: DataFrame, key: str, cnt: str
) -> DataFrame:
    """Join a corpus-side frame against a |vocab|-shaped count table,
    delegating the broadcast-vs-shuffle and skew decisions to AQE.

    History: rounds 7-8 implemented this as a manual head/tail split
    (frequency >= floor broadcasts, tail shuffles) with a driver-side
    decision pass. Round-9 A/B at sf0.1 attributed tf-idf's
    1.02s -> 1.27s drift to exactly that decision pass: its scalar
    aggregate SERIALIZED a full corpus tokenize ahead of the main job
    (and pinning the vocab still left the two jobs sequential, ~1.24s),
    while a plain join lets AQE convert to BroadcastHashJoin at runtime
    from the MEASURED shuffle size in one job (~0.97s, at r6's ~0.90s
    baseline; executed-plan-asserted in tests/test_vocab_bound.py).

    The at-scale bound the split bought is what AQE already provides
    from real sizes instead of a priori counts: a vocab under
    autoBroadcastJoinThreshold (64 MiB here) broadcasts; a raw-crawl
    vocab too big to broadcast stays a shuffle join whose hot corpus
    keys ("the") are split by AQE skew-join handling — no driver or
    broadcast structure ever scales with raw token diversity, and no
    extra pass is paid for the decision. ``cnt`` stays in the signature
    for call-site documentation (the count column the vocab carries).
    The VOCAB_HEAD_CAP frequency floor still bounds DRIVER collects
    (BPE learning), which AQE cannot — see ``_vocab_floor_col``."""
    del cnt
    return tokens.join(vocab, key)


# --------------------------------------------------------------------------
# T1 — token counting: whitespace tokens + BPE-ish regex tokens.
@query(
    "text_token_counts",
    f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '{BPE_RE}')) AS bpe_tokens,
           length(text) AS n_chars_measured
    FROM documents
    ORDER BY doc_id
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(toks()).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_RE), 0)).alias("bpe_tokens"),
        F.length("text").alias("n_chars_measured"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# T2 — quality scoring: length/punct/stopword components folded into one
# deterministic 0-1 score. Identical arithmetic on both sides.
@query(
    "text_quality_scores",
    f"""
    WITH base AS (
      SELECT doc_id,
             length(text) AS n,
             len(string_split(text, ' ')) AS n_tok,
             len(list_filter(string_split(text, ' '),
                             t -> t IN ({_sql_list(STOPWORDS)}))) AS n_stop,
             length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS n_punct
      FROM documents
    )
    SELECT doc_id,
           n_tok AS n_tokens,
           ROUND(CAST(n_punct AS DOUBLE) / n, 6) AS punct_ratio,
           ROUND(CAST(n_stop AS DOUBLE) / n_tok, 6) AS stopword_ratio,
           ROUND(CAST(n - n_tok + 1 AS DOUBLE) / n_tok, 6) AS avg_word_len,
           ROUND(0.4 * LEAST(1.0, CAST(n_tok AS DOUBLE) / 50)
               + 0.3 * (1.0 - CAST(n_punct AS DOUBLE) / n)
               + 0.3 * (1.0 - CAST(n_stop AS DOUBLE) / n_tok), 6) AS quality_score
    FROM base
    ORDER BY doc_id
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.length("text").cast("double").alias("n"),
        F.size(toks()).cast("double").alias("n_tok"),
        F.size(F.filter(toks(), lambda t: t.isin(*STOPWORDS)))
        .cast("double")
        .alias("n_stop"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[^a-z0-9 ]", ""))
        )
        .cast("double")
        .alias("n_punct"),
    )
    return base.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tokens"),
        F.round(F.col("n_punct") / F.col("n"), 6).alias("punct_ratio"),
        F.round(F.col("n_stop") / F.col("n_tok"), 6).alias("stopword_ratio"),
        F.round((F.col("n") - F.col("n_tok") + 1) / F.col("n_tok"), 6).alias(
            "avg_word_len"
        ),
        F.round(
            0.4 * F.least(F.lit(1.0), F.col("n_tok") / 50)
            + 0.3 * (1.0 - F.col("n_punct") / F.col("n"))
            + 0.3 * (1.0 - F.col("n_stop") / F.col("n_tok")),
            6,
        ).alias("quality_score"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# T3 — language ID: stopword-marker-hit heuristic with deterministic
# argmax (ties break in en > de > fr order), compared to the labeled lang.
@query(
    "text_lang_id",
    f"""
    WITH scored AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(text,' '), t -> t IN ({_sql_list(LANG_MARKERS['en'])}))) AS s_en,
             len(list_filter(string_split(text,' '), t -> t IN ({_sql_list(LANG_MARKERS['de'])}))) AS s_de,
             len(list_filter(string_split(text,' '), t -> t IN ({_sql_list(LANG_MARKERS['fr'])}))) AS s_fr
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 THEN 'unknown'
                WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_de >= s_fr THEN 'de'
                ELSE 'fr' END AS pred_lang,
           s_en, s_de, s_fr
    FROM scored
    ORDER BY doc_id
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")

    def score(markers):
        return F.size(F.filter(toks(), lambda t: t.isin(*markers)))

    scored = docs.select(
        "doc_id",
        "lang",
        score(LANG_MARKERS["en"]).alias("s_en"),
        score(LANG_MARKERS["de"]).alias("s_de"),
        score(LANG_MARKERS["fr"]).alias("s_fr"),
    )
    return scored.select(
        "doc_id",
        "lang",
        F.when(
            (F.col("s_en") == 0) & (F.col("s_de") == 0) & (F.col("s_fr") == 0),
            "unknown",
        )
        .when((F.col("s_en") >= F.col("s_de")) & (F.col("s_en") >= F.col("s_fr")), "en")
        .when(F.col("s_de") >= F.col("s_fr"), "de")
        .otherwise("fr")
        .alias("pred_lang"),
        "s_en",
        "s_de",
        "s_fr",
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# T4 — document fingerprinting: full-content md5 + a prefix fingerprint
# (first 8 whitespace tokens) that clusters near-identical openings.
@query(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(lower(trim(text))) AS content_fp,
           md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS prefix_fp
    FROM documents
    ORDER BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("content_fp"),
        F.md5(F.concat_ws(" ", F.slice(toks(), 1, 8))).alias("prefix_fp"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# T5 — corpus stats per (lang, source).
@query(
    "corpus_stats",
    """
    SELECT lang, source,
           COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), 6) AS avg_chars,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT md5(text)) AS n_unique
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """,
)
def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.sum(F.size(toks())).alias("total_tokens"),
            F.countDistinct(F.md5("text")).alias("n_unique"),
        )
        .orderBy("lang", "source")
    )


# --------------------------------------------------------------------------
# T6 — PII scrubbing: redact email-like tokens and long digit runs, report
# per-doc redaction counts + scrubbed-content fingerprint. The regexes are
# deliberately dialect-neutral (no lookarounds) so Spark (Java regex) and
# DuckDB (RE2) agree byte-for-byte.
EMAIL_RE = "[a-z0-9._]+@[a-z0-9.]+[.][a-z]+"
DIGITS_RE = "[0-9]{6,}"


@query(
    "text_scrub_pii",
    f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text, '{DIGITS_RE}')) AS n_long_digit_runs,
           md5(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                              '{DIGITS_RE}', '<NUM>', 'g')) AS scrubbed_fp
    FROM documents
    ORDER BY doc_id
    """,
)
def text_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), DIGITS_RE, "<NUM>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(DIGITS_RE), 0)).alias(
            "n_long_digit_runs"
        ),
        F.md5(scrubbed).alias("scrubbed_fp"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# T7/T8 — deterministic hash-based sampling and train/val/test splitting.
# The sampling key is the last two hex digits of md5(text) folded to a
# 0..255 bucket with plain strpos arithmetic — identical in both engines
# (no RNG, no engine hash functions), stable across runs and cluster
# sizes, and keyed on CONTENT so exact duplicates always land in the same
# split (no train/test leakage between copies). This is the standard
# hash-mod sampling a 100 TB corpus pipeline uses: one narrow pass, the
# sample rate is exact in expectation with zero coordination.
_HEX = "0123456789abcdef"

def _spark_bucket256():
    # built lazily: Column construction needs an active session;
    # delegates to the generalized column-parameterized form (DSIR) so
    # the bucketing arithmetic has exactly one definition
    return _spark_bucket256_of("text")

_SQL_BUCKET256 = (
    f"(strpos('{_HEX}', substr(md5(text), 31, 1)) - 1) * 16 + "
    f"(strpos('{_HEX}', substr(md5(text), 32, 1)) - 1)"
)


@query(
    "text_hash_sample",
    f"""
    SELECT doc_id, source, lang
    FROM documents
    WHERE {_SQL_BUCKET256} < 26  -- ~10.2% deterministic content sample
    ORDER BY doc_id
    """,
)
def text_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.where(_spark_bucket256() < 26)
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    )


def gopher_flags(docs: DataFrame, *carry: str) -> DataFrame:
    """Per-document rule flags over any frame with a ``text`` column
    (``carry`` columns pass through) — the reusable core of the filter,
    property-tested against a pure-Python reference."""
    base = docs.select(
        *carry,
        F.size(toks()).cast("double").alias("n_tok"),
        F.length("text").cast("double").alias("n"),
        F.size(F.filter(toks(), lambda t: t.isin(*STOPWORDS)))
        .cast("double")
        .alias("n_stop"),
        F.size(F.array_distinct(toks())).cast("double").alias("n_dist"),
    )
    mean_len = (F.col("n") - F.col("n_tok") + 1) / F.col("n_tok")
    return base.select(
        *carry,
        ((F.col("n_tok") >= 20) & (F.col("n_tok") <= 100000)).alias("ok_word_count"),
        ((mean_len >= 2) & (mean_len <= 10)).alias("ok_mean_word_len"),
        (F.col("n_stop") >= 2).alias("ok_stopwords"),
        (F.col("n_dist") / F.col("n_tok") >= 0.2).alias("ok_distinct_ratio"),
    )


# --------------------------------------------------------------------------
# T9 — Gopher-style quality rule filter (Rae et al. 2021, "Scaling Language
# Models", table A1 — adapted thresholds for this corpus).  Each rule is a
# cheap per-doc predicate over the whitespace token array; the output is the
# per-language rule-failure census a pipeline operator dashboard shows before
# committing to a filter.  One narrow pass + one tiny groupBy — at 100 TB the
# rules run inside the scan stage with map-side partial aggregation.
@query(
    "text_gopher_quality_filter",
    f"""
    WITH base AS (
      SELECT lang,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
             CAST(length(text) AS DOUBLE) AS n,
             CAST(len(list_filter(string_split(text, ' '),
                                  t -> t IN ({{stops}}))) AS DOUBLE) AS n_stop,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_dist
      FROM documents
    ), flags AS (
      SELECT lang,
             (n_tok >= 20 AND n_tok <= 100000) AS ok_word_count,
             ((n - n_tok + 1) / n_tok >= 2 AND (n - n_tok + 1) / n_tok <= 10)
               AS ok_mean_word_len,
             (n_stop >= 2) AS ok_stopwords,
             (n_dist / n_tok >= 0.2) AS ok_distinct_ratio
      FROM base
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN ok_word_count AND ok_mean_word_len
                          AND ok_stopwords AND ok_distinct_ratio
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           CAST(SUM(CASE WHEN ok_word_count THEN 0 ELSE 1 END) AS BIGINT)
             AS fail_word_count,
           CAST(SUM(CASE WHEN ok_mean_word_len THEN 0 ELSE 1 END) AS BIGINT)
             AS fail_mean_word_len,
           CAST(SUM(CASE WHEN ok_stopwords THEN 0 ELSE 1 END) AS BIGINT)
             AS fail_stopwords,
           CAST(SUM(CASE WHEN ok_distinct_ratio THEN 0 ELSE 1 END) AS BIGINT)
             AS fail_distinct_ratio,
           ROUND(CAST(SUM(CASE WHEN ok_word_count AND ok_mean_word_len
                           AND ok_stopwords AND ok_distinct_ratio
                          THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             AS keep_rate
    FROM flags
    GROUP BY lang
    ORDER BY lang
    """.replace("{stops}", _sql_list(STOPWORDS)),
)
def text_gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    flags = gopher_flags(docs, "lang")
    keep = (
        F.col("ok_word_count")
        & F.col("ok_mean_word_len")
        & F.col("ok_stopwords")
        & F.col("ok_distinct_ratio")
    )

    def fails(c: str):
        return F.sum(F.when(F.col(c), 0).otherwise(1)).alias(f"fail_{c[3:]}")

    return (
        flags.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(keep.cast("long")).alias("n_keep"),
            fails("ok_word_count"),
            fails("ok_mean_word_len"),
            fails("ok_stopwords"),
            fails("ok_distinct_ratio"),
            F.round(F.sum(keep.cast("double")) / F.count(F.lit(1)), 6).alias(
                "keep_rate"
            ),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# T10 — corpus-wide top-k n-grams (bigrams).  The n-gram table a tokenizer /
# contamination check builds: explode token bigrams, count, keep the global
# top 20 with a deterministic tie-break.  The explode is a narrow map; the
# count is one shuffle uniformly keyed by bigram; the top-k is a tiny
# TakeOrdered on the aggregated (distinct-bigram-sized) side — never a
# driver-side sort of the raw explode.
@query(
    "text_top_ngrams",
    """
    WITH t AS (SELECT string_split(text, ' ') AS t FROM documents),
    bg AS (
      SELECT t[CAST(i AS INT)] || ' ' || t[CAST(i + 1 AS INT)] AS bigram
      FROM t, UNNEST(range(1, len(t))) u(i)
      WHERE len(t) >= 2
    )
    SELECT bigram, COUNT(*) AS cnt
    FROM bg
    GROUP BY bigram
    ORDER BY cnt DESC, bigram
    LIMIT 20
    """,
)
def text_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = toks()
    bigrams = (
        docs.where(F.size(t) >= 2)
        # split once, then index the array in the lambda
        .select(t.alias("toks"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> concat_ws(' ', toks[i - 1], toks[i]))"
                )
            ).alias("bigram")
        )
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "bigram")
        .limit(20)
    )


@query(
    "text_train_val_test_split",
    f"""
    SELECT source,
           CASE WHEN {_SQL_BUCKET256} < 204 THEN 'train'
                WHEN {_SQL_BUCKET256} < 230 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def text_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    split = (
        F.when(_spark_bucket256() < 204, "train")
        .when(_spark_bucket256() < 230, "val")
        .otherwise("test")
    )
    return (
        docs.groupBy("source", split.alias("split"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source", "split")
    )


# --------------------------------------------------------------------------
# T11 — train/test contamination audit (the decontamination check of
# GPT-3 appx C / Dodge et al. 2021 over C4): fraction of the test split's
# 8-token shingles that also occur in the train split.  Uses the SAME
# content-hash split as T8, so the audit measures real near-duplicate
# leakage, not exact-copy leakage (exact copies land in one split by
# construction).  Scale shape: both sides reduce to distinct 32-byte
# shingle hashes before the semi-join, which shuffles on the hash —
# uniform by construction, never the text itself.
_CONTAM_W = 8


@query(
    "text_split_contamination",
    f"""
    WITH t AS (
      SELECT source, string_split(text, ' ') AS t,
             CASE WHEN {_SQL_BUCKET256} < 204 THEN 'train'
                  WHEN {_SQL_BUCKET256} < 230 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ), sh AS (
      SELECT DISTINCT source, split,
             md5(array_to_string(
               t[CAST(i AS INT):CAST(i + {_CONTAM_W - 1} AS INT)], ' ')) AS h
      FROM t, UNNEST(range(1, len(t) - {_CONTAM_W - 2})) u(i)
      WHERE len(t) >= {_CONTAM_W}
    ), train AS (SELECT DISTINCT h FROM sh WHERE split = 'train'),
    test AS (SELECT source, h FROM sh WHERE split = 'test')
    SELECT source,
           COUNT(*) AS n_test_shingles,
           CAST(SUM(CASE WHEN train.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           ROUND(CAST(SUM(CASE WHEN train.h IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS contamination_rate
    FROM test LEFT JOIN train USING (h)
    GROUP BY source
    ORDER BY source
    """,
)
def text_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = toks()
    split = (
        F.when(_spark_bucket256() < 204, "train")
        .when(_spark_bucket256() < 230, "val")
        .otherwise("test")
    )
    shingles = (
        docs.where(F.size(t) >= _CONTAM_W)
        # project the token array ONCE; split(text) inside the lambda
        # would re-split the document per shingle
        .select("source", split.alias("split"), t.alias("toks"))
        # only the train and test sides are ever consumed — drop the
        # val docs BEFORE the shingle explode and the distinct shuffle
        # (r14; ~10% of rows at the 204/230/256 split boundaries)
        .where(F.col("split") != "val")
        .select(
            "source",
            "split",
            # BINARY digest key (r14, guide §2.3): 16-byte unhex(md5)
            # through the distinct shuffle, the checkpoint, and the
            # contamination join — bijective, groupings unchanged
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {_CONTAM_W - 1}),"
                    f" i -> unhex(md5(concat_ws(' ', slice(toks, i, {_CONTAM_W})))))"
                )
            ).alias("h"),
        )
        .distinct()
        # consumed twice (train side and test side) — materialize once
        .localCheckpoint()
    )
    train = shingles.where(F.col("split") == "train").select("h").distinct()
    test = shingles.where(F.col("split") == "test").select("source", "h")
    flagged = test.join(
        train.withColumn("_hit", F.lit(1)), "h", "left"
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_test_shingles"),
            F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0)).alias(
                "n_contaminated"
            ),
            F.round(
                F.sum(F.when(F.col("_hit").isNotNull(), 1.0).otherwise(0.0))
                / F.count(F.lit(1)),
                6,
            ).alias("contamination_rate"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# T12 — language-balanced downsampling: deterministic content-hash
# thresholding that equalizes per-language volume to the smallest
# language (the rebalancing step a multilingual pretraining mix applies).
# keep iff hash-bucket < (256 * target) div count — integer arithmetic,
# identical in both engines, no RNG, duplicate-stable.  One tiny count
# aggregate broadcast back over one narrow pass.
@query(
    "text_language_balance_sample",
    f"""
    WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
    t AS (SELECT MIN(cnt) AS tgt FROM c),
    d AS (SELECT lang, {_SQL_BUCKET256} AS b FROM documents)
    SELECT d.lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN b < (256 * t.tgt) // c.cnt THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST((256 * t.tgt) // c.cnt AS BIGINT) AS bucket_threshold
    FROM d JOIN c USING (lang) CROSS JOIN t
    GROUP BY d.lang, c.cnt, t.tgt
    ORDER BY d.lang
    """,
)
def text_language_balance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    tgt = counts.agg(F.min("cnt").alias("tgt"))
    joined = (
        docs.select("lang", _spark_bucket256().alias("b"))
        .join(F.broadcast(counts), "lang")
        .crossJoin(F.broadcast(tgt))
    )
    thresh = F.expr("(256 * tgt) div cnt")
    return (
        joined.groupBy("lang", "cnt", "tgt")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("b") < thresh, 1).otherwise(0)).alias("n_kept"),
        )
        .select(
            "lang",
            "n_docs",
            "n_kept",
            thresh.cast("long").alias("bucket_threshold"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# T13 — document-length histogram: 50-char buckets capped at 550+, the
# distribution profile a curation dashboard shows before choosing length
# cutoffs. Pure integer bucket arithmetic (identical both engines), one
# narrow pass + one tiny groupBy.
@query(
    "text_length_histogram",
    """
    SELECT LEAST(11, CAST(FLOOR(n_chars / 50.0) AS INT)) AS bucket,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY 1
    ORDER BY bucket
    """,
)
def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bucket = F.least(F.lit(11), F.floor(F.col("n_chars") / 50.0).cast("int"))
    return (
        docs.groupBy(bucket.alias("bucket"))
        .agg(
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# T14 — within-document repetition census (the Gopher repetition rules,
# Rae et al. 2022 §A1.1: excessive duplicate n-grams / a dominant top
# n-gram mark low-quality boilerplate). Per doc: bigram duplication
# fraction (1 - distinct/total) and the top-bigram share, plus the
# pass/fail flag a filter stage would use. Thresholds are adapted to the
# synthetic corpus' observed range (top max 0.167, dup max 0.133) so the
# flag is non-vacuous. Scale shape: bigrams are a narrow per-doc map
# (split once, index the array); the counts shuffle on (doc_id, bigram) —
# uniform by construction — then fold to one row per doc.
REP_TOP_BIGRAM_MAX = 0.05
REP_DUP_BIGRAM_MAX = 0.10


@query(
    "text_repetition_census",
    f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), bg AS (
      SELECT doc_id, t[CAST(i AS INT)] || ' ' || t[CAST(i + 1 AS INT)] AS b
      FROM t, UNNEST(range(1, len(t))) u(i)
      WHERE len(t) >= 2
    ), cnt AS (
      SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT)   AS n_bigrams,
           ROUND(1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS dup_bigram_frac,
           ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6)         AS top_bigram_frac,
           CAST(CASE WHEN CAST(MAX(c) AS DOUBLE) / SUM(c) > {REP_TOP_BIGRAM_MAX}
                       OR 1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(c) > {REP_DUP_BIGRAM_MAX}
                     THEN 1 ELSE 0 END AS INT) AS fails_repetition
    FROM cnt
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def text_repetition_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = toks()
    cnt = (
        docs.where(F.size(t) >= 2)
        .select("doc_id", t.alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> concat_ws(' ', toks[i - 1], toks[i]))"
                )
            ).alias("b"),
        )
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nb = F.sum("c")
    nd = F.count(F.lit(1))
    tc = F.max("c")
    top_frac = tc.cast("double") / nb
    dup_frac = F.lit(1.0) - nd.cast("double") / nb
    return (
        cnt.groupBy("doc_id")
        .agg(
            nb.cast("long").alias("n_bigrams"),
            F.round(dup_frac, 6).alias("dup_bigram_frac"),
            F.round(top_frac, 6).alias("top_bigram_frac"),
            F.when(
                (top_frac > REP_TOP_BIGRAM_MAX) | (dup_frac > REP_DUP_BIGRAM_MAX),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("fails_repetition"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# T15 — unigram-LM surprise scoring (the perplexity-style quality signal a
# pipeline uses when a real LM is too expensive — e.g. CCNet's LM filter,
# Wenzek et al. 2020, approximated at order 1): build the corpus unigram
# distribution, then score each document by the mean negative log
# probability of its tokens. Low surprise = common boilerplate; high
# surprise = rare-token noise. Scale shape: the vocab is one (token)
# groupBy with map-side partials — bounded by |vocab|, not corpus — then
# joined back through _join_vocab_bounded (AQE-delegated: broadcast when
# the measured vocab fits, skew-split shuffle for hot tokens otherwise).
@query(
    "text_unigram_surprise",
    """
    WITH t AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
    ), v AS (
      SELECT w, COUNT(*) AS c FROM t GROUP BY w
    ), tot AS (
      SELECT CAST(SUM(c) AS DOUBLE) AS n FROM v
    )
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           ROUND(AVG(-ln(v.c / tot.n)), 6) AS mean_surprise,
           ROUND(MAX(-ln(v.c / tot.n)), 6) AS max_surprise
    FROM t JOIN v USING (w) CROSS JOIN tot
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def text_unigram_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(toks()).alias("w"))
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").cast("double").alias("n"))
    surprise = -F.log(F.col("c") / F.col("n"))
    return (
        _join_vocab_bounded(words, vocab, "w", "c")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(surprise), 6).alias("mean_surprise"),
            F.round(F.max(surprise), 6).alias("max_surprise"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# T16 — duplicated-span removal (CCNet-style paragraph dedup, Wenzek et
# al. 2020, applied at fixed 8-token chunks since the corpus has no
# newline structure): hash every chunk, count occurrences CORPUS-WIDE,
# drop every chunk whose text occurs more than once, and reassemble each
# document from its surviving chunks in order. Scale shape: the count is
# one groupBy on the chunk hash (md5 — uniform keys, no skew), the
# verdict joins back on that hash, and reassembly is a per-doc
# collect_list + array_sort — work linear in corpus tokens, shuffles
# keyed only by hash/doc_id.
_CHUNK = 8

@query(
    "text_chunk_dedup",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    chunks AS (
      SELECT doc_id, CAST(i AS BIGINT) AS idx,
             array_to_string(t[i*{_CHUNK}+1 : i*{_CHUNK}+{_CHUNK}], ' ') AS chunk
      FROM toks, UNNEST(range(CAST(ceil(len(t) / {_CHUNK}.0) AS BIGINT))) AS u(i)
    ),
    freq AS (SELECT chunk, COUNT(*) AS c FROM chunks GROUP BY chunk)
    SELECT chunks.doc_id,
           COUNT(*) AS n_chunks,
           COUNT(*) FILTER (freq.c > 1) AS n_dup_chunks,
           COALESCE(string_agg(chunks.chunk, ' ' ORDER BY chunks.idx)
                      FILTER (freq.c = 1), '') AS kept_text
    FROM chunks JOIN freq USING (chunk)
    GROUP BY chunks.doc_id
    ORDER BY chunks.doc_id
    """,
)
def text_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = toks()
    chunks = (
        docs.select("doc_id", t.alias("t"))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, int(ceil(size(t) / {_CHUNK}.0)) - 1),"
                    f" i -> concat_ws(' ', slice(t, i * {_CHUNK} + 1, {_CHUNK})))"
                )
            ).alias("idx", "chunk"),
        )
    )
    freq = chunks.groupBy("chunk").agg(F.count(F.lit(1)).alias("c"))
    joined = chunks.join(freq, "chunk")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_chunks"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("c") == 1, F.struct("idx", "chunk")
                            )
                        )
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("kept_text"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# T17 — sequence packing census (the concat-and-chunk step that turns a
# document corpus into fixed-length training sequences): lay all
# documents out on one token axis in doc_id order, cut every _SEQ_LEN
# tokens, and report per sequence how many documents it touches / starts
# and how many tokens it holds. Scale shape: the global running offset is
# a DISTRIBUTED two-phase prefix sum — per-bucket cumsum (window
# partitioned by a doc_id range bucket) plus broadcast bucket offsets —
# never a single-partition global window, which is the classic 100 TB
# packing bottleneck.
_SEQ_LEN = 512
_PACK_BUCKET = 4096  # docs per prefix-sum bucket

@query(
    "text_pack_sequences",
    f"""
    WITH sized AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
    ),
    laid AS (
      SELECT doc_id, n,
             SUM(n) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS off
      FROM sized
    ),
    spans AS (
      SELECT doc_id, n, COALESCE(off, 0) AS off,
             COALESCE(off, 0) // {_SEQ_LEN} AS first_seq,
             (COALESCE(off, 0) + n - 1) // {_SEQ_LEN} AS last_seq
      FROM laid
    ),
    hits AS (
      SELECT CAST(s AS BIGINT) AS seq_id, doc_id,
             (off // {_SEQ_LEN} = s) AS starts_here
      FROM spans, UNNEST(range(CAST(first_seq AS BIGINT),
                               CAST(last_seq + 1 AS BIGINT))) AS u(s)
    ),
    total AS (SELECT SUM(n) AS tot FROM sized)
    SELECT seq_id,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (starts_here) AS n_docs_starting,
           CAST(LEAST({_SEQ_LEN}, (SELECT tot FROM total) - seq_id * {_SEQ_LEN})
                AS BIGINT) AS n_tokens
    FROM hits
    GROUP BY seq_id
    ORDER BY seq_id
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    from delta_lake_health_spark.plans.prefix_rank import (
        bucketed_prefix_sum,
    )

    sized = docs.select(
        "doc_id", F.size(toks()).cast("long").alias("n")
    )
    # two-phase exclusive token-prefix (shared prefix_rank impl):
    # id-range buckets, |buckets| broadcast offsets
    spans = (
        bucketed_prefix_sum(
            sized,
            (F.col("doc_id") / _PACK_BUCKET).cast("long"),
            ["doc_id"],
            F.col("n"),
            "off",
        )
        .withColumn("first_seq", (F.col("off") / _SEQ_LEN).cast("long"))
        .withColumn(
            "last_seq", ((F.col("off") + F.col("n") - 1) / _SEQ_LEN).cast("long")
        )
    )
    total = sized.agg(F.sum("n").alias("tot"))
    hits = spans.select(
        "doc_id",
        "off",
        F.explode(F.sequence("first_seq", "last_seq")).alias("seq_id"),
    ).withColumn(
        "starts_here", (F.col("off") / _SEQ_LEN).cast("long") == F.col("seq_id")
    )
    return (
        hits.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("starts_here"), 1).otherwise(0))
            .cast("long")
            .alias("n_docs_starting"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "seq_id",
            "n_docs",
            "n_docs_starting",
            F.least(
                F.lit(_SEQ_LEN).cast("long"),
                F.col("tot") - F.col("seq_id") * _SEQ_LEN,
            ).alias("n_tokens"),
        )
        .orderBy("seq_id")
    )


# --------------------------------------------------------------------------
# T18 — domain mixture weights (the sampling-weight table a training run
# draws from, temperature-scaled like multilingual sampling in mBERT /
# XLM-R, alpha = 0.5): per (source, lang) token mass -> proportion ->
# p^alpha renormalized. One groupBy over |domains| keys plus a broadcast
# total; the 100 TB cost is the single token-count pass.
_MIX_ALPHA = 0.5

@query(
    "corpus_mixture_weights",
    f"""
    WITH dom AS (
      SELECT source, lang,
             COUNT(*) AS n_docs,
             SUM(len(string_split(text, ' '))) AS n_tokens
      FROM documents GROUP BY source, lang
    ),
    tot AS (
      SELECT CAST(SUM(n_tokens) AS DOUBLE) AS tt,
             SUM(POW(n_tokens / (SELECT CAST(SUM(n_tokens) AS DOUBLE) FROM dom),
                     {_MIX_ALPHA})) AS z
      FROM dom
    )
    SELECT source, lang, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(n_tokens / tt, 6) AS p,
           ROUND(POW(n_tokens / tt, {_MIX_ALPHA}) / z, 6) AS sample_weight
    FROM dom CROSS JOIN tot
    ORDER BY source, lang
    """,
)
def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    dom = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks())).cast("long").alias("n_tokens"),
    )
    tt = dom.agg(F.sum("n_tokens").cast("double").alias("tt"))
    tot = (
        dom.crossJoin(F.broadcast(tt))
        .agg(
            F.first("tt").alias("tt"),
            F.sum(
                F.pow(F.col("n_tokens") / F.col("tt"), F.lit(_MIX_ALPHA))
            ).alias("z"),
        )
    )
    p = F.col("n_tokens") / F.col("tt")
    return (
        dom.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "lang",
            "n_docs",
            "n_tokens",
            F.round(p, 6).alias("p"),
            F.round(F.pow(p, F.lit(_MIX_ALPHA)) / F.col("z"), 6).alias(
                "sample_weight"
            ),
        )
        .orderBy("source", "lang")
    )


# --------------------------------------------------------------------------
# T19 — TF-IDF keyword extraction (the classic per-document salient-term
# signal used for topic tagging and quality triage): smoothed
# ln((N+1)/(df+1)) idf over length-normalized term frequency, top-3
# terms per document ranked on the ROUNDED score so cross-engine libm
# ulp differences can never flip a rank. Scale shape: tf is one
# (doc_id, token) groupBy (uniform — doc_id dominates the key); the df
# vocab table is bounded by |vocab| and joined back through the bounded
# head/tail split (hot keys broadcast, singleton tail shuffles on
# near-unique keys), so neither the corpus nor the driver ever holds a
# structure scaling with raw token diversity; the per-doc length and
# top-k windows partition on doc_id (uniform).
_TFIDF_K = 3


@query(
    "text_tfidf_keywords",
    f"""
    WITH t AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
    ), tf AS (
      SELECT doc_id, w, COUNT(*) AS tf,
             SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS dl
      FROM t GROUP BY doc_id, w
    ), df AS (
      SELECT w, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY w
    ), n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.w,
             ROUND(tf.tf / CAST(tf.dl AS DOUBLE)
                   * ln((n.n + 1.0) / (df.df + 1.0)), 6) AS tfidf
      FROM tf JOIN df USING (w) CROSS JOIN n
    ), ranked AS (
      SELECT doc_id, w, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, w) AS rnk
      FROM scored
    )
    SELECT doc_id, w AS term, tfidf, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= {_TFIDF_K}
    ORDER BY doc_id, rnk
    """,
)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(toks()).alias("w"))
    tf = (
        words.groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("dl", F.sum("tf").over(Window.partitionBy("doc_id")))
        # consumed by the score join AND the df derivation below — one
        # lazy checkpoint runs the token explode once (r14; the
        # before-plan showed two full explode subtrees)
        .localCheckpoint(eager=False)
    )
    # df from the tf table: tf has exactly one row per (doc_id, w), so
    # COUNT(*) per w == COUNT(DISTINCT doc_id) over the raw tokens —
    # the second corpus explode and its |tokens|-row shuffle disappear
    # (r14, guide §2.3 aggregate-before-shuffle)
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n"))
    scored = (
        _join_vocab_bounded(tf, dfreq, "w", "df")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "w",
            F.round(
                F.col("tf") / F.col("dl").cast("double")
                * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)),
                6,
            ).alias("tfidf"),
        )
    )
    rnk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "w")
    )
    return (
        scored.withColumn("rnk", rnk)
        .where(F.col("rnk") <= _TFIDF_K)
        .select("doc_id", F.col("w").alias("term"), "tfidf", "rnk")
        .orderBy("doc_id", "rnk")
    )


# --------------------------------------------------------------------------
# T20 — BPE merge-candidate statistics (the first iteration of
# byte-pair-encoding tokenizer training, Sennrich et al. 2016):
# frequency-weighted adjacent character-pair counts, computed on the
# VOCABULARY table (distinct word × corpus frequency) rather than the
# corpus — the classic BPE trick that makes the pass |vocab|-bounded no
# matter how many times a word repeats at 100 TB. Top-20 pairs with a
# deterministic (count DESC, pair) order are exactly the candidates the
# first merge round would consider.
@query(
    "text_bpe_merge_candidates",
    """
    WITH w AS (
      SELECT word, COUNT(*) AS f
      FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
      GROUP BY word
    ), p AS (
      SELECT substr(word, CAST(i AS INT), 2) AS pair, f
      FROM w, UNNEST(range(1, len(word))) u(i)
      WHERE len(word) >= 2
    )
    SELECT pair, CAST(SUM(f) AS BIGINT) AS cnt
    FROM p GROUP BY pair
    ORDER BY cnt DESC, pair
    LIMIT 20
    """,
)
def text_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(toks()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("f"))
        .where(F.length("word") >= 2)
    )
    pairs = vocab.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> substring(word, i, 2))"
            )
        ).alias("pair"),
        "f",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("f").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(20)
    )


# --------------------------------------------------------------------------
# T21 — repeated-n-gram span census (the exact-substring dedup signal of
# Lee et al. 2022, "Deduplicating Training Data Makes Language Models
# Better", at n-gram granularity): per source, how many tokens sit
# inside a window-W shingle that ALSO occurs in some other document.
# The span union per doc is computed with one lag window: spans all have
# length W and arrive sorted by start, so the running covered length is
# min(W, start - prev_start) per span — identical arithmetic in both
# engines. Scale shape: positions shuffle once on the uniform md5 hash
# for the cross-doc census, once on doc_id for the span merge; no
# doc x doc or shingle x shingle term anywhere.
_SPAN_W = 8


@query(
    "text_repeated_ngram_spans",
    f"""
    WITH t AS (
      SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ), pos AS (
      SELECT doc_id, source, CAST(i AS BIGINT) AS i,
             md5(array_to_string(
               t[CAST(i AS INT):CAST(i + {_SPAN_W - 1} AS INT)], ' ')) AS h
      FROM t, UNNEST(range(1, len(t) - {_SPAN_W - 2})) u(i)
      WHERE len(t) >= {_SPAN_W}
    ), dup_h AS (
      SELECT h FROM pos GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1
    ), dup_pos AS (
      SELECT doc_id, source, i,
             lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev_i
      FROM pos WHERE h IN (SELECT h FROM dup_h)
    ), per_doc AS (
      SELECT doc_id, source,
             SUM(CASE WHEN prev_i IS NULL THEN {_SPAN_W}
                      ELSE LEAST({_SPAN_W}, i - prev_i) END) AS covered
      FROM dup_pos GROUP BY doc_id, source
    ), totals AS (
      SELECT source, SUM(len(string_split(text, ' '))) AS total_tokens,
             COUNT(*) AS n_docs
      FROM documents GROUP BY source
    )
    SELECT totals.source,
           CAST(totals.total_tokens AS BIGINT) AS total_tokens,
           CAST(COALESCE(SUM(per_doc.covered), 0) AS BIGINT)
             AS covered_tokens,
           COUNT(per_doc.doc_id) AS n_docs_with_dups,
           ROUND(CAST(COALESCE(SUM(per_doc.covered), 0) AS DOUBLE)
                 / totals.total_tokens, 6) AS covered_rate
    FROM totals LEFT JOIN per_doc ON per_doc.source = totals.source
    GROUP BY totals.source, totals.total_tokens
    ORDER BY totals.source
    """,
)
def text_repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    t = toks()
    pos = (
        docs.where(F.size(t) >= _SPAN_W)
        .select("doc_id", "source", t.alias("toks"))
        .select(
            "doc_id",
            "source",
            # BINARY digest key (r14, guide §2.3): 16-byte unhex(md5)
            # instead of the hex string across the checkpoint, the
            # dup-census shuffle, and the join back — bijective, so
            # every grouping/join is unchanged
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {_SPAN_W - 1}),"
                    f" i -> unhex(md5(concat_ws(' ', slice(toks, i, {_SPAN_W})))))"
                )
            ).alias("p", "h"),
        )
        .select("doc_id", "source", (F.col("p") + 1).cast("long").alias("i"),
                "h")
    )
    pos = pos.localCheckpoint(eager=False)  # census + position side share it (lazy, r14)
    dup_h = (
        pos.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") > 1)
        .select("h")
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    per_doc = (
        pos.join(dup_h, "h")
        .select("doc_id", "source", "i", F.lag("i").over(w).alias("prev_i"))
        .groupBy("doc_id", "source")
        .agg(
            F.sum(
                F.when(F.col("prev_i").isNull(), F.lit(_SPAN_W)).otherwise(
                    F.least(F.lit(_SPAN_W), F.col("i") - F.col("prev_i"))
                )
            ).alias("covered")
        )
    )
    totals = docs.groupBy("source").agg(
        F.sum(F.size(t)).alias("total_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return (
        totals.join(per_doc, "source", "left")
        .groupBy("source", "total_tokens")
        .agg(
            F.coalesce(F.sum("covered"), F.lit(0)).cast("long").alias(
                "covered_tokens"
            ),
            F.count("doc_id").alias("n_docs_with_dups"),
            F.round(
                F.coalesce(F.sum("covered"), F.lit(0)).cast("double")
                / F.col("total_tokens"),
                6,
            ).alias("covered_rate"),
        )
        .select(
            "source",
            F.col("total_tokens").cast("long").alias("total_tokens"),
            "covered_tokens",
            "n_docs_with_dups",
            "covered_rate",
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# T28 — exact-substring SCRUB (the removal action T21 only censuses —
# Lee et al. 2022's ExactSubstr dedup applied): every token sitting
# inside a window-W shingle that also occurs in another document is
# REMOVED, and the doc is reassembled from the survivors. A token j is
# covered iff some duplicated span starts in [j-W+1, j]; rather than a
# token x span range join (pair-set explosion), both streams union into
# one per-doc sweep — starts carry reach = i+W-1, and a running MAX of
# reach over one doc_id-partitioned window marks each token covered iff
# max_reach >= j. Scale shape: one md5-hash shuffle for the cross-doc
# census, one doc_id shuffle for the sweep, intermediate size
# |tokens| + |dup starts| — never tokens x spans. Output: the 20 most
# scrubbed docs with an md5 of the reassembled text, so the two engines
# must agree on the exact surviving token sequence, not just counts.
@query(
    "text_scrub_repeated_spans",
    f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), pos AS (
      SELECT doc_id, CAST(i AS BIGINT) AS i,
             md5(array_to_string(
               t[CAST(i AS INT):CAST(i + {_SPAN_W - 1} AS INT)], ' ')) AS h
      FROM t, UNNEST(range(1, len(t) - {_SPAN_W - 2})) u(i)
      WHERE len(t) >= {_SPAN_W}
    ), dup_h AS (
      SELECT h FROM pos GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1
    ), starts AS (
      SELECT doc_id, i FROM pos WHERE h IN (SELECT h FROM dup_h)
    ), tk AS (
      SELECT doc_id, CAST(j AS BIGINT) AS j, t[CAST(j AS INT)] AS tok
      FROM t, UNNEST(range(1, len(t) + 1)) v(j)
    ), kept AS (
      SELECT k.doc_id, k.j, k.tok FROM tk k
      WHERE NOT EXISTS (
        SELECT 1 FROM starts s
        WHERE s.doc_id = k.doc_id
          AND s.i BETWEEN k.j - {_SPAN_W - 1} AND k.j
      )
    ), tot AS (
      SELECT doc_id, len(t) AS total_tokens FROM t
    ), ka AS (
      SELECT doc_id, COUNT(*) AS kept_tokens,
             md5(string_agg(tok, ' ' ORDER BY j)) AS sh
      FROM kept GROUP BY doc_id
    )
    SELECT tot.doc_id,
           CAST(total_tokens AS BIGINT) AS total_tokens,
           CAST(COALESCE(kept_tokens, 0) AS BIGINT) AS kept_tokens,
           CAST(total_tokens - COALESCE(kept_tokens, 0) AS BIGINT)
             AS removed_tokens,
           COALESCE(sh, md5('')) AS scrub_hash
    FROM tot LEFT JOIN ka USING (doc_id)
    WHERE total_tokens - COALESCE(kept_tokens, 0) > 0
    ORDER BY removed_tokens DESC, tot.doc_id
    LIMIT 20
    """,
)
def text_scrub_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", toks().alias("toks")
    )
    posh = (
        docs.where(F.size("toks") >= _SPAN_W)
        .select(
            "doc_id",
            # BINARY digest key (r14, guide §2.3) — see
            # text_repeated_ngram_spans
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {_SPAN_W - 1}),"
                    f" i -> unhex(md5(concat_ws(' ', slice(toks, i, {_SPAN_W})))))"
                )
            ).alias("p", "h"),
        )
        .select("doc_id", (F.col("p") + 1).cast("long").alias("i"), "h")
        .localCheckpoint(eager=False)  # census + start side share it (lazy, r14)
    )
    dup_h = (
        posh.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") > 1)
        .select("h")
    )
    starts = posh.join(dup_h, "h").select(
        "doc_id",
        F.col("i").alias("pos"),
        F.lit(0).alias("side"),
        (F.col("i") + _SPAN_W - 1).alias("reach"),
        F.lit(None).cast("string").alias("tok"),
    )
    tokens = docs.select(
        "doc_id", F.posexplode("toks").alias("p", "tok")
    ).select(
        "doc_id",
        (F.col("p") + 1).cast("long").alias("pos"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("reach"),
        "tok",
    )
    sweep = Window.partitionBy("doc_id").orderBy("pos", "side").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    kept = (
        starts.unionByName(tokens)
        .withColumn("max_reach", F.max("reach").over(sweep))
        .where(
            (F.col("side") == 1)
            & (F.col("max_reach").isNull()
               | (F.col("max_reach") < F.col("pos")))
        )
    )
    ka = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("kept_tokens"),
        F.md5(
            F.concat_ws(
                " ",
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, tok))),"
                    " x -> x.tok)"
                ),
            )
        ).alias("sh"),
    )
    tot = docs.select("doc_id", F.size("toks").cast("long").alias("total_tokens"))
    return (
        tot.join(ka, "doc_id", "left")
        .select(
            "doc_id",
            "total_tokens",
            F.coalesce("kept_tokens", F.lit(0)).cast("long").alias(
                "kept_tokens"
            ),
            (
                F.col("total_tokens") - F.coalesce("kept_tokens", F.lit(0))
            ).cast("long").alias("removed_tokens"),
            F.coalesce("sh", F.md5(F.lit(""))).alias("scrub_hash"),
        )
        .where(F.col("removed_tokens") > 0)
        .orderBy(F.col("removed_tokens").desc(), "doc_id")
        .limit(20)
    )


# --------------------------------------------------------------------------
# T22 — filter-funnel overlap census: the pass/fail combination matrix
# of four independent quality gates (length, stopword presence,
# punctuation ratio, digit ratio) with doc and token counts per cell —
# the attribution view ("which filter is actually doing the removing,
# and how much do they overlap") a pipeline owner reads before tuning
# thresholds. One narrow pass, one tiny (<=16-group) aggregate.
@query(
    "text_filter_funnel_census",
    f"""
    WITH base AS (
      SELECT len(string_split(text, ' ')) AS n_tok,
             len(list_filter(string_split(text, ' '),
                 t -> t IN ({_sql_list(STOPWORDS)}))) AS n_stop,
             length(text)
               - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))
               AS n_punct,
             length(text)
               - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
             length(text) AS n_chars
      FROM documents
    )
    SELECT (n_tok BETWEEN 5 AND 1000) AS len_ok,
           (n_stop >= 1) AS stop_ok,
           (CAST(n_punct AS DOUBLE) / n_chars <= 0.3) AS punct_ok,
           (CAST(n_digit AS DOUBLE) / n_chars <= 0.3) AS digit_ok,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM base
    GROUP BY 1, 2, 3, 4
    ORDER BY 1, 2, 3, 4
    """,
)
def text_filter_funnel_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = toks()
    stop_arr = _sql_list(STOPWORDS)
    base = docs.select(
        F.size(t).alias("n_tok"),
        F.size(
            F.expr(f"filter(split(text, ' '), t -> t IN ({stop_arr}))")
        ).alias("n_stop"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[^a-z0-9 ]", ""))
        ).alias("n_punct"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[0-9]", ""))
        ).alias("n_digit"),
        F.length("text").alias("n_chars"),
    )
    return (
        base.select(
            F.col("n_tok").between(5, 1000).alias("len_ok"),
            (F.col("n_stop") >= 1).alias("stop_ok"),
            (F.col("n_punct").cast("double") / F.col("n_chars") <= 0.3).alias(
                "punct_ok"
            ),
            (F.col("n_digit").cast("double") / F.col("n_chars") <= 0.3).alias(
                "digit_ok"
            ),
            "n_tok",
        )
        .groupBy("len_ok", "stop_ok", "punct_ok", "digit_ok")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .orderBy("len_ok", "stop_ok", "punct_ok", "digit_ok")
    )


# --------------------------------------------------------------------------
# T23 — exact stratified sampling: per (source, lang) stratum keep
# exactly ceil(n * fraction) documents, chosen deterministically as the
# smallest md5(doc_id || text) ranks — the exact-allocation counterpart
# to T12's hash-threshold (approximate) rebalancing. Scale note: exact
# allocation needs a per-stratum ORDER (a sort within each stratum
# partition); at 100 TB with mega-strata, swap to the T12 threshold form
# — the census below is identical either way, which is what this query
# emits and checks.
_STRATIFIED_FRACTION = 0.2


@query(
    "documents_stratified_sample",
    f"""
    WITH ranked AS (
      SELECT source, lang,
             ROW_NUMBER() OVER (
               PARTITION BY source, lang
               ORDER BY md5(CAST(doc_id AS VARCHAR) || text), doc_id
             ) AS rn,
             COUNT(*) OVER (PARTITION BY source, lang) AS n
      FROM documents
    )
    SELECT source, lang,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rn <= CEIL(n * {_STRATIFIED_FRACTION})
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           ROUND(CAST(SUM(CASE WHEN rn <= CEIL(n * {_STRATIFIED_FRACTION})
                              THEN 1 ELSE 0 END) AS DOUBLE) / MAX(n), 6)
             AS kept_rate
    FROM ranked
    GROUP BY source, lang
    ORDER BY source, lang
    """,
)
def documents_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.col("text")))
    w = Window.partitionBy("source", "lang").orderBy(key, "doc_id")
    wn = Window.partitionBy("source", "lang")
    ranked = docs.select(
        "source",
        "lang",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    kept = F.when(
        F.col("rn") <= F.ceil(F.col("n") * _STRATIFIED_FRACTION), 1
    ).otherwise(0)
    return (
        ranked.groupBy("source", "lang")
        .agg(
            F.max("n").cast("long").alias("n_docs"),
            F.sum(kept).cast("long").alias("n_kept"),
            F.round(
                F.sum(kept).cast("double") / F.max("n"), 6
            ).alias("kept_rate"),
        )
        .orderBy("source", "lang")
    )


# --------------------------------------------------------------------------
# T24 — BPE tokenizer fertility census (operators/bpe.py): learn 48
# merges from the frequency HEAD of the word-frequency table (the only
# driver-side collect, <= VOCAB_HEAD_CAP entries by construction),
# tokenize each DISTINCT word once in a distributed Arrow-batched pass
# over the vocab table, and join the (word -> token-count) map back
# through the bounded head/tail split to report per-language fertility
# (BPE tokens per word / per char) — the number a tokenizer owner
# checks per language before fixing a vocab. The corpus path is pure
# JVM (explode + join); Python only ever touches the distributed vocab
# table, and nothing driver-side scales with raw token diversity.
# Rows-only by
# design: iterative merge learning is not expressible in the oracle's
# SQL; learn/apply parity is pytest-asserted against an independent
# reference implementation.
_BPE_MERGES = 48


@query("text_bpe_tokenize_fertility", None)
def text_bpe_tokenize_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_health_spark.operators.bpe import apply_bpe, learn_bpe

    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        "lang", F.explode(toks()).alias("word")
    ).localCheckpoint()  # vocab build and census join share one pass
    vocab_df = (
        words.groupBy("word").agg(F.count(F.lit(1)).alias("f")).localCheckpoint()
    )
    # Driver-side structure bound (round 7): ONLY the frequency head of
    # the vocab (<= VOCAB_HEAD_CAP entries by construction; singletons
    # always excluded) is collected for merge learning — merge statistics
    # are frequency-weighted, so the words below the floor contribute
    # noise-level weight (capped==uncapped agreement on the fixture is
    # pytest-asserted). Tokenization of the FULL vocab stays distributed:
    # one Arrow-batched pass over the |vocab| table with the tiny ranks
    # map closed over — Python never touches the corpus, and nothing
    # driver-side scales with raw token diversity.
    head = [
        (r.word, r.f)
        for r in vocab_df.where(
            F.col("f")
            >= vocab_df.agg(_vocab_floor_col("f")).collect()[0][0]
        ).collect()
    ]
    ranks = {p: i for i, p in enumerate(learn_bpe(head, _BPE_MERGES))}

    def _tokenize(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["n_bpe"] = [len(apply_bpe(w, ranks)) for w in pdf["word"]]
            yield pdf

    tokmap = vocab_df.mapInPandas(
        _tokenize, "word string, f long, n_bpe integer"
    )
    return (
        _join_vocab_bounded(words, tokmap, "word", "f")
        .drop("f")
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


# --------------------------------------------------------------------------
# T25 — Zipf-slope census per language: OLS slope of ln(frequency) vs
# ln(rank) over each language's head vocabulary — the corpus-statistics
# diagnostic (natural text sits near -1; templated/boilerplate corpora
# flatten, spam steepens) read next to T15's unigram surprise when
# triaging a new source. Scale: token counting is the same
# partial-aggregated (lang, token) shuffle as T10; before the per-lang
# ranking window, the count table is pruned by the per-language
# VOCAB_HEAD_CAP frequency floor (see _vocab_floor_col) so the window's
# input is bounded by the cap, never by raw token diversity — the
# slope's top-ZIPF_TOP_RANKS tokens of any zipfian corpus sit far above
# the floor. The fit itself is regr_slope over <= ZIPF_TOP_RANKS points
# per language, rounded to 6 dp (absorbs the <=1e-13 accumulation-order
# noise of a 50-term covariance).
ZIPF_TOP_RANKS = 50


@query(
    "text_zipf_slope",
    f"""
    WITH tok AS (
      SELECT lang, UNNEST(string_split(text, ' ')) AS token FROM documents
    ), c AS (
      SELECT lang, token, COUNT(*) AS cnt FROM tok GROUP BY 1, 2
    ), fl AS (
      SELECT lang,
             GREATEST(2, CEIL(SUM(cnt) / {VOCAB_HEAD_CAP})) AS floor_cnt
      FROM c GROUP BY lang
    ), ranked AS (
      SELECT c.lang, c.cnt,
             ROW_NUMBER() OVER (
               PARTITION BY c.lang ORDER BY c.cnt DESC, c.token) AS rnk
      FROM c JOIN fl ON c.lang = fl.lang AND c.cnt >= fl.floor_cnt
    )
    SELECT lang, COUNT(*) AS n_ranks,
           ROUND(REGR_SLOPE(LN(cnt), LN(rnk)), 6) AS zipf_slope
    FROM ranked WHERE rnk <= {ZIPF_TOP_RANKS}
    GROUP BY lang ORDER BY lang
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    counts = (
        docs.select("lang", F.explode(toks()).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # per-language frequency floor: the window below sorts at most
    # VOCAB_HEAD_CAP rows per language, regardless of raw diversity
    floors = counts.groupBy("lang").agg(
        _vocab_floor_col("cnt").alias("floor_cnt")
    )
    head = counts.join(F.broadcast(floors), "lang").where(
        F.col("cnt") >= F.col("floor_cnt")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), "token")
    ranked = head.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= ZIPF_TOP_RANKS
    )
    return (
        ranked.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_ranks"),
            F.round(
                F.regr_slope(F.log("cnt"), F.log("rnk")), 6
            ).alias("zipf_slope"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# T26 — hashed-feature linear quality scorer: the fasttext-style pattern
# every production quality classifier at corpus scale reduces to — per
# token, a weight looked up by HASH (no vocabulary, no embedding
# matrix), summed per document, thresholded. The weights here are
# hash-derived stand-ins for learned ones (the container has no model
# artifacts), but the PLAN is the real one: explode → inline per-token
# weight from md5 nibbles (pure JVM, whole-stage codegen) → one
# uniform doc_id groupBy with map-side partials. Zero broadcast state,
# zero driver state, linear in corpus size. Cross-engine exactness: the
# per-token weight is an INTEGER (md5 16-bit nibble value − 32768), the
# per-doc sum is exact integer arithmetic, and the only float op is one
# final division — no accumulation-order noise can split the engines.
def _hex_nibble(col, i: int):
    return F.instr(F.lit(_HEX), F.substring(F.md5(col), i, 1)) - 1


def _sql_nibble(expr: str, i: int) -> str:
    return f"(strpos('{_HEX}', substr(md5({expr}), {i}, 1)) - 1)"


@query(
    "text_hashed_linear_quality",
    f"""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
    ), weighted AS (
      SELECT doc_id,
             ((({_sql_nibble('w', 1)} * 16 + {_sql_nibble('w', 2)}) * 16
               + {_sql_nibble('w', 3)}) * 16 + {_sql_nibble('w', 4)})
               - 32768 AS w_int
      FROM tok
    )
    SELECT doc_id, COUNT(*) AS n_tok,
           ROUND(SUM(w_int) / (32768.0 * COUNT(*)), 6) AS quality_score,
           (SUM(w_int) >= 0) AS keep
    FROM weighted GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_hashed_linear_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(toks()).alias("w"))
    h4 = (
        (_hex_nibble("w", 1) * 16 + _hex_nibble("w", 2)) * 16
        + _hex_nibble("w", 3)
    ) * 16 + _hex_nibble("w", 4)
    return (
        words.select("doc_id", (h4 - 32768).cast("long").alias("w_int"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.round(
                F.sum("w_int") / (F.lit(32768.0) * F.count(F.lit(1))), 6
            ).alias("quality_score"),
            (F.sum("w_int") >= 0).alias("keep"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# T27 — bigram-LM cross-entropy scoring: the perplexity-filter signal
# (CCNet / Wenzek et al. 2020) at order 2 — score every document by the
# Laplace-smoothed corpus bigram model and surface the per-doc mean
# -ln p(w|prev), the number a quality gate thresholds on (T15 is the
# order-1 form). Counts are exact integers (c2, c1, |V|) and the only
# float ops are one division + one log per position, summed per doc and
# rounded to 6 dp — the same cross-engine envelope T15 passes under.
# Scale shape: bigram extraction is one JVM transform/explode pass; the
# bigram and context count tables are corpus-bounded but their join
# keys are zipfian-hot, so BOTH joins route through
# _join_vocab_bounded (AQE-delegated: runtime broadcast when the
# measured count table fits, skew-split shuffle for the hot keys
# otherwise); |V| is one scalar broadcast. Nothing
# driver-side scales with raw token diversity. The space-joined bigram
# key is collision-free because tokens are whitespace-split.
@query(
    "text_bigram_cross_entropy",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), bg AS (
      SELECT doc_id, t[CAST(i AS INT)] AS p, t[CAST(i + 1 AS INT)] AS w
      FROM t, UNNEST(range(1, len(t))) u(i)
      WHERE len(t) >= 2
    ), c2 AS (
      SELECT p, w, COUNT(*) AS c2 FROM bg GROUP BY 1, 2
    ), c1 AS (
      SELECT p, COUNT(*) AS c1 FROM bg GROUP BY 1
    ), v AS (
      SELECT COUNT(DISTINCT w) AS v
      FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           ROUND(SUM(-LN((c2.c2 + 1) / CAST(c1.c1 + v.v AS DOUBLE)))
                 / COUNT(*), 6) AS cross_entropy
    FROM bg JOIN c2 USING (p, w) JOIN c1 USING (p), v
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_bigram_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = docs.select("doc_id", toks().alias("t")).where(F.size("t") >= 2)
    bg = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2),"
                " i -> struct(t[i] AS p, t[i + 1] AS w))"
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.p").alias("p"), F.col("b.w").alias("w"))
    # materialization barriers: the head/tail split references the token
    # stream twice per join (4x nested) and each count table three times
    # (floor agg + head + tail) — without them the corpus explode and the
    # groupBys re-run per reference (same CollapseProject behavior the
    # minhash signature pass documents)
    bg = bg.withColumn("bk", F.concat_ws(" ", "p", "w")).localCheckpoint()
    c2 = (
        bg.groupBy("p", "w")
        .agg(F.count(F.lit(1)).alias("c2"))
        .select(F.concat_ws(" ", "p", "w").alias("bk"), "c2")
        .localCheckpoint()
    )
    c1 = bg.groupBy("p").agg(F.count(F.lit(1)).alias("c1")).localCheckpoint()
    v = (
        docs.select(F.explode(toks()).alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )
    scored = _join_vocab_bounded(bg, c2, "bk", "c2")
    scored = _join_vocab_bounded(scored, c1, "p", "c1")
    return (
        scored.crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(
                    -F.log(
                        (F.col("c2") + 1)
                        / (F.col("c1") + F.col("v")).cast("double")
                    )
                )
                / F.count(F.lit(1)),
                6,
            ).alias("cross_entropy"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# T29 — deterministic epoch shuffle: the training-order primitive — a
# content-hash permutation of the corpus per epoch (reshuffled between
# epochs, identical across reruns/engines, no RNG state to checkpoint).
# Positions come from a distributed two-phase rank (the pareto-census
# pattern): rank inside 256 hash-prefix buckets in parallel windows,
# then add a broadcast |buckets|-row prefix offset — no global
# single-task window at any size. The deliverable pins the WHOLE
# permutation (a modular position-weighted fingerprint over every doc)
# plus the exact head (md5 of the first 10 doc_ids in order), so a
# single transposition anywhere breaks the compare.
_EPOCHS = (0, 1)
_SHUF_P = 1_000_003  # fingerprint modulus: terms < 1e6, no overflow


@query(
    "corpus_epoch_shuffle",
    f"""
    WITH d AS (SELECT doc_id FROM documents),
    keyed AS (
      SELECT e.epoch, d.doc_id,
             md5(e.epoch || ':' || CAST(d.doc_id AS VARCHAR)) AS h
      FROM d, (SELECT UNNEST({list(_EPOCHS)}) AS epoch) e
    ), ranked AS (
      SELECT epoch, doc_id,
             ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY h, doc_id)
               AS pos
      FROM keyed
    )
    SELECT epoch, COUNT(*) AS n_docs,
           CAST(SUM((pos * 31 + doc_id) % {_SHUF_P}) AS BIGINT)
             AS perm_fingerprint,
           md5(string_agg(CASE WHEN pos <= 10
                               THEN CAST(doc_id AS VARCHAR) END,
                          ' ' ORDER BY pos)) AS head_hash
    FROM ranked
    GROUP BY epoch ORDER BY epoch
    """,
)
def corpus_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.createDataFrame(
        [(e,) for e in _EPOCHS], "epoch long"
    )
    keyed = docs.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat(
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ).alias("h"),
    )
    b = keyed.withColumn("bucket", F.substring("h", 1, 2))
    in_bucket = Window.partitionBy("epoch", "bucket").orderBy("h", "doc_id")
    local = b.withColumn("lr", F.row_number().over(in_bucket))
    counts = b.groupBy("epoch", "bucket").agg(
        F.count(F.lit(1)).alias("bn")
    )
    bw = Window.partitionBy("epoch").orderBy("bucket")  # 256 rows/epoch
    prefix = counts.withColumn(
        "off", F.coalesce(F.sum("bn").over(bw) - F.col("bn"), F.lit(0))
    ).select("epoch", "bucket", "off")
    ranked = local.join(F.broadcast(prefix), ["epoch", "bucket"]).select(
        "epoch", "doc_id", (F.col("off") + F.col("lr")).alias("pos")
    )
    return (
        ranked.groupBy("epoch")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                (F.col("pos") * 31 + F.col("doc_id")) % _SHUF_P
            ).cast("long").alias("perm_fingerprint"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.expr(
                        "transform(array_sort(collect_list(CASE WHEN pos <= 10"
                        " THEN struct(pos, doc_id) END)), x ->"
                        " CAST(x.doc_id AS STRING))"
                    ),
                )
            ).alias("head_hash"),
        )
        .orderBy("epoch")
    )


# --------------------------------------------------------------------------
# T30 — TRAINED quality classifier: full-batch logistic-regression
# gradient descent run as DataFrame aggregations (the broadcast-weights /
# aggregate-gradients pattern every distributed ML system uses: each
# iteration is ONE corpus pass computing dim gradient scalars; driver
# state is |dim| floats, never data). Features are the deterministic
# quality signals (bias, capped token count, punctuation ratio, stopword
# ratio), the label is the Gopher-ish word-count + stopword rule, and
# SIXTEEN unrolled iterations (lr=8, w0=0 — past the all-positive
# plateau: train_acc 0.866 vs the 0.758 majority baseline at sf0.01) are
# mirrored exactly in the
# DuckDB oracle — weights are rounded to 6 dp between iterations in both
# engines, so distributed-sum ulp noise cannot compound. Output: corpus
# size, class balance, the trained weight vector, and training accuracy
# on a 6 dp-rounded margin.
_LR_ITERS = 16
_LR_RATE = 8.0

_SQL_LR_FEATS = f"""
      SELECT CAST(len(string_split(text, ' ')) >= 20
                  AND len(list_filter(string_split(text, ' '),
                          t -> t IN ({_sql_list(STOPWORDS)}))) >= 2
             AS DOUBLE) AS y,
             1.0 AS f0,
             ROUND(LEAST(1.0, len(string_split(text, ' ')) / 50.0), 6) AS f1,
             ROUND((length(text) - length(regexp_replace(text,
                       '[^a-z0-9 ]', '', 'g'))) * 1.0 / length(text), 6)
               AS f2,
             ROUND(len(list_filter(string_split(text, ' '),
                       t -> t IN ({_sql_list(STOPWORDS)}))) * 1.0 /
                   len(string_split(text, ' ')), 6) AS f3
      FROM documents
"""


def _sql_lr_iter(i: int) -> str:
    """One unrolled GD iteration: gradient agg + 6 dp weight update."""
    z = f"(w{i}.w0 * f0 + w{i}.w1 * f1 + w{i}.w2 * f2 + w{i}.w3 * f3)"
    sig = f"(1.0 / (1.0 + EXP(-{z})))"
    return f"""
    g{i + 1} AS MATERIALIZED (
      SELECT AVG(({sig} - y) * f0) AS g0, AVG(({sig} - y) * f1) AS g1,
             AVG(({sig} - y) * f2) AS g2, AVG(({sig} - y) * f3) AS g3
      FROM feats CROSS JOIN w{i}
    ),
    w{i + 1} AS MATERIALIZED (
      SELECT ROUND(w0 - {_LR_RATE} * g0, 6) AS w0,
             ROUND(w1 - {_LR_RATE} * g1, 6) AS w1,
             ROUND(w2 - {_LR_RATE} * g2, 6) AS w2,
             ROUND(w3 - {_LR_RATE} * g3, 6) AS w3
      FROM g{i + 1} CROSS JOIN w{i}
    )"""


_SQL_LR = (
    f"""
    WITH feats AS MATERIALIZED ({_SQL_LR_FEATS}),
    w0 AS MATERIALIZED (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
    """
    + ",".join(_sql_lr_iter(i) for i in range(_LR_ITERS))
    + f"""
    SELECT (SELECT COUNT(*) FROM feats) AS n_docs,
           (SELECT CAST(SUM(y) AS BIGINT) FROM feats) AS n_pos,
           w0 AS weight_bias, w1 AS weight_toklen,
           w2 AS weight_punct, w3 AS weight_stop,
           (SELECT ROUND(AVG(CASE WHEN (ROUND(w.w0 * f.f0 + w.w1 * f.f1
                                              + w.w2 * f.f2 + w.w3 * f.f3,
                                              6) > 0) = (f.y = 1.0)
                                  THEN 1.0 ELSE 0.0 END), 6)
            FROM feats f CROSS JOIN w{_LR_ITERS} w) AS train_acc
    FROM w{_LR_ITERS}
    """
)


@query("text_quality_lr_train", _SQL_LR)
def text_quality_lr_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = toks()
    n_stop = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    n_tok = F.size(t)
    feats = docs.select(
        ((n_tok >= 20) & (n_stop >= 2)).cast("double").alias("y"),
        F.lit(1.0).alias("f0"),
        F.round(
            F.least(F.lit(1.0), n_tok.cast("double") / 50.0), 6
        ).alias("f1"),
        F.round(
            (
                F.length("text")
                - F.length(F.regexp_replace("text", "[^a-z0-9 ]", ""))
            ).cast("double")
            / F.length("text"),
            6,
        ).alias("f2"),
        F.round(n_stop.cast("double") / n_tok, 6).alias("f3"),
    ).localCheckpoint(eager=False)  # materialized by the first gradient
    # collect; every later pass re-reads the persisted rows (lazy saves
    # the standalone materialization job, r13)

    w = [0.0, 0.0, 0.0, 0.0]
    fcols = ["f0", "f1", "f2", "f3"]
    for _ in range(_LR_ITERS):
        z = sum(F.lit(w[j]) * F.col(fcols[j]) for j in range(4))
        sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        grad = feats.agg(
            *[
                F.avg((sig - F.col("y")) * F.col(fcols[j])).alias(f"g{j}")
                for j in range(4)
            ]
        ).collect()[0]
        w = [round(w[j] - _LR_RATE * grad[f"g{j}"], 6) for j in range(4)]

    zf = F.round(sum(F.lit(w[j]) * F.col(fcols[j]) for j in range(4)), 6)
    return feats.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("y").cast("long").alias("n_pos"),
        F.round(F.avg(
            F.when((zf > 0) == (F.col("y") == 1.0), 1.0).otherwise(0.0)
        ), 6).alias("train_acc"),
    ).select(
        "n_docs",
        "n_pos",
        F.lit(w[0]).alias("weight_bias"),
        F.lit(w[1]).alias("weight_toklen"),
        F.lit(w[2]).alias("weight_punct"),
        F.lit(w[3]).alias("weight_stop"),
        "train_acc",
    )


# --------------------------------------------------------------------------
# T31 — exact-k priority sample per stratum (r8): the k=3 docs with the
# SMALLEST md5 priority per (source, lang) cell, with rank and a stable
# content fingerprint. Fraction-based samplers (T23, T12) can't promise
# exact cell sizes; bounded eval/holdout sets need exactly-k — and a
# hash priority makes the sample reproducible across engines, runs, and
# partitionings with no RNG state (priority sampling / bottom-k; the
# per-key reservoir every curation pipeline keeps). One shuffle on the
# stratum key for the rank window; nothing driver-side.
_PRIORITY_K = 3


@query(
    "documents_priority_sample_k",
    f"""
    WITH ranked AS (
      SELECT source, lang, doc_id,
             md5(CAST(doc_id AS VARCHAR) || ':' || text) AS priority,
             ROW_NUMBER() OVER (
               PARTITION BY source, lang
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':' || text), doc_id
             ) AS rank
      FROM documents
    )
    SELECT source, lang, rank, doc_id, priority
    FROM ranked WHERE rank <= {_PRIORITY_K}
    ORDER BY source, lang, rank
    """,
)
def documents_priority_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    prio = F.md5(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text"))
    )
    w = Window.partitionBy("source", "lang").orderBy(prio, "doc_id")
    return (
        docs.select(
            "source", "lang", "doc_id", prio.alias("priority"),
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= _PRIORITY_K)
        .select("source", "lang", "rank", "doc_id", "priority")
        .orderBy("source", "lang", "rank")
    )


# --------------------------------------------------------------------------
# T32 — DSIR importance-resampling weights (Xie et al., NeurIPS 2023,
# "Data Selection for Language Models via Importance Resampling"): score
# every raw document by how much more likely its hashed-bigram bag is
# under a TARGET domain's unigram feature LM than under the raw corpus'.
# Here target = the src0/src1 sources (the "high-quality domain" stand-in
# the paper instantiates with Wikipedia+books). Features are bigrams
# hashed into 256 md5 buckets — the paper's hashed n-gram trick, which is
# what keeps the model size fixed (256 counts per side) no matter how
# large the raw corpus' token diversity grows; the per-bucket log-ratio
# table is broadcast back over the exploded grams, so the whole pass is
# one narrow map + one 256-key aggregate + one per-doc aggregate. No
# structure anywhere scales with |vocab| or |corpus|.
_DSIR_B = 256
_DSIR_TARGET = ("src0", "src1")


def _spark_bucket256_of(col: str):
    """md5-based 256-bucket of an arbitrary string column (the
    engine-portable hash the split/sample helpers use, generalized)."""
    return (
        F.instr(F.lit(_HEX), F.substring(F.md5(col), 31, 1)) - 1
    ) * 16 + (F.instr(F.lit(_HEX), F.substring(F.md5(col), 32, 1)) - 1)


@query(
    "text_dsir_weights",
    f"""
    WITH t AS (
      SELECT doc_id, source, string_split(text, ' ') AS tk
      FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ), bg AS (
      SELECT doc_id, source,
             (strpos('{_HEX}', substr(md5(tk[CAST(i AS INT)] || ' ' ||
                 tk[CAST(i + 1 AS INT)]), 31, 1)) - 1) * 16 +
             (strpos('{_HEX}', substr(md5(tk[CAST(i AS INT)] || ' ' ||
                 tk[CAST(i + 1 AS INT)]), 32, 1)) - 1) AS b
      FROM t, UNNEST(range(1, len(tk))) u(i)
    ), cnt AS (
      SELECT b, COUNT(*) AS c_r,
             SUM(CASE WHEN source IN {_DSIR_TARGET!r} THEN 1 ELSE 0 END) AS c_t
      FROM bg GROUP BY b
    ), tot AS (
      SELECT SUM(c_r) AS n_r, SUM(c_t) AS n_t FROM cnt
    ), lr AS (
      SELECT b,
             ln((c_t + 1.0) / (n_t + {_DSIR_B}.0))
               - ln((c_r + 1.0) / (n_r + {_DSIR_B}.0)) AS lr
      FROM cnt CROSS JOIN tot
    )
    SELECT bg.doc_id, bg.source,
           COUNT(*) AS n_feats,
           ROUND(SUM(lr.lr), 6) AS dsir_logw
    FROM bg JOIN lr USING (b)
    GROUP BY bg.doc_id, bg.source
    ORDER BY bg.doc_id
    """,
)
def text_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = toks()
    grams = (
        docs.where(F.size(t) >= 2)
        .select("doc_id", "source", t.alias("tk"))
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 1),"
                    " i -> concat_ws(' ', tk[i - 1], tk[i]))"
                )
            ).alias("g"),
        )
        .select(
            "doc_id", "source", _spark_bucket256_of("g").alias("b")
        )
    )
    in_target = F.col("source").isin(*_DSIR_TARGET)
    # r14 (guide §2.3/§2.4): aggregate the gram explode ONCE to
    # per-(doc, bucket) counts — the before-plan showed the full
    # explode+hash pass running twice (bucket census + per-doc weight
    # join had no common subtree). dbc is bounded by |docs| x 256 rows;
    # the census and the weighting both derive from it, and map-side
    # partial aggregation now happens before the only wide shuffle.
    # Per-doc sum becomes sum(lr * n) over bucket groups — exact for
    # n_feats (integer), and dsir_logw's 6-dp rounding absorbs the
    # ulp-level reassociation exactly as it already absorbs
    # Spark-vs-DuckDB partial-sum order (oracle hash-match re-proved).
    dbc = (
        grams.groupBy("doc_id", "source", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)  # census + weight join share it
    )
    cnt = dbc.groupBy("b").agg(
        F.sum("n").alias("c_r"),
        F.sum(F.when(in_target, F.col("n")).otherwise(0)).alias("c_t"),
    )
    tot = cnt.agg(
        F.sum("c_r").alias("n_r"), F.sum("c_t").alias("n_t")
    )
    lr = cnt.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("c_t") + 1.0) / (F.col("n_t") + float(_DSIR_B)))
            - F.log((F.col("c_r") + 1.0) / (F.col("n_r") + float(_DSIR_B)))
        ).alias("lr"),
    )
    return (
        dbc.join(F.broadcast(lr), "b")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("n").cast("long").alias("n_feats"),
            F.round(F.sum(F.col("lr") * F.col("n")), 6).alias("dsir_logw"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# T33 — BM25 lexical retrieval (Robertson & Zaragoza 2009, the Okapi
# weighting; idf in the Lucene form ln(1 + (N-df+0.5)/(df+0.5))): the
# classical sparse-retrieval scorer the dense ANN family (S1..S17)
# complements — production retrieval almost always fuses both. One
# narrow token pass restricted to the query terms, a |Q|-row df/idf
# broadcast, per-doc score fold, top-20 by 6-dp-rounded score (the
# k-means protocol: rounding before ranking is what makes the DuckDB
# oracle's ordering bit-identical). Nothing scales with |vocab| — only
# query-term postings are ever materialized.
_BM25_QUERY = ("hash", "join", "vector")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOP = 20


_BM25_ORACLE = f"""
    WITH dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dlen FROM documents
    ), stats AS (
      SELECT COUNT(*) AS n_docs,
             SUM(dlen) * 1.0 / COUNT(*) AS avgdl
      FROM dl
    ), tf AS (
      SELECT doc_id, w, COUNT(*) AS tf
      FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
            FROM documents)
      WHERE w IN {_BM25_QUERY!r}
      GROUP BY doc_id, w
    ), idf AS (
      SELECT w, ln(1 + (n_docs - df + 0.5) / (df + 0.5)) AS idf
      FROM (SELECT w, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY w)
      CROSS JOIN stats
    ), scored AS (
      SELECT tf.doc_id,
             SUM(idf.idf * tf.tf * ({_BM25_K1} + 1) /
                 (tf.tf + {_BM25_K1} * (1 - {_BM25_B} +
                  {_BM25_B} * dl.dlen / stats.avgdl))) AS score
      FROM tf
      JOIN idf USING (w)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, ROUND(score, 6) AS bm25,
           ROW_NUMBER() OVER (ORDER BY ROUND(score, 6) DESC, doc_id)
             AS rank
    FROM scored
    ORDER BY rank LIMIT {_BM25_TOP}
    """


@query("text_bm25_topk", _BM25_ORACLE)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    t = toks()
    dl = docs.select("doc_id", F.size(t).alias("dlen"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dlen") * 1.0 / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        docs.select("doc_id", F.explode(t).alias("w"))
        .where(F.col("w").isin(*_BM25_QUERY))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = (
        tf.groupBy("w")
        .agg(F.countDistinct("doc_id").alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "w",
            F.log(
                1
                + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            ).alias("idf"),
        )
    )
    part = (
        F.col("idf")
        * F.col("tf")
        * (_BM25_K1 + 1)
        / (
            F.col("tf")
            + _BM25_K1
            * (1 - _BM25_B + _BM25_B * F.col("dlen") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(idf), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(part), 6).alias("bm25"))
    )
    top = scored.orderBy(F.desc("bm25"), "doc_id").limit(_BM25_TOP)
    w = Window.orderBy(F.desc("bm25"), "doc_id")
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("doc_id", "bm25", "rank")
        .orderBy("rank")
    )


# --------------------------------------------------------------------------
# T34 — BM25 served from the PERSISTED index (VERDICT r10 #4): the same
# oracle as text_bm25_topk, but the Spark side answers from the
# three-table Delta artifact (operators/text_index.py) built once per
# (machine, sf_dir) — the production lexical-retrieval path: postings
# clustered by term so the probe file-prunes, stats a broadcast row,
# df derived from the probed postings. Proves artifact build + pruned
# serve end-to-end against the independent engine.
def bm25_index_path(sf_dir: str) -> str:
    """The per-sf_dir /tmp location of the served-BM25 artifact — ONE
    definition, shared with bench.py's force-rebuild so the two can
    never drift."""
    import os

    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    return f"/tmp/delta_lake_health_spark_fixture/bm25_index_{tag}"


@query("text_bm25_served", _BM25_ORACLE)
def text_bm25_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from delta_lake_health_spark.operators.text_index import (
        bm25_search,
        build_bm25_index,
    )
    from delta_lake_health_spark.sources.fixture import build_once

    path = bm25_index_path(sf_dir)
    marker = os.path.join(path, "_BM25IX_COMPLETE")

    def build() -> None:
        build_bm25_index(
            spark,
            load(spark, sf_dir, "documents").select("doc_id", "text"),
            path,
        )

    from delta_lake_health_spark.operators import text_index as _ti

    # deps: the functions whose behavior defines the artifact — editing
    # the index builder or the tokenizer must rebuild, not serve stale
    build_once(
        marker,
        build,
        clean=[path],
        salt=sf_dir,
        deps=(
            _ti.build_bm25_index,
            _ti._index_rows,
            _ti._one_row_per_doc,
            _ti._doc_terms,
        ),
    )
    return bm25_search(
        spark, path, _BM25_QUERY, k1=_BM25_K1, b=_BM25_B, top=_BM25_TOP
    )


# --------------------------------------------------------------------------
# T35 — fixed-stride token chunking census (r11): the RAG /
# training-prep chunker — every doc splits into CHUNK_LEN-token windows
# advancing by CHUNK_STRIDE (CHUNK_LEN - CHUNK_STRIDE tokens of
# overlap), short docs yield one chunk, and the census aggregates the
# materialized chunk table per chunk index. Spark-first: the chunk
# table is an explode of a per-doc closed-form ``sequence`` of starts —
# one narrow pass, no UDF, |chunks| rows; the census output is bounded
# by max-doc-length / stride, a domain bound. Complements
# text_pack_sequences (dense packing) with the overlapping-window
# serving shape.
_CHUNK_LEN = 64
_CHUNK_STRIDE = 48


@query(
    "text_chunk_census",
    f"""
    WITH sized AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
    ), docs AS (
      SELECT doc_id, n,
             CASE WHEN n <= {_CHUNK_LEN} THEN 1
                  ELSE 1 + CAST(CEIL((n - {_CHUNK_LEN}) * 1.0
                                      / {_CHUNK_STRIDE}) AS BIGINT)
             END AS n_chunks
      FROM sized
    ), chunks AS (
      SELECT doc_id,
             UNNEST(generate_series(0, CAST(n_chunks - 1 AS BIGINT)))
               AS chunk_idx,
             n
      FROM docs
    )
    SELECT CAST(chunk_idx AS BIGINT) AS chunk_idx,
           COUNT(*) AS n_chunks,
           CAST(SUM(LEAST({_CHUNK_LEN},
                          n - chunk_idx * {_CHUNK_STRIDE}))
                AS BIGINT) AS sum_len,
           ROUND(AVG(LEAST({_CHUNK_LEN},
                           n - chunk_idx * {_CHUNK_STRIDE})), 6)
             AS avg_len
    FROM chunks
    GROUP BY 1 ORDER BY 1
    """,
)
def text_chunk_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    sized = docs.select("doc_id", F.size(toks()).cast("long").alias("n"))
    n_chunks = F.when(F.col("n") <= _CHUNK_LEN, F.lit(1)).otherwise(
        1
        + F.ceil(
            (F.col("n") - _CHUNK_LEN) * 1.0 / _CHUNK_STRIDE
        ).cast("long")
    )
    chunks = sized.withColumn("n_chunks", n_chunks).select(
        "doc_id",
        "n",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("n_chunks") - 1)
        ).alias("chunk_idx"),
    )
    clen = F.least(
        F.lit(_CHUNK_LEN).cast("long"),
        F.col("n") - F.col("chunk_idx") * _CHUNK_STRIDE,
    )
    return (
        chunks.groupBy("chunk_idx")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(clen).cast("long").alias("sum_len"),
            F.round(F.avg(clen), 6).alias("avg_len"),
        )
        .orderBy("chunk_idx")
    )


# --------------------------------------------------------------------------
# T37 — chunk-granular BM25 retrieval (VERDICT r11 #5: T35's chunker ×
# T33's scorer — the RAG serving shape): score CHUNKS as the retrieval
# unit (chunk-level tf/df/length norms), dedup to the best chunk per
# document, return the global top-k chunks. Spark-first: the chunk
# table is the same closed-form sequence-explode as the census (one
# codegen pass, |chunks| rows, no UDF), scoring is the T33 broadcast
# pipeline over chunk keys, the per-doc dedup is a PARTITIONED window,
# and only the ≤top survivors see a global rank window.
# ONE definition of the oracle-side chunk construction (shared by T37
# and the T38 hybrid so the chunk layout can never drift between them).
_SQL_CHUNK_CTES = f"""sized AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ), cdocs AS (
      SELECT doc_id, toks,
             CASE WHEN n <= {_CHUNK_LEN} THEN 1
                  ELSE 1 + CAST(CEIL((n - {_CHUNK_LEN}) * 1.0
                                      / {_CHUNK_STRIDE}) AS BIGINT)
             END AS n_chunks
      FROM sized
    ), chunks AS (
      SELECT doc_id, chunk_idx,
             toks[chunk_idx * {_CHUNK_STRIDE} + 1 :
                  chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_LEN}] AS ctoks
      FROM (SELECT doc_id, toks,
                   CAST(UNNEST(generate_series(0,
                        CAST(n_chunks - 1 AS BIGINT))) AS BIGINT)
                     AS chunk_idx
            FROM cdocs)
    )"""


def _chunk_frames(docs: DataFrame) -> DataFrame:
    """(doc_id, chunk_idx, ctoks) — the Spark-side chunk table, ONE
    closed-form sequence-explode shared by T37 and the T38 hybrid (the
    same single-definition rule as the oracle CTE above)."""
    t = toks()
    sized = docs.select(
        "doc_id", t.alias("toks"), F.size(t).cast("long").alias("n")
    )
    n_chunks = F.when(F.col("n") <= _CHUNK_LEN, F.lit(1)).otherwise(
        1
        + F.ceil(
            (F.col("n") - _CHUNK_LEN) * 1.0 / _CHUNK_STRIDE
        ).cast("long")
    )
    return sized.withColumn("n_chunks", n_chunks).select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("n_chunks") - 1)
        ).alias("chunk_idx"),
        F.slice(
            F.col("toks"),
            (F.col("chunk_idx") * _CHUNK_STRIDE + 1).cast("int"),
            F.lit(_CHUNK_LEN),
        ).alias("ctoks"),
    )


@query(
    "text_chunk_bm25_topk",
    f"""
    WITH {_SQL_CHUNK_CTES}, cdl AS (
      SELECT doc_id, chunk_idx, len(ctoks) AS dlen
      FROM chunks
    ), stats AS (
      SELECT COUNT(*) AS n_chunks,
             SUM(dlen) * 1.0 / COUNT(*) AS avgdl
      FROM cdl
    ), tf AS (
      SELECT doc_id, chunk_idx, w, COUNT(*) AS tf
      FROM (SELECT doc_id, chunk_idx, UNNEST(ctoks) AS w
            FROM chunks)
      WHERE w IN {_BM25_QUERY!r}
      GROUP BY doc_id, chunk_idx, w
    ), idf AS (
      SELECT w, ln(1 + (n_chunks - df + 0.5) / (df + 0.5)) AS idf
      FROM (SELECT w, COUNT(*) AS df FROM tf GROUP BY w)
      CROSS JOIN stats
    ), scored AS (
      SELECT tf.doc_id, tf.chunk_idx,
             ROUND(SUM(idf.idf * tf.tf * ({_BM25_K1} + 1) /
                 (tf.tf + {_BM25_K1} * (1 - {_BM25_B} +
                  {_BM25_B} * cdl.dlen / stats.avgdl))), 6) AS bm25
      FROM tf
      JOIN idf USING (w)
      JOIN cdl USING (doc_id, chunk_idx)
      CROSS JOIN stats
      GROUP BY tf.doc_id, tf.chunk_idx
    ), best AS (
      SELECT doc_id, chunk_idx, bm25
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                        ORDER BY bm25 DESC, chunk_idx) AS rn
            FROM scored)
      WHERE rn = 1
    )
    SELECT doc_id, chunk_idx, bm25,
           ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id, chunk_idx)
             AS rank
    FROM best
    ORDER BY rank LIMIT {_BM25_TOP}
    """,
)
def text_chunk_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return _chunk_bm25_rank(spark, _chunk_frames(docs))


def _chunk_bm25_rank(spark: SparkSession, chunks: DataFrame) -> DataFrame:
    """T37's ranking from an existing (doc_id, chunk_idx, ctoks) frame —
    split out (r14) so the T38 hybrid can share ONE materialized chunk
    table between its two arms instead of re-tokenizing the corpus per
    arm."""
    from pyspark.sql.window import Window

    cdl = chunks.select(
        "doc_id", "chunk_idx", F.size("ctoks").cast("long").alias("dlen")
    )
    stats = cdl.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        (F.sum("dlen") * 1.0 / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        chunks.select("doc_id", "chunk_idx", F.explode("ctoks").alias("w"))
        .where(F.col("w").isin(*_BM25_QUERY))
        .groupBy("doc_id", "chunk_idx", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = (
        tf.groupBy("w")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "w",
            F.log(
                1
                + (F.col("n_chunks") - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            ).alias("idf"),
        )
    )
    part = (
        F.col("idf")
        * F.col("tf")
        * (_BM25_K1 + 1)
        / (
            F.col("tf")
            + _BM25_K1
            * (1 - _BM25_B + _BM25_B * F.col("dlen") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(idf), "w")
        .join(cdl, ["doc_id", "chunk_idx"])
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id", "chunk_idx")
        .agg(F.round(F.sum(part), 6).alias("bm25"))
    )
    per_doc = Window.partitionBy("doc_id").orderBy(
        F.desc("bm25"), "chunk_idx"
    )
    best = (
        scored.withColumn("rn", F.row_number().over(per_doc))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    top = best.orderBy(F.desc("bm25"), "doc_id", "chunk_idx").limit(
        _BM25_TOP
    )
    w = Window.orderBy(F.desc("bm25"), "doc_id", "chunk_idx")
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("doc_id", "chunk_idx", "bm25", "rank")
        .orderBy("rank")
    )


# --------------------------------------------------------------------------
# T38 — chunk-granular HYBRID retrieval (VERDICT r12 #6): T37's
# chunk-BM25 lexical arm fused with a dense arm over chunk embeddings
# by S18's reciprocal-rank fusion — the standard RAG hybrid at the
# chunk granularity production serves. The dense featurizer is a
# deterministic 16-dim hashed bag-of-words (token dim = first md5 hex
# nibble — the same md5-derived hash family every dedup oracle uses),
# so both arms AND the fusion replay exactly in SQL: the oracle nests
# T37's full oracle as the lexical arm, mirrors the dense arm, and
# fuses with the ann_rrf_fusion CTE shape. Scale shape: the dense arm
# is one narrow explode + two bounded groupBys (16-dim vectors, the
# query side a constant broadcast), each arm dedups per-doc with a
# PARTITIONED window, and only the <=2*top fused survivors see a
# global rank window.
import hashlib as _hashlib  # noqa: E402
import math as _math  # noqa: E402

_HYBRID_RRF_K = 60


def _tok_dim(w: str) -> int:
    """First md5 hex nibble — matches the SQL/Spark expression
    ``strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1``."""
    return int(_hashlib.md5(w.encode()).hexdigest()[0], 16)


_QDIMS: dict[int, int] = {}
for _w in _BM25_QUERY:
    _QDIMS[_tok_dim(_w)] = _QDIMS.get(_tok_dim(_w), 0) + 1
_QNORM = _math.sqrt(sum(c * c for c in _QDIMS.values()))
_SQL_QDIMS = ", ".join(f"({d}, {c})" for d, c in sorted(_QDIMS.items()))
_DIM_EXPR = "instr('0123456789abcdef', substring(md5(w), 1, 1)) - 1"


def _chunk_dense_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return _chunk_dense_rank(spark, _chunk_frames(docs))


def _chunk_dense_rank(spark: SparkSession, chunks: DataFrame) -> DataFrame:
    """The dense arm: exact cosine between the hashed-BoW chunk vectors
    and the (constant) hashed query vector, best chunk per doc, global
    top-k — S1's exact-cosine shape at chunk granularity. Takes the
    chunk frame so the hybrid can share it (r14)."""
    from pyspark.sql.window import Window

    dims = (
        chunks.select(
            "doc_id", "chunk_idx", F.explode("ctoks").alias("w")
        )
        .withColumn("dim", F.expr(_DIM_EXPR))
        .groupBy("doc_id", "chunk_idx", "dim")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    nrm = dims.groupBy("doc_id", "chunk_idx").agg(
        F.sqrt(F.sum(F.col("cnt") * F.col("cnt"))).alias("nrm")
    )
    qd = spark.createDataFrame(
        sorted(_QDIMS.items()), "dim int, qcnt int"
    )
    dot = (
        dims.join(F.broadcast(qd), "dim")
        .groupBy("doc_id", "chunk_idx")
        .agg(F.sum(F.col("cnt") * F.col("qcnt")).alias("dp"))
    )
    cos = dot.join(nrm, ["doc_id", "chunk_idx"]).select(
        "doc_id",
        "chunk_idx",
        F.round(
            F.col("dp") / (F.col("nrm") * F.lit(_QNORM)), 6
        ).alias("cosine"),
    )
    per_doc = Window.partitionBy("doc_id").orderBy(
        F.desc("cosine"), "chunk_idx"
    )
    best = (
        cos.withColumn("rn", F.row_number().over(per_doc))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    top = best.orderBy(F.desc("cosine"), "doc_id", "chunk_idx").limit(
        _BM25_TOP
    )
    w = Window.orderBy(F.desc("cosine"), "doc_id", "chunk_idx")
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("doc_id", "chunk_idx", "cosine", "rank")
    )


@query(
    "text_chunk_hybrid_topk",
    # assembled below once T37's oracle exists in ORACLE
    None,
)
def text_chunk_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    # ONE chunk tokenization shared by both arms (r14, VERDICT r13 #4):
    # each arm used to rebuild _chunk_frames from the raw corpus — two
    # full split+explode passes for identical rows. The lazy checkpoint
    # materializes inside the fused action's job; both arms read the
    # stored partitions (and the plan the optimizer sees is half the
    # size, cutting planning time for this 700-line plan).
    chunks = _chunk_frames(load(spark, sf_dir, "documents")).localCheckpoint(
        eager=False
    )
    lex = _chunk_bm25_rank(spark, chunks).select(
        "doc_id", "chunk_idx", F.col("rank").alias("rn")
    )
    den = _chunk_dense_rank(spark, chunks).select(
        "doc_id", "chunk_idx", F.col("rank").alias("rn")
    )
    fused = (
        lex.unionByName(den)
        .groupBy("doc_id", "chunk_idx")
        .agg(
            F.round(
                F.sum(1.0 / (F.lit(_HYBRID_RRF_K) + F.col("rn"))), 6
            ).alias("rrf")
        )
    )
    top = fused.orderBy(F.desc("rrf"), "doc_id", "chunk_idx").limit(
        _BM25_TOP
    )
    w = Window.orderBy(F.desc("rrf"), "doc_id", "chunk_idx")
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("doc_id", "chunk_idx", "rrf", "rank")
        .orderBy("rank")
    )


ORACLE["text_chunk_hybrid_topk"] = f"""
    WITH r1 AS ({ORACLE["text_chunk_bm25_topk"]}),
    r2 AS (
      WITH {_SQL_CHUNK_CTES}, ddims AS (
        SELECT doc_id, chunk_idx,
               (strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1)
                 AS dim,
               COUNT(*) AS cnt
        FROM (SELECT doc_id, chunk_idx, UNNEST(ctoks) AS w FROM chunks)
        GROUP BY 1, 2, 3
      ), dnorm AS (
        SELECT doc_id, chunk_idx, sqrt(SUM(cnt * cnt)) AS nrm
        FROM ddims GROUP BY 1, 2
      ), qdims(dim, qcnt) AS (VALUES {_SQL_QDIMS}),
      dotp AS (
        SELECT d.doc_id, d.chunk_idx, SUM(d.cnt * q.qcnt) AS dp
        FROM ddims d JOIN qdims q ON q.dim = d.dim
        GROUP BY 1, 2
      ), cosd AS (
        SELECT dotp.doc_id, dotp.chunk_idx,
               ROUND(dp / (nrm * CAST({_QNORM!r} AS DOUBLE)), 6)
                 AS cosine
        FROM dotp JOIN dnorm USING (doc_id, chunk_idx)
      ), dbest AS (
        SELECT doc_id, chunk_idx, cosine
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                  ORDER BY cosine DESC, chunk_idx) AS rn FROM cosd)
        WHERE rn = 1
      )
      SELECT doc_id, chunk_idx,
             ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id, chunk_idx)
               AS rank
      FROM dbest
      ORDER BY rank LIMIT {_BM25_TOP}
    ),
    u AS (
      SELECT doc_id, chunk_idx, rank AS rn FROM r1
      UNION ALL
      SELECT doc_id, chunk_idx, rank AS rn FROM r2
    ), f AS (
      SELECT doc_id, chunk_idx,
             ROUND(SUM(1.0 / ({_HYBRID_RRF_K} + rn)), 6) AS rrf
      FROM u GROUP BY 1, 2
    ), ranked AS (
      SELECT doc_id, chunk_idx, rrf,
             ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id, chunk_idx)
               AS rank
      FROM f
    )
    SELECT doc_id, chunk_idx, rrf, rank
    FROM ranked WHERE rank <= {_BM25_TOP}
    ORDER BY rank
    """


# --------------------------------------------------------------------------
# T36 — HTML boilerplate removal census (VERDICT r11 #10): the real
# first stage of a web-crawl pipeline. The corpus has no raw-HTML
# column, so each doc is wrapped in a DETERMINISTIC page template
# (head/style/script, a nav whose link count varies by doc_id, a
# read-more footer) inside the query itself — identically in both
# engines — then stripped back to main text with one chain of regexp
# passes: drop <script>/<style>/<nav> blocks, measure residual link
# text (the link-density heuristic's signal), strip remaining tags,
# collapse whitespace. All codegen'd regexp ops, no UDF; the census
# buckets docs by boilerplate-removed decile (INTEGER permille math —
# no float decile boundaries), bounded at 11 rows by construction.
_HTML_WRAP_SQL = (
    "'<html><head><title>D' || doc_id || '</title>"
    "<style>p{margin:0}</style>"
    "<script>var a=' || doc_id || ';</script></head><body>"
    "<nav>' || repeat('<a href=\"/nav\">section</a>', "
    "CAST(1 + doc_id % 4 AS INT)) || '</nav>"
    "<p>' || text || '</p>"
    "<div><a href=\"/more\">read more</a></div></body></html>'"
)
_RE_SCRIPT = "(?s)<script[^>]*>.*?</script>"
_RE_STYLE = "(?s)<style[^>]*>.*?</style>"
_RE_NAV = "(?s)<nav[^>]*>.*?</nav>"
_RE_LINK = "(?s)<a [^>]*>(.*?)</a>"
_RE_TAG = "<[^>]*>"


@query(
    "text_html_boilerplate",
    f"""
    WITH pages AS (
      SELECT doc_id, {_HTML_WRAP_SQL} AS html FROM documents
    ), stripped AS (
      SELECT doc_id, html,
             regexp_replace(regexp_replace(regexp_replace(html,
               '{_RE_SCRIPT}', ' ', 'g'),
               '{_RE_STYLE}', ' ', 'g'),
               '{_RE_NAV}', ' ', 'g') AS noblocks
      FROM pages
    ), main AS (
      SELECT doc_id,
             len(html) AS html_len,
             trim(regexp_replace(regexp_replace(noblocks,
               '{_RE_TAG}', ' ', 'g'), '\\s+', ' ', 'g')) AS main_text,
             COALESCE(list_sum(list_transform(
               regexp_extract_all(noblocks, '{_RE_LINK}', 1),
               x -> len(x))), 0) AS link_chars
      FROM stripped
    ), per_doc AS (
      SELECT doc_id, html_len, len(main_text) AS main_len, link_chars,
             html_len - len(main_text) AS removed
      FROM main
    )
    SELECT CAST((10 * removed) // html_len AS BIGINT) AS decile,
           COUNT(*) AS n_docs,
           ROUND(AVG(removed * 1.0 / html_len), 6) AS avg_removed,
           ROUND(AVG(link_chars * 1000.0
                     / GREATEST(main_len, 1)), 6) AS avg_link_permille,
           CAST(SUM(main_len) AS BIGINT) AS sum_main_len
    FROM per_doc
    GROUP BY 1 ORDER BY 1
    """,
)
def text_html_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pages = docs.select(
        "doc_id",
        F.expr(
            "'<html><head><title>D' || doc_id || '</title>"
            "<style>p{margin:0}</style>"
            "<script>var a=' || doc_id || ';</script></head><body>"
            "<nav>' || repeat('<a href=\"/nav\">section</a>', "
            "CAST(1 + doc_id % 4 AS INT)) || '</nav>"
            "<p>' || text || '</p>"
            "<div><a href=\"/more\">read more</a></div></body></html>'"
        ).alias("html"),
    )
    noblocks = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("html"), _RE_SCRIPT, " "),
            _RE_STYLE,
            " ",
        ),
        _RE_NAV,
        " ",
    )
    stripped = pages.select("doc_id", "html", noblocks.alias("noblocks"))
    main = stripped.select(
        "doc_id",
        F.length("html").cast("long").alias("html_len"),
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.col("noblocks"), _RE_TAG, " "),
                r"\s+",
                " ",
            )
        ).alias("main_text"),
        F.coalesce(
            F.expr(
                f"aggregate(regexp_extract_all(noblocks, '{_RE_LINK}', 1),"
                " 0L, (a, x) -> a + length(x))"
            ),
            F.lit(0),
        ).alias("link_chars"),
    )
    per_doc = main.select(
        "doc_id",
        "html_len",
        F.length("main_text").cast("long").alias("main_len"),
        "link_chars",
        (F.col("html_len") - F.length("main_text")).alias("removed"),
    )
    return (
        per_doc.groupBy(
            F.expr("10 * removed div html_len").alias("decile")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.avg(F.col("removed") * 1.0 / F.col("html_len")), 6
            ).alias("avg_removed"),
            F.round(
                F.avg(
                    F.col("link_chars")
                    * 1000.0
                    / F.greatest(F.col("main_len"), F.lit(1))
                ),
                6,
            ).alias("avg_link_permille"),
            F.sum("main_len").cast("long").alias("sum_main_len"),
        )
        .orderBy("decile")
    )
