"""Semantic invariants for the round-7 query additions (their oracle
parity is covered by the parametrized family tests in
test_pipeline_plans.py / test_similarity.py; these pin the properties
the oracle comparison alone can't see — distribution laws, containment
vs the exact baseline, and the at-scale plan shape)."""

from __future__ import annotations

from tests.conftest import SF_DIR, SF_ORACLE


def test_markov_rows_are_a_distribution_per_src(spark):
    """Outgoing transition probabilities sum to 1 per src (up to the
    6 dp round), and total transitions = n_events - n_active_users
    (each user's last event has no successor)."""
    from delta_lake_health_spark.plans.events import QUERIES

    rows = QUERIES["events_markov_transitions"](spark, SF_ORACLE).collect()
    by_src: dict[str, float] = {}
    total = 0
    for r in rows:
        by_src[r.src] = by_src.get(r.src, 0.0) + r.p_transition
        total += r.n_transitions
    for src, p in by_src.items():
        assert abs(p - 1.0) < 1e-4, f"{src}: sum(p)={p}"
    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert total == n_events - n_users


def test_decay_scores_bounded_by_undecayed_sum(spark):
    """All event values are positive, the decay weight is in (0, 1], and
    a user's newest event has weight exactly 1 — so per user:
    0 < decayed_value <= sum(value)."""
    from pyspark.sql import functions as F

    from delta_lake_health_spark.plans.events import QUERIES

    got = {
        r.user_id: r
        for r in QUERIES["events_user_decay_scores"](spark, SF_ORACLE).collect()
    }
    raw = {
        r.user_id: (r.n, r.s)
        for r in spark.read.parquet(f"{SF_ORACLE}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(got) == set(raw)
    for uid, r in got.items():
        n, s = raw[uid]
        assert r.n_events == n
        assert 0.0 < r.decayed_value <= s + 1e-6, (uid, r.decayed_value, s)


def test_range_search_contains_thresholded_topk(spark):
    """Radius retrieval is exact: every corpus vector the brute-force
    top-k ranks with cosine >= RANGE_THRESHOLD must appear in the range
    result, and every returned cosine clears the threshold."""
    from delta_lake_health_spark.plans.similarity import (
        N_QUERIES,
        QUERIES,
        RANGE_THRESHOLD,
    )

    rng = {
        (r.q_id, r.vec_id): r.cosine
        for r in QUERIES["ann_range_search"](spark, SF_ORACLE).collect()
    }
    assert rng, "threshold yields no matches at sf0.01 — recalibrate"
    assert all(c >= RANGE_THRESHOLD for c in rng.values())
    topk = QUERIES["ann_bruteforce_topk"](spark, SF_ORACLE).collect()
    for r in topk:
        if r.vec_id >= N_QUERIES and r.cosine >= RANGE_THRESHOLD:
            assert (r.q_id, r.vec_id) in rng, (r.q_id, r.vec_id)


def test_range_search_plans_broadcast_not_cartesian(spark):
    """Like S1/S9, the radius scan is a DECLARED |Q|-broadcast corpus
    pass: BroadcastNestedLoopJoin, never a shuffled cartesian."""
    from delta_lake_health_spark.plans.similarity import QUERIES

    plan = (
        QUERIES["ann_range_search"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_zipf_slope_is_negative_and_rank_bounded(spark):
    """Frequency decreases with rank by construction (ranked by count
    desc), so the fitted slope must be negative for every language, and
    the fit never uses more than ZIPF_TOP_RANKS points."""
    from delta_lake_health_spark.plans.text import QUERIES, ZIPF_TOP_RANKS

    rows = QUERIES["text_zipf_slope"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_ranks <= ZIPF_TOP_RANKS
        assert r.zipf_slope < 0.0, (r.lang, r.zipf_slope)


def test_hashed_quality_score_bounds_and_threshold(spark):
    """The hashed linear score is a mean of per-token integer weights in
    [-32768, 32767]/32768 — so |score| <= 1, keep == (score >= 0), one
    row per document, and n_tok equals the whitespace token count."""
    from pyspark.sql import functions as F

    from delta_lake_health_spark.plans.text import QUERIES

    rows = QUERIES["text_hashed_linear_quality"](spark, SF_ORACLE).collect()
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    n_tok = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    assert len(rows) == docs.count()
    for r in rows:
        assert -1.0 <= r.quality_score <= 1.0
        assert r.keep == (r.quality_score >= 0.0)
        assert r.n_tok == n_tok[r.doc_id]


def test_cohort_retention_matrix_laws(spark):
    """Offset-0 retention is exactly 1 for every cohort (a user is active
    in their own first week by definition), retention never exceeds 1,
    and summing cohort sizes recovers the distinct-user count."""
    from delta_lake_health_spark.plans.events import QUERIES

    rows = QUERIES["events_weekly_cohort_retention"](spark, SF_ORACLE).collect()
    assert rows
    sizes = {}
    for r in rows:
        assert 0.0 < r.retention <= 1.0
        if r.week_offset == 0:
            assert r.retention == 1.0
            sizes[r.cohort_week] = r.n_users
    cohorts = {r.cohort_week for r in rows}
    assert set(sizes) == cohorts, "every cohort must have an offset-0 row"
    n_users = (
        spark.read.parquet(f"{SF_ORACLE}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(sizes.values()) == n_users


def test_pareto_census_is_monotone_and_exact(spark):
    """Deciles are ranked by per-user value, so value_share is
    non-increasing across deciles; the integer micro-unit sums
    reconstruct the corpus total exactly; user counts cover all users."""
    from pyspark.sql import functions as F

    from delta_lake_health_spark.plans.events import QUERIES

    rows = QUERIES["events_user_value_pareto"](spark, SF_ORACLE).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    shares = [r.value_share for r in rows]
    assert all(a >= b for a, b in zip(shares, shares[1:]))
    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    v_tot = ev.select(
        F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("t")
    ).collect()[0].t
    assert sum(r.v_int_sum for r in rows) == v_tot
    assert sum(r.n_users for r in rows) == ev.select("user_id").distinct().count()


def test_bigram_cross_entropy_bounds(spark):
    """Laplace smoothing bounds every per-position term: 0 < -ln p <=
    ln(c1_max + V) — so the per-doc mean is positive and below ln(N+V);
    docs with fewer than 2 tokens are excluded; n_bigrams = n_tok - 1."""
    import math

    from pyspark.sql import functions as F

    from delta_lake_health_spark.plans.text import QUERIES

    rows = QUERIES["text_bigram_cross_entropy"](spark, SF_ORACLE).collect()
    assert rows
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    words = docs.select(F.explode(F.split("text", " ")).alias("w"))
    n_pos = words.count()
    v = words.distinct().count()
    ub = math.log(n_pos + v)
    n_tok = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    assert len(rows) == sum(1 for n in n_tok.values() if n >= 2)
    for r in rows:
        assert r.n_bigrams == n_tok[r.doc_id] - 1
        assert 0.0 < r.cross_entropy <= ub


def test_minhash_calibration_covers_all_candidates(spark):
    """Every LSH candidate pair lands in exactly one agreement bucket
    (totals match X3's pair count), agreement levels are within [0, 16],
    and the reported error is consistent with |est - mean_true| at the
    bucket level (Jensen: mean abs err >= |mean err|)."""
    from delta_lake_health_spark.plans.dedup import N_HASHES, QUERIES

    rows = QUERIES["dedup_minhash_calibration"](spark, SF_ORACLE).collect()
    assert rows
    n_pairs = QUERIES["dedup_minhash_pairs"](spark, SF_ORACLE).count()
    assert sum(r.n_pairs for r in rows) == n_pairs
    for r in rows:
        assert 0 <= r.n_agree <= N_HASHES
        assert 0.0 <= r.mean_true_jaccard <= 1.0
        est = r.n_agree / N_HASHES
        assert r.mean_abs_err >= abs(est - r.mean_true_jaccard) - 1e-9


def test_metronome_census_laws(spark):
    """One row per user with >= 2 events; modal_share in (0, 1]; the
    flag is exactly the (min-gaps AND share-threshold) conjunction; a
    user's gap count is their event count minus one."""
    from pyspark.sql import functions as F

    from delta_lake_health_spark.plans.events import (
        _METRONOME_MIN_GAPS,
        _METRONOME_SHARE,
        QUERIES,
    )

    rows = QUERIES["events_metronome_census"](spark, SF_ORACLE).collect()
    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    per_user = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {r.user_id for r in rows} == {
        u for u, n in per_user.items() if n >= 2
    }
    for r in rows:
        assert r.n_gaps == per_user[r.user_id] - 1
        assert 0.0 < r.modal_share <= 1.0
        assert r.metronomic == (
            r.n_gaps >= _METRONOME_MIN_GAPS
            and r.modal_share >= _METRONOME_SHARE
        )
