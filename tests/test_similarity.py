"""Oracle checks + recall property for the similarity-search family."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle_check import compare

from delta_lake_health_spark.plans import similarity as sim


@pytest.mark.parametrize("name", sorted(sim.ORACLE))
def test_similarity_vs_oracle(spark, duck, name):
    compare(spark, duck, sim.QUERIES[name], sim.ORACLE[name], SF_ORACLE)


def test_ivf_recall_vs_bruteforce(spark):
    """IVF with nprobe=3 of 10 lists must recover a solid fraction of the
    exact top-5 neighbours (recall@5 >= 0.5 on the synthetic clusters —
    labels are cluster ids, so the coarse quantizer is well matched)."""
    exact = {
        (r.q_id, r.vec_id)
        for r in sim.QUERIES["ann_bruteforce_topk"](spark, SF_ORACLE).collect()
    }
    approx = {
        (r.q_id, r.vec_id)
        for r in sim.QUERIES["ann_ivf_topk"](spark, SF_ORACLE).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall@{sim.TOP_K} too low: {recall}"


def test_ivf_recall_holds_at_sf01(spark):
    """Same recall floor at 4x the corpus (2000 vectors) — guards the
    k-means quantizer's quality as data grows, not just at oracle SF."""
    sf = "/root/testdata/sf0.1"
    exact = {
        (r.q_id, r.vec_id)
        for r in sim.QUERIES["ann_bruteforce_topk"](spark, sf).collect()
    }
    approx = {
        (r.q_id, r.vec_id)
        for r in sim.QUERIES["ann_ivf_topk"](spark, sf).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall@{sim.TOP_K} at sf0.1 too low: {recall}"


def test_lsh_buckets_partition_corpus(spark):
    df = sim.QUERIES["ann_lsh_buckets"](spark, SF_ORACLE)
    rows = df.collect()
    n = len(rows)
    assert n == len({r.vec_id for r in rows})  # one bucket per vector
    assert all(len(r.bucket) == sim.N_PLANES for r in rows)
    assert sum(r.bucket_size for r in rows) >= n  # sizes consistent


def test_ivf_index_build_once_probe_many(spark):
    """The reusable IVF index (build_ivf_index + search) returns exactly
    the oracle-checked single-shot ann_ivf_topk result for the same
    parameters, and serves a second query set without retraining."""
    from delta_lake_health_spark.operators.ann_index import build_ivf_index, search
    from delta_lake_health_spark.plans import similarity as S
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    emb = S._emb(spark, sf).select("vec_id", "emb")
    index = build_ivf_index(emb, k=S.K_CENTROIDS, iters=S.KMEANS_ITERS,
                            nprobe=S.NPROBE)

    q1 = emb.where(F.col("vec_id") < S.N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    got = [
        (r.q_id, r.vec_id, r.cosine, r.rn)
        for r in search(index, q1, top_k=S.TOP_K, exclude_same_id=True).collect()
    ]
    want = [
        (r.q_id, r.vec_id, r.cosine, r.rn)
        for r in S.QUERIES["ann_ivf_topk"](spark, sf).collect()
    ]
    assert got == want

    # a second, disjoint query set probes the SAME materialized index
    q2 = emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 104)).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    out2 = search(index, q2, top_k=3, exclude_same_id=True).collect()
    assert {r.q_id for r in out2} == {100, 101, 102, 103}
    assert all(r.rn <= 3 and -1.0 <= r.cosine <= 1.0 for r in out2)
