"""Rerank/fusion over PERSISTED indexes (VERDICT r10 #6): the registry's
MMR/RRF rows now rerank through operators/rerank.py, and the RRF IVF arm
is served from the saved index artifact. These tests pin the claims that
make the nested oracles valid: the served ranking is bit-identical to
the in-session quantizer, and the MMR greedy loop gives bit-identical
output whether its candidates come from the in-session build or the
loaded Delta artifact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import delta_lake_health_spark.plans.similarity as sim
from delta_lake_health_spark.operators import ann_index, rerank
from tests.conftest import SF_DIR


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_served_ivf_matches_in_session(spark):
    """The pin _served_ivf_topk's docstring promises: serving S2 from
    the persisted artifact reproduces ann_ivf_topk exactly, so the
    registry oracle (which unrolls the in-session quantizer) still
    proves the served composition."""
    served = sim._served_ivf_topk(spark, SF_DIR)
    in_session = sim.QUERIES["ann_ivf_topk"](spark, SF_DIR)
    assert _rows(served) == _rows(in_session)


def test_mmr_bit_identical_over_persisted_candidates(spark, tmp_path):
    """MMR(candidates from load_ivf_index) == MMR(candidates from the
    in-session build): the rerank path exercised in production — served
    shortlist + pairwise sims read from the index's own lists table —
    is the same computation as the all-in-session form."""
    emb = sim._with_norm(sim._emb(spark, SF_DIR), "emb", "nrm")
    idx = ann_index.build_ivf_index(
        sim._emb(spark, SF_DIR),
        k=sim.K_CENTROIDS,
        iters=sim.KMEANS_ITERS,
        nprobe=sim.NPROBE,
    )
    path = str(tmp_path / "ivf")
    ann_index.save_ivf_index(spark, idx, path)
    loaded = ann_index.load_ivf_index(spark, path)
    q = emb.where(F.col("vec_id") < sim.N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )

    def mmr_from(index):
        sl = (
            ann_index.search(
                index, q, top_k=sim._MMR_M, exclude_same_id=True
            )
            .select("q_id", "vec_id", F.col("cosine").alias("rel"))
            .localCheckpoint()
        )
        # pairwise sims read from the index's OWN lists table — no
        # corpus access anywhere in the serving path
        vectors = index.lists.select("vec_id", "emb", "nrm")
        pw = rerank.pairwise_sims(sl, vectors).localCheckpoint()
        return rerank.mmr_rerank(sl, pw, sim._MMR_LAMBDA, sim._MMR_K)

    got = _rows(mmr_from(loaded))
    want = _rows(mmr_from(idx))
    assert got == want
    assert len(got) == sim.N_QUERIES * sim._MMR_K


def test_mmr_local_selection_matches_distributed(spark):
    """r14: `ann_mmr_rerank` runs the k greedy rounds driver-side
    (rerank.mmr_select_local) — this pins bit-identical output vs the
    distributed k-round form over the REGISTRY shortlist (the real
    rel/sim values, including 6-dp round-before-argmax and tie-breaks),
    so the unrolled-CTE oracle keeps proving the query."""
    emb = sim._with_norm(sim._emb(spark, SF_DIR), "emb", "nrm")
    q = emb.where(F.col("vec_id") < sim.N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    from pyspark.sql.window import Window

    rel = sim._dot("q_emb", "emb") / (F.col("q_nrm") * F.col("nrm"))
    sw = Window.partitionBy("q_id").orderBy(F.desc("rel"), F.col("vec_id"))
    sl = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", rel.alias("rel"))
        .withColumn("srn", F.row_number().over(sw))
        .where(F.col("srn") <= sim._MMR_M)
        .select("q_id", "vec_id", "rel")
        .localCheckpoint()
    )
    pw = rerank.pairwise_sims(sl, emb).localCheckpoint()
    dist = _rows(rerank.mmr_rerank(sl, pw, sim._MMR_LAMBDA, sim._MMR_K))
    local = _rows(
        rerank.mmr_select_local(spark, sl, pw, sim._MMR_LAMBDA, sim._MMR_K)
    )
    assert local == dist
    assert len(local) == sim.N_QUERIES * sim._MMR_K


def test_round6_matches_spark_round(spark):
    """_round6 must reproduce Spark's Round(HALF_UP over
    BigDecimal.valueOf) including the shortest-repr half-boundary cases
    and NaN/Inf passthrough."""
    import math
    import random

    rng = random.Random(14)
    vals = [rng.uniform(-1.5, 1.5) for _ in range(2000)]
    vals += [5e-7, -5e-7, 1.5e-6, 0.9999995, -0.9999995, 0.0, -0.0,
             1e-12, 123.4567895]
    got = [rerank._round6(v) for v in vals]
    want = [
        r.r
        for r in spark.createDataFrame([(v,) for v in vals], "x double")
        .select(F.round("x", 6).alias("r"))
        .collect()
    ]
    assert got == want
    assert math.isnan(rerank._round6(float("nan")))
    assert rerank._round6(float("inf")) == float("inf")


def test_rrf_fuse_three_retrievers(spark, tmp_path):
    """rrf_fuse is the production combiner: fusing a third retriever
    (the served IVF under a different nprobe) still ranks by the summed
    reciprocal ranks with deterministic tie-breaks."""
    r1 = sim.QUERIES["ann_bruteforce_topk"](spark, SF_DIR)
    r2 = sim._served_ivf_topk(spark, SF_DIR)
    idx = ann_index.build_ivf_index(
        sim._emb(spark, SF_DIR),
        k=sim.K_CENTROIDS,
        iters=sim.KMEANS_ITERS,
    )
    q = sim._emb(spark, SF_DIR).where(
        F.col("vec_id") < sim.N_QUERIES
    ).select(F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb"))
    r3 = ann_index.search(
        idx, q, top_k=sim.TOP_K, nprobe=2, exclude_same_id=True
    )
    fused = rerank.rrf_fuse([r1, r2, r3], k=sim._RRF_K, top=sim.TOP_K)
    rows = _rows(fused)
    assert len(rows) == sim.N_QUERIES * sim.TOP_K
    per_q = {}
    for q_id, vec_id, rrf, rank in rows:
        per_q.setdefault(q_id, []).append((rank, rrf))
    for q_id, rr in per_q.items():
        ranks = [r for r, _ in rr]
        assert ranks == sorted(ranks)
        scores = [s for _, s in sorted(rr)]
        assert scores == sorted(scores, reverse=True)
