"""Rerank / fusion operators shared by the registry rows and the
persisted-index serving path (VERDICT r10 #6).

``ann_mmr_rerank`` and ``ann_rrf_fusion`` used to inline these; the
greedy MMR loop and the RRF combiner now live here so the SAME code
reranks candidates no matter where they came from — the in-session
quantizer, a ``load_ivf_index`` artifact, or the ANN graph. Both
operate on |Q| x M shortlists / |Q| x top_k rankings, never the
corpus; whatever the candidate retrievers cost dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pairwise_sims(shortlist: DataFrame, vectors: DataFrame) -> DataFrame:
    """All ordered candidate pairs per query with their cosine —
    (q_id, a, b, sim) from a (q_id, vec_id, rel) shortlist and a
    (vec_id, emb, nrm) vector source (the corpus, or a persisted
    index's lists table). |Q| x M^2 rows, M fixed by the shortlist."""
    from delta_lake_health_spark.plans.similarity import _dot

    ev = vectors.select("vec_id", "emb", "nrm")
    x = shortlist.select("q_id", F.col("vec_id").alias("a")).join(
        ev.select(
            F.col("vec_id").alias("a"),
            F.col("emb").alias("a_emb"),
            F.col("nrm").alias("a_nrm"),
        ),
        "a",
    )
    y = shortlist.select("q_id", F.col("vec_id").alias("b")).join(
        ev.select(
            F.col("vec_id").alias("b"),
            F.col("emb").alias("b_emb"),
            F.col("nrm").alias("b_nrm"),
        ),
        "b",
    )
    return (
        x.join(y, "q_id")
        .where(F.col("a") != F.col("b"))
        .select(
            "q_id",
            "a",
            "b",
            (
                _dot("a_emb", "b_emb") / (F.col("a_nrm") * F.col("b_nrm"))
            ).alias("sim"),
        )
    )


def mmr_rerank(
    shortlist: DataFrame,
    pairwise: DataFrame,
    lam: float,
    k: int,
) -> DataFrame:
    """Maximal-marginal-relevance selection (Carbonell & Goldstein
    1998) over a pinned shortlist: ``k`` greedy rounds, each picking
    argmax of ``lam * rel - (1 - lam) * max_sim_to_selected`` with the
    6-dp round-before-argmax protocol so the unrolled-CTE oracle can
    replay it. Inputs: shortlist (q_id, vec_id, rel), pairwise
    (q_id, a, b, sim). Lock-step across queries; every round is a
    |Q| x M join against the selected set, never corpus work."""
    lam = float(lam)
    mu = round(1 - lam, 6)
    pick_w = Window.partitionBy("q_id").orderBy(
        F.desc("score"), F.col("vec_id")
    )
    first = (
        shortlist.withColumn(
            "score", F.round(F.lit(lam) * F.col("rel"), 6)
        )
        .withColumn("rn", F.row_number().over(pick_w))
        .where(F.col("rn") == 1)
        .select(
            "q_id",
            "vec_id",
            F.lit(1).alias("mmr_rank"),
            F.col("score").alias("mmr_score"),
        )
    )
    # lazy checkpoints (r13): no action fires until the caller consumes
    # the final selection, so the whole k-round chain executes as ONE
    # job instead of k eager materialization jobs; per-round lineage is
    # still truncated, and concurrent consumers of a round's output
    # serialize on the block-manager lock (no duplicate compute).
    sel = first.localCheckpoint(eager=False)
    for r in range(2, k + 1):
        ms = (
            pairwise.join(
                sel.select("q_id", F.col("vec_id").alias("b")),
                ["q_id", "b"],
            )
            .groupBy("q_id", F.col("a").alias("vec_id"))
            .agg(F.max("sim").alias("ms"))
        )
        pick = (
            shortlist.join(
                sel.select("q_id", "vec_id"), ["q_id", "vec_id"],
                "left_anti",
            )
            .join(ms, ["q_id", "vec_id"])
            .withColumn(
                "score",
                F.round(
                    F.lit(lam) * F.col("rel") - F.lit(mu) * F.col("ms"),
                    6,
                ),
            )
            .withColumn("rn", F.row_number().over(pick_w))
            .where(F.col("rn") == 1)
            .select(
                "q_id",
                "vec_id",
                F.lit(r).alias("mmr_rank"),
                F.col("score").alias("mmr_score"),
            )
        )
        sel = sel.unionByName(pick).localCheckpoint(eager=False)
    return sel.orderBy("q_id", "mmr_rank")


def rrf_fuse(
    rankings: list[DataFrame], k: int = 60, top: int = 5
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009):
    combine (q_id, vec_id, rn) rankings by ``sum(1 / (k + rn))``,
    6-dp-rounded before the final per-query rank so independent
    engines order identically. Works on the union of the |Q| x top_k
    ranking outputs only."""
    u = rankings[0].select("q_id", "vec_id", "rn")
    for r in rankings[1:]:
        u = u.unionByName(r.select("q_id", "vec_id", "rn"))
    fused = u.groupBy("q_id", "vec_id").agg(
        F.round(F.sum(1.0 / (F.lit(k) + F.col("rn"))), 6).alias("rrf")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("rrf"), F.col("vec_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top)
        .select("q_id", "vec_id", "rrf", "rank")
        .orderBy("q_id", "rank")
    )
