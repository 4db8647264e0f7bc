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

import math
from decimal import ROUND_HALF_UP, Decimal

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


def _round6(x: float) -> float:
    """Spark's ``round(double, 6)``: HALF_UP over
    ``BigDecimal.valueOf(double)`` — i.e. the rounding operates on the
    SHORTEST-round-trip decimal rendering of the double (Double.toString),
    which Python's ``repr`` also produces. ``Decimal(x)`` directly would
    instead round the exact binary expansion and can disagree exactly at
    a half boundary (e.g. 5e-7). NaN/Inf pass through unchanged, as in
    Spark's Round."""
    if math.isnan(x) or math.isinf(x):
        return x
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


def _desc_key(score: float | None):
    """Spark DESC ordering as a Python sort key: NaN sorts LARGEST
    (first), NULL sorts LAST."""
    if score is None:
        return (2, 0.0)
    if math.isnan(score):
        return (0, 0.0)
    return (1, -score)


def mmr_select_local(
    spark,
    shortlist: DataFrame,
    pairwise: DataFrame,
    lam: float,
    k: int,
) -> DataFrame:
    """``mmr_rerank``'s greedy selection with the k rounds run on the
    DRIVER over the collected shortlist/pairwise rows (VERDICT r13 #5:
    the k strictly-sequential Spark rounds were the scaling-flat cost of
    ``ann_mmr_rerank`` — each round a tiny join + window + anti-join over
    |Q| x M rows, pure job-launch overhead).

    Scale safety: the collect is bounded BY CONSTRUCTION, not by data —
    |shortlist| <= |Q| x M and |pairwise| <= |Q| x M^2 with Q (query-set
    size) and M (shortlist depth) fixed module constants, so it is a few
    thousand rows at ANY corpus size (guide §5's driver rule bans
    corpus-dependent collects; this one is constant-bounded). The
    corpus-scale work — shortlist retrieval and pairwise sims — stays in
    Spark; only the greedy argmax loop moves.

    Bit-compatibility with the distributed form (pinned by
    tests/test_rerank.py on randomized inputs): rel/sim doubles are
    collected as Spark computed them; lam*rel - mu*ms is the same IEEE
    double arithmetic in Python; _round6 reproduces Spark's Round; the
    (score DESC, vec_id ASC) argmax uses Spark's DESC null/NaN order."""
    lam = float(lam)
    mu = round(1 - lam, 6)
    # collecting pairwise first materializes the shared lazy-checkpointed
    # shortlist inside the same job; the shortlist collect then reads the
    # checkpoint
    sim: dict = {}
    for r in pairwise.collect():
        sim.setdefault(r.q_id, {}).setdefault(r.a, {})[r.b] = r.sim
    rel: dict = {}
    for r in shortlist.collect():
        rel.setdefault(r.q_id, {})[r.vec_id] = r.rel
    out = []
    for q_id in rel:
        cands = rel[q_id]
        picked: set = set()
        for rank in range(1, k + 1):
            best = None
            for v, rl in cands.items():
                if v in picked:
                    continue
                if rank == 1:
                    score = _round6(lam * rl)
                else:
                    # the rounds' INNER join with the ms aggregate: a
                    # candidate participates iff a pairwise row (v, b)
                    # exists for SOME selected b (row presence, not sim
                    # non-nullness); Spark's max then ignores null sims
                    # and an all-null group scores null (sorts last)
                    pair_rows = sim.get(q_id, {}).get(v, {})
                    present = [b for b in picked if b in pair_rows]
                    if not present:
                        continue
                    vals = [
                        pair_rows[b]
                        for b in present
                        if pair_rows[b] is not None
                    ]
                    # Spark's MAX treats NaN as greater than any value;
                    # Python's max is order-dependent under NaN
                    if any(math.isnan(s) for s in vals):
                        ms: float | None = math.nan
                    else:
                        ms = max(vals) if vals else None
                    score = (
                        None if ms is None else _round6(lam * rl - mu * ms)
                    )
                key = (_desc_key(score), v)
                if best is None or key < best[0]:
                    best = (key, v, score)
            if best is None:
                break
            picked.add(best[1])
            out.append((q_id, best[1], rank, best[2]))
    res = spark.createDataFrame(
        out, "q_id long, vec_id long, mmr_rank int, mmr_score double"
    )
    return res.orderBy("q_id", "mmr_rank")


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
