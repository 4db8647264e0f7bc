"""Reusable IVF index — build once, probe many (SURVEY §2.5).

The registry's ``ann_ivf_topk`` is a single-shot query (quantizer + probe
in one plan, so the DuckDB oracle can replay it). A real serving path
amortizes the expensive part: ``build_ivf_index`` trains the deterministic
k-means coarse quantizer ONCE and materializes the inverted lists
(``localCheckpoint`` — on a cluster this would be a persisted table
bucketed by cid); every subsequent ``search`` is just nprobe broadcast
lookups + an exact rerank inside the probed lists.

Scale shape: the centroid table is broadcast-sized by construction
(k entries); the inverted lists are the corpus re-keyed by cid — searches
shuffle only the (query x nprobe) probe rows against them, never
corpus x corpus.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from delta_lake_health_spark.plans.similarity import (
    _dot,
    _kmeans_centroids,
    _norm,
)


@dataclass
class IvfIndex:
    """Materialized coarse quantizer + inverted lists."""

    centroids: DataFrame  # (cid, cent, cnrm) — broadcast-sized
    lists: DataFrame      # (cid, vec_id, emb, nrm) — corpus keyed by cid
    k: int
    nprobe_default: int


def build_ivf_index(
    emb: DataFrame, k: int = 8, iters: int = 3, nprobe: int = 3
) -> IvfIndex:
    """Train the quantizer on ``emb`` (vec_id, emb) and materialize the
    inverted lists. Deterministic: k-means init = lowest vec_ids, fixed
    Lloyd rounds — same family the oracle-checked query uses."""
    embn = emb.select(
        "vec_id", "emb", _norm("emb").alias("nrm")
    ).localCheckpoint()
    cents = (
        _kmeans_centroids(embn, k=k, iters=iters)
        .withColumn("cnrm", _norm("cent"))
        .localCheckpoint()
    )
    ccos = _dot("emb", "cent") / (F.col("nrm") * F.col("cnrm"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.col("cid"))
    lists = (
        embn.join(F.broadcast(cents), how="cross")
        .select("vec_id", "emb", "nrm", "cid", ccos.alias("ccos"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("cid", "vec_id", "emb", "nrm")
        .localCheckpoint()
    )
    return IvfIndex(centroids=cents, lists=lists, k=k, nprobe_default=nprobe)


def search(
    index: IvfIndex,
    queries: DataFrame,
    top_k: int = 5,
    nprobe: int | None = None,
    exclude_same_id: bool = False,
) -> DataFrame:
    """Top-k cosine neighbors for ``queries`` (q_id, q_emb) against the
    index: probe the ``nprobe`` nearest inverted lists per query, exact
    rerank inside. ``exclude_same_id`` drops corpus rows whose vec_id
    equals q_id (for corpus-member queries)."""
    nprobe = nprobe or index.nprobe_default
    q = queries.select(
        F.col("q_id"), F.col("q_emb"), _norm("q_emb").alias("qnrm")
    )
    qcos = _dot("q_emb", "cent") / (F.col("qnrm") * F.col("cnrm"))
    pw = Window.partitionBy("q_id").orderBy(F.desc("qcos"), F.col("cid"))
    probes = (
        q.join(F.broadcast(index.centroids), how="cross")
        .select("q_id", "q_emb", "qnrm", "cid", qcos.alias("qcos"))
        .withColumn("prn", F.row_number().over(pw))
        .where(F.col("prn") <= nprobe)
        .select("q_id", "q_emb", "qnrm", "cid")
    )
    scored = probes.join(index.lists, "cid").select(
        "q_id",
        "vec_id",
        (
            _dot("q_emb", "emb") / (F.col("qnrm") * F.col("nrm"))
        ).alias("cosine"),
    )
    if exclude_same_id:
        scored = scored.where(F.col("vec_id") != F.col("q_id"))
    rw = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(rw))
        .where(F.col("rn") <= top_k)
        .select("q_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rn")
        .orderBy("q_id", "rn")
    )
