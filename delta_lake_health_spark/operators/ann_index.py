"""Reusable IVF index — build once, probe many (SURVEY §2.5).

The registry's ``ann_ivf_topk`` is a single-shot query (quantizer + probe
in one plan, so the DuckDB oracle can replay it). A real serving path
amortizes the expensive part: ``build_ivf_index`` trains the deterministic
k-means coarse quantizer ONCE and materializes the inverted lists
(``localCheckpoint`` — on a cluster this would be a persisted table
bucketed by cid); every subsequent ``search`` is just nprobe broadcast
lookups + an exact rerank inside the probed lists.

Scale shape (100 TB corpus):

- ``k`` defaults to ~sqrt(N) (floor 8) so each inverted list is ~sqrt(N)
  rows — a fixed small k would make every list corpus/k and turn the
  probe join into a k-value-key shuffle (skew/straggler magnet).
- Inverted lists wider than ``max_list_rows`` are SUB-BUCKETED on a row
  hash: the probe join key becomes (cid, sub), so one hot centroid
  spreads over ceil(|list|/budget) shuffle partitions instead of landing
  whole on one task. Probes replicate per sub via a broadcast of the
  k-row (cid, n_subs) table — results are identical, only the
  partitioning changes.
- The centroid table is broadcast-sized by construction (k entries);
  searches shuffle only the (query x nprobe x subs) probe rows against
  the lists, never corpus x corpus.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from delta_lake_health_spark.plans.similarity import (
    _dot,
    _kmeans_centroids,
    _norm,
)

MIN_K = 8


@dataclass
class IvfIndex:
    """Materialized coarse quantizer + sub-bucketed inverted lists."""

    centroids: DataFrame  # (cid, cent, cnrm) — broadcast-sized
    lists: DataFrame      # (cid, sub, vec_id, emb, nrm) — corpus keyed by (cid, sub)
    subs: DataFrame       # (cid, n_subs) — broadcast-sized, one row per centroid
    k: int
    nprobe_default: int
    max_list_rows: int


def build_ivf_index(
    emb: DataFrame,
    k: int | None = None,
    iters: int = 3,
    nprobe: int = 3,
    max_list_rows: int = 1_000_000,
) -> IvfIndex:
    """Train the quantizer on ``emb`` (vec_id, emb) and materialize the
    inverted lists. Deterministic: k-means init = lowest vec_ids, fixed
    Lloyd rounds — same family the oracle-checked query uses.

    ``k=None`` derives the centroid count from the corpus size
    (~sqrt(N), floor ``MIN_K``); lists longer than ``max_list_rows``
    are split into hash sub-buckets so no single (cid) key exceeds the
    partition-width budget at shuffle time."""
    embn = emb.select(
        "vec_id", "emb", _norm("emb").alias("nrm")
    ).localCheckpoint()
    if k is None:
        n = embn.count()  # embn is materialized; this is a cached-scan count
        k = max(MIN_K, min(int(math.isqrt(n)), n or 1))
    cents = (
        _kmeans_centroids(embn, k=k, iters=iters)
        .withColumn("cnrm", _norm("cent"))
        .localCheckpoint()
    )
    ccos = _dot("emb", "cent") / (F.col("nrm") * F.col("cnrm"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.col("cid"))
    assigned = (
        embn.join(F.broadcast(cents), how="cross")
        .select("vec_id", "emb", "nrm", "cid", ccos.alias("ccos"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("cid", "vec_id", "emb", "nrm")
        .localCheckpoint()
    )
    # k-row table: how many hash sub-buckets each inverted list needs to
    # keep every (cid, sub) group within the width budget
    subs = (
        assigned.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("list_rows"))
        .select(
            "cid",
            F.ceil(F.col("list_rows") / F.lit(max_list_rows))
            .cast("int")
            .alias("n_subs"),
        )
        .localCheckpoint()
    )
    lists = (
        assigned.join(F.broadcast(subs), "cid")
        .select(
            "cid",
            F.pmod(F.xxhash64("vec_id"), F.col("n_subs")).cast("int").alias("sub"),
            "vec_id",
            "emb",
            "nrm",
        )
        .localCheckpoint()
    )
    return IvfIndex(
        centroids=cents,
        lists=lists,
        subs=subs,
        k=k,
        nprobe_default=nprobe,
        max_list_rows=max_list_rows,
    )


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
    # replicate each probe across its list's sub-buckets (broadcast of the
    # k-row subs table) so the rerank join key is (cid, sub) — a hot list
    # fans out over n_subs shuffle partitions instead of one
    probes = probes.join(F.broadcast(index.subs), "cid").select(
        "q_id",
        "q_emb",
        "qnrm",
        "cid",
        F.explode(F.sequence(F.lit(0), F.col("n_subs") - 1)).alias("sub"),
    )
    scored = probes.join(index.lists, ["cid", "sub"]).select(
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


def save_ivf_index(spark, index: IvfIndex, path: str) -> dict:
    """Persist the index as THREE Delta tables under ``path`` —
    centroids (broadcast-sized), inverted lists (clustered on cid, so
    per-file min/max prune the probe's cid reads), and the sub-bucket
    map — with the build parameters recorded as table properties on the
    centroids table. This is the production shape: build once on the
    cluster, serve probes from any session against the persisted tables
    (and maintain them like any other Delta table: OPTIMIZE, time
    travel, CDF on refresh)."""
    import os

    from delta_lake_health_spark.sources import delta_writer

    delta_writer.write(
        spark, index.centroids, os.path.join(path, "centroids"),
        mode="overwrite",
    )
    delta_writer.write(
        spark, index.lists, os.path.join(path, "lists"),
        mode="overwrite", cluster_by=["cid"],
    )
    # upsert appends land here: DECLARE the clustering (liquid) and
    # autoCompact (D57) so small upsert files bin-pack themselves with
    # cid file pruning preserved by the cluster-aware compact
    delta_writer.set_cluster_columns(
        spark, os.path.join(path, "lists"), ["cid"]
    )
    delta_writer.set_table_property(
        spark,
        os.path.join(path, "lists"),
        "delta.autoOptimize.autoCompact",
        "true",
    )
    delta_writer.write(
        spark, index.subs, os.path.join(path, "subs"), mode="overwrite"
    )
    for key, val in (
        ("ivf.k", index.k),
        ("ivf.nprobeDefault", index.nprobe_default),
        ("ivf.maxListRows", index.max_list_rows),
    ):
        delta_writer.set_table_property(
            spark, os.path.join(path, "centroids"), key, str(val)
        )
    return {"k": index.k, "path": path}


def load_ivf_index(spark, path: str) -> IvfIndex:
    """Reopen a persisted index: three snapshot reads + the parameters
    from the centroids table's properties. Probes against the loaded
    index are bit-identical to probes against the in-session build."""
    import os

    from delta_lake_health_spark.sources.delta_log import DeltaLog

    clog = DeltaLog(spark, os.path.join(path, "centroids"))
    cfg = clog.metadata().get("configuration") or {}
    return IvfIndex(
        centroids=clog.snapshot(),
        lists=DeltaLog(spark, os.path.join(path, "lists")).snapshot(),
        subs=DeltaLog(spark, os.path.join(path, "subs")).snapshot(),
        k=int(cfg["ivf.k"]),
        nprobe_default=int(cfg["ivf.nprobeDefault"]),
        max_list_rows=int(cfg["ivf.maxListRows"]),
    )


def upsert_ivf_index(spark, path: str, new_vectors) -> dict:
    """Incrementally add ``new_vectors`` (vec_id, emb) to a PERSISTED
    IVF index (``save_ivf_index`` layout) WITHOUT retraining — the
    production freshness path: a corpus that grows by 0.1%/day must not
    pay quantizer training or an index rebuild per ingest.

    Mechanics: the new vectors are assigned to their nearest EXISTING
    centroid (one pass against the broadcast k-row quantizer), then:

    - lists whose sub-bucket count is unchanged get their new rows
      APPENDED (a pure add-only Delta commit — |new rows| write cost);
    - a list that outgrows ``max_list_rows`` is REBUCKETED: exactly that
      cid's rows are deleted (file-pruned via the cluster_by layout) and
      rewritten with the new sub fan-out — |hot list| cost, never the
      index;
    - the k-row sub-bucket map is refreshed.

    The quantizer is untouched, so probes see the union immediately and
    recall degrades only as far as the frozen centroids drift from the
    true distribution — the standard IVF maintenance contract (periodic
    retrain = a fresh ``build_ivf_index`` + ``save_ivf_index``).
    Returns ``{"numAdded", "numRebucketedLists", "k"}``.
    """
    import os

    from delta_lake_health_spark.sources import delta_writer
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    idx = load_ivf_index(spark, path)
    lists_path = os.path.join(path, "lists")
    subs_path = os.path.join(path, "subs")

    fresh = new_vectors.select(
        "vec_id", "emb", _norm("emb").alias("nrm")
    )
    ccos = _dot("emb", "cent") / (F.col("nrm") * F.col("cnrm"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.col("cid"))
    assigned = (
        fresh.join(F.broadcast(idx.centroids), how="cross")
        .select("vec_id", "emb", "nrm", "cid", ccos.alias("ccos"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("cid", "vec_id", "emb", "nrm")
        .localCheckpoint()
    )
    n_added = assigned.count()
    if n_added == 0:
        return {"numAdded": 0, "numRebucketedLists": 0, "k": idx.k}

    # per-affected-cid growth vs the current sub fan-out (|affected
    # lists| rows on the driver — the same metadata scale as the subs map)
    affected = {
        r.cid: r.n_new
        for r in assigned.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n_new"))
        .collect()
    }
    cur_subs = {r.cid: r.n_subs for r in idx.subs.collect()}
    cid_list = sorted(affected)
    existing_counts = {
        r.cid: r.n
        for r in idx.lists.where(F.col("cid").isin(cid_list))
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    new_subs = dict(cur_subs)
    rebucket = []
    subs_dirty = False
    for cid in cid_list:
        total = existing_counts.get(cid, 0) + affected[cid]
        need = max(1, -(-total // idx.max_list_rows))
        if cid not in cur_subs:
            # The list was EMPTY at build time, so the subs table has no
            # row for it (build derives subs from assigned rows). Both
            # the append's _with_sub join and search() inner-join subs,
            # so without registering the cid here its vectors would be
            # silently dropped and the centroid never probed.
            new_subs[cid] = need
            subs_dirty = True
        elif need != cur_subs[cid]:
            new_subs[cid] = need
            rebucket.append(cid)

    def _with_sub(df, n_subs_map):
        m = spark.createDataFrame(
            [(int(c), int(n)) for c, n in n_subs_map.items()],
            "cid int, n_subs int",
        )
        return df.join(F.broadcast(m), "cid").select(
            "cid",
            F.pmod(F.xxhash64("vec_id"), F.col("n_subs"))
            .cast("int")
            .alias("sub"),
            "vec_id",
            "emb",
            "nrm",
        )

    append_part = assigned.where(~F.col("cid").isin(rebucket or [-1]))
    if append_part.limit(1).count():
        delta_writer.write(
            spark,
            _with_sub(append_part, new_subs),
            lists_path,
            mode="append",
        )
    if rebucket:
        moved = (
            idx.lists.where(F.col("cid").isin(rebucket))
            .select("cid", "vec_id", "emb", "nrm")
            .unionByName(assigned.where(F.col("cid").isin(rebucket)))
            .localCheckpoint()  # pin BEFORE the delete invalidates the scan
        )
        delta_writer.delete(
            spark, lists_path,
            f"cid IN ({', '.join(str(c) for c in rebucket)})",
        )
        delta_writer.write(
            spark, _with_sub(moved, new_subs), lists_path, mode="append"
        )
    if rebucket or subs_dirty:
        subs_df = spark.createDataFrame(
            [(int(c), int(n)) for c, n in sorted(new_subs.items())],
            "cid int, n_subs int",
        )
        delta_writer.write(spark, subs_df, subs_path, mode="overwrite")
    return {
        "numAdded": n_added,
        "numRebucketedLists": len(rebucket),
        "k": idx.k,
    }
