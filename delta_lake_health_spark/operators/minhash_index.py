"""Persisted MinHash-LSH near-dup index (X17, VERDICT r11 #3) — build
once, serve candidate pairs and novelty probes many times.

The registry query (``dedup_minhash_pairs``, X3) recomputes shingles,
md5 digests, and 16-hash signatures over the whole corpus per run so
the DuckDB oracle can replay it; at 100 TB the signature pass is the
dominant cost and a production pipeline pays it ONCE per document.
Layout (same one-table convention as ``operators/text_index.py`` — one
data table so an upsert is ONE atomic commit, no crash window between
halves):

- ``bands`` — a single Delta table hive-partitioned by ``kind``:
  * ``kind=band`` rows (doc_id, band_idx, band_key): the LSH band
    buckets, written ``cluster_by("band_key")`` so a novelty probe
    touches only the files whose key range its bands actually hit;
  * ``kind=doc`` rows (doc_id, band_idx/band_key NULL): the seen-set
    sidecar, physically separated by the partition, so the upsert
    anti-join and any membership check read ONLY this small partition.

Serving:
- ``serve_candidate_pairs`` replays X3's bucket-join stage over the
  stored band rows — bit-identical to ``dedup_minhash_pairs`` with the
  signature pass already paid (shared ``candidate_pairs_from_bands``,
  plans/dedup.py, so the two can never diverge);
- ``probe_minhash_index`` is the corpus-door novelty check: band the
  incoming docs (|new| signature cost), file-prune the index scan by
  band_key through the log's per-file stats, and bucket-join only the
  touched files — never a corpus pass. Composes with X16's streaming
  dedup ingest as the NEAR-dup door.

``upsert_minhash_index`` is the ``delta_tail``-compatible freshness
path: one append-only commit carrying the new docs' band AND seen-set
rows (|new docs| write cost), with an anti-join against the ``kind=doc``
partition making replayed batches exact no-ops.

Reference parity note: the reference repo has no dedup surface; this is
LLM-pipeline scope (brief §"training-data pipeline"), modeled on the
persisted BM25 layout of ``operators/text_index.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BAND = "band"
_DOC = "doc"


def _data_path(path: str) -> str:
    return os.path.join(path, "bands")


def _index_rows(docs: DataFrame, bands: DataFrame | None = None) -> DataFrame:
    """Band rows under kind=band plus one seen-set row per doc under
    kind=doc — both halves of a document's state in ONE DataFrame so
    they land in ONE commit. The input is deduped by doc_id FIRST
    (r12 review): the upsert anti-join only screens docs already
    INDEXED, so a batch carrying the same id twice would otherwise
    write duplicate band rows, and the posting list [x, x] expands to
    the self-pair (x, x) — an output X3's a<b oracle can never emit.

    ``bands``: optional PRECOMPUTED ``plans/dedup.band_rows`` output for
    ``docs`` (the streaming corpus door already paid the signature pass
    for its novelty probe — don't pay it twice). Caller contract: the
    band rows were computed from exactly these (doc_id, text) rows; they
    are re-aligned to the deduped doc set by a semi-join, never trusted
    for ids the doc set doesn't carry."""
    from delta_lake_health_spark.plans.dedup import band_rows

    # deterministic pick among conflicting duplicates (max text per
    # id): which VERSION wins is the ingest door's decision; the index
    # only guarantees build and upsert agree given the same rows
    stats = docs.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_n"), F.max("text").alias("text")
    )
    docs = stats.select("doc_id", "text")
    if bands is None:
        bands = band_rows(docs)
    else:
        # r13 review: for ids the batch carried MORE THAN ONCE the
        # precomputed bands are ambiguous (they may mix two texts'
        # rows — the r12 self-pair bug through the fast path) —
        # recompute bands for exactly those ids from the chosen text;
        # the clean side is a pure semi-join re-alignment
        clean = stats.where(F.col("_n") == 1).select("doc_id")
        conflicted = stats.where(F.col("_n") > 1).select(
            "doc_id", "text"
        )
        bands = (
            bands.select("doc_id", "band_idx", "band_key")
            .join(clean, "doc_id", "left_semi")
            .unionByName(band_rows(conflicted))
        )
    band_half = bands.select(
        F.lit(_BAND).alias("kind"), "doc_id", "band_idx", "band_key"
    )
    seen = docs.select(
        F.lit(_DOC).alias("kind"),
        "doc_id",
        F.lit(None).cast("int").alias("band_idx"),
        F.lit(None).cast("string").alias("band_key"),
    )
    return band_half.unionByName(seen)


def build_minhash_index(
    spark, docs: DataFrame, path: str, bands: DataFrame | None = None
) -> dict:
    """Materialize the LSH artifact from ``docs`` (doc_id, text).
    Clustering by band_key is DECLARED (liquid clustering) so upsert
    appends range-sort their own batches and a bare OPTIMIZE re-narrows
    the file ranges as the corpus grows. ``bands``: optional
    precomputed band rows for ``docs`` (see ``_index_rows``)."""
    from delta_lake_health_spark.sources import delta_writer

    data = _data_path(path)
    delta_writer.write(
        spark,
        _index_rows(docs, bands=bands),
        data,
        mode="overwrite",
        partition_by=["kind"],
        cluster_by=["band_key", "doc_id"],
    )
    delta_writer.set_cluster_columns(spark, data, ["band_key", "doc_id"])
    # upsert-heavy artifact: declare autoCompact (D57) so small upsert
    # files bin-pack themselves — the cluster-aware compact re-sorts by
    # the declared columns, keeping band_key file pruning sharp
    delta_writer.set_table_property(
        spark, data, "delta.autoOptimize.autoCompact", "true"
    )
    n_docs = _seen_docs(spark, _log(spark, data)).count()
    return {"path": path, "n_docs": int(n_docs)}


def _log(spark, data: str):
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    return DeltaLog(spark, data)


def _seen_docs(spark, log) -> DataFrame:
    """The kind=doc partition (doc_id) — partition-pruned scan."""
    return (
        log.snapshot().where(F.col("kind") == _DOC).select("doc_id")
    )


def _band_scan(spark, log) -> DataFrame:
    return (
        log.snapshot()
        .where(F.col("kind") == _BAND)
        .select("doc_id", "band_idx", "band_key")
    )


def upsert_minhash_index(
    spark, path: str, new_docs: DataFrame, bands: DataFrame | None = None
) -> dict:
    """Add ``new_docs`` (doc_id, text) without rebuilding: ONE
    pure-append commit carries both the new band rows and the new
    seen-set rows (|new docs| signature + write cost). Docs already
    indexed are skipped by doc_id (anti-join against the kind=doc
    partition — a crash-replayed batch is an exact no-op).
    ``bands``: optional precomputed band rows for ``new_docs`` (see
    ``_index_rows``) — the corpus door's one-signature-pass path."""
    from delta_lake_health_spark.sources import delta_writer

    data = _data_path(path)
    known = _seen_docs(spark, _log(spark, data))
    # keep the RAW per-row shape through the anti-join: _index_rows
    # owns the per-id dedup AND the conflicting-duplicate band
    # recompute for every caller (r13 review: collapsing to one row
    # per id here made the conflict guard downstream unreachable — a
    # batch carrying (7, A) and (7, B) with precomputed bands kept
    # BOTH texts' band rows)
    fresh = (
        new_docs.select("doc_id", "text")
        .join(known, "doc_id", "left_anti")
        .localCheckpoint()
    )
    n_new = fresh.select("doc_id").distinct().count()
    if n_new == 0:
        return {"numDocsAdded": 0}
    delta_writer.write(
        spark, _index_rows(fresh, bands=bands), data, mode="append"
    )
    return {"numDocsAdded": int(n_new)}


def serve_candidate_pairs(spark, path: str) -> DataFrame:
    """X3's candidate pairs served from the artifact — bit-identical to
    ``dedup_minhash_pairs`` (same bucket join, same BUCKET_CAP, same
    ordering), with the per-doc signature pass already paid at
    build/upsert time. Reads only the kind=band partition."""
    from delta_lake_health_spark.plans.dedup import (
        candidate_pairs_from_bands,
    )

    return candidate_pairs_from_bands(
        _band_scan(spark, _log(spark, _data_path(path)))
    )


def probe_minhash_index(
    spark, path: str, docs: DataFrame, bands: DataFrame | None = None
) -> DataFrame:
    """Corpus-door novelty probe: which INDEXED docs share an LSH band
    bucket with each incoming doc? Returns (probe_doc_id,
    index_doc_id) distinct pairs. Scale shape: the incoming docs pay
    |new| signature cost; the index scan is file-pruned to the band_key
    ranges the probe bands actually hit (broadcast range join over the
    log's per-file stats — metadata only); the bucket join then runs on
    |touched files| rows, never the corpus. ``bands``: optional
    precomputed band rows for ``docs`` (the corpus door shares one
    signature pass between probe, in-batch pairs, and index upsert)."""
    from delta_lake_health_spark.plans.dedup import band_rows

    data = _data_path(path)
    log = _log(spark, data)
    # lazy (r14): the file-pruning collect right below is the first
    # consumer and materializes the checkpoint inside its own job — the
    # eager form paid a separate signature-pass job first for nothing
    probe = (band_rows(docs) if bands is None else bands).localCheckpoint(
        eager=False
    )
    paths = log.pruned_files_for_keys(
        probe.select("band_key"), "band_key", partition_filter={"kind": _BAND}
    )
    if not paths:
        return spark.createDataFrame(
            [], "probe_doc_id long, index_doc_id long"
        )
    idx = (
        spark.read.option("basePath", data)
        .parquet(*[os.path.join(data, p) for p in paths])
        .select("doc_id", "band_idx", "band_key")
    )
    return (
        probe.join(idx, ["band_idx", "band_key"])
        .select(
            probe.doc_id.alias("probe_doc_id"),
            idx.doc_id.alias("index_doc_id"),
        )
        .where(F.col("probe_doc_id") != F.col("index_doc_id"))
        .distinct()
    )


def verified_probe(
    spark,
    path: str,
    probes: DataFrame,
    corpus_docs: DataFrame,
    threshold: float | None = None,
) -> DataFrame:
    """X17c — the thresholded corpus-door DECISION on top of the raw
    band-collision probe: every candidate pair from
    ``probe_minhash_index`` is verified with the exact shingle-set
    Jaccard (X5's form, shared ``plans/dedup.doc_shingles``), then each
    probe doc gets ONE row: (probe_doc_id, best_match, jaccard,
    is_dup). ``best_match`` is the highest-Jaccard indexed doc
    (6-dp-rounded score, ties to the smallest doc_id); novel docs —
    no band collision, or collisions sharing zero shingles — carry
    NULL match and ``is_dup = 0``.

    Scale shape: candidates are LSH-bounded (never corpus²); the
    corpus text scan is pruned to the matched index docs via a
    broadcast semi-join, so the verify stage pays |probe| + |matched
    docs| shingle passes and shuffles only candidate-pair rows."""
    from pyspark.sql import Window

    from delta_lake_health_spark.plans.dedup import (
        JACCARD_THRESHOLD,
        doc_shingles,
    )

    thr = JACCARD_THRESHOLD if threshold is None else threshold
    # small by construction (LSH candidates of the probe batch) and
    # referenced twice below — checkpointed so the band join runs once;
    # LAZY (r14, VERDICT r13 #3: this query's cost was a serial chain of
    # tiny jobs): the first consumer inside the verify job materializes
    # it, the second reads the stored partitions — one job instead of an
    # eager materialization job plus the verify job
    cand = probe_minhash_index(spark, path, probes).localCheckpoint(
        eager=False
    )
    hit = cand.select(F.col("index_doc_id").alias("doc_id")).distinct()
    idx_docs = corpus_docs.select("doc_id", "text").join(
        F.broadcast(hit), "doc_id", "left_semi"
    )
    psh = doc_shingles(probes.select("doc_id", "text"))
    ish = doc_shingles(idx_docs)
    psz = psh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("np"))
    isz = ish.groupBy("doc_id").agg(F.count(F.lit(1)).alias("ni"))
    shared = (
        cand.join(
            psh.withColumnRenamed("doc_id", "probe_doc_id"),
            "probe_doc_id",
        )
        .join(
            ish.withColumnRenamed("doc_id", "index_doc_id"),
            ["index_doc_id", "shingle"],
        )
        .groupBy("probe_doc_id", "index_doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    verified = (
        shared.join(
            psz.withColumnRenamed("doc_id", "probe_doc_id"),
            "probe_doc_id",
        )
        .join(
            isz.withColumnRenamed("doc_id", "index_doc_id"),
            "index_doc_id",
        )
        .select(
            "probe_doc_id",
            "index_doc_id",
            # round BEFORE the argmax so the tie-break (and the oracle's)
            # operates on identical 6-dp values in both engines
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("np") + F.col("ni") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )
    w = Window.partitionBy("probe_doc_id").orderBy(
        F.desc("jaccard"), F.asc("index_doc_id")
    )
    best = (
        verified.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "probe_doc_id",
            F.col("index_doc_id").alias("best_match"),
            "jaccard",
        )
    )
    return (
        probes.select(F.col("doc_id").alias("probe_doc_id"))
        .join(best, "probe_doc_id", "left")
        .select(
            "probe_doc_id",
            "best_match",
            "jaccard",
            # NULL jaccard (novel doc) compares NULL -> otherwise(0)
            F.when(F.col("jaccard") >= thr, F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("is_dup"),
        )
    )
