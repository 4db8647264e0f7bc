"""Persisted pHash image near-dup index (M10, VERDICT r12 #4) — the
last modality without an artifact: M6's banded hamming-LSH
(``operators/multimodal.phash_images`` / ``phash_neardup_pairs``)
recomputes the decode + DCT hash pass per run; a production image
pipeline pays it ONCE per image and serves near-dup pairs and novelty
probes from a Delta artifact, exactly like the text-shingle (X17),
BM25 (T34), audio (M9), and vector (S5/S16) families.

Layout (the X17 one-table convention — ONE data table so an upsert is
ONE atomic commit, no crash window between halves):

- ``bands`` — a single Delta table hive-partitioned by ``kind``:
  * ``kind=band`` rows (media_id, band_code, phash): the 4 hamming-LSH
    band buckets per image, where ``band_code = band_idx * 2^16 +
    band_key`` packs the bucket identity into ONE range-prunable long;
    written ``cluster_by("band_code")`` so probes touch only the files
    whose code range their bands hit. The row carries the full 64-bit
    ``phash`` so the exact-hamming verify never joins a second table.
  * ``kind=img`` rows (media_id, phash, band_code NULL): the seen-set
    sidecar, physically separated by the partition — upsert anti-joins
    and membership checks read ONLY this small partition.

Maintenance contract (r13): clustering DECLARED + autoCompact stamped
at build, so upsert appends range-sort themselves and small files
bin-pack automatically with band_code pruning preserved.

Reference parity note: the reference repo has no media surface; this
is LLM-pipeline scope (brief §"multimodal"), modeled on
``operators/minhash_index.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BAND = "band"
_IMG = "img"


def _data_path(path: str) -> str:
    return os.path.join(path, "bands")


def _log(spark, data: str):
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    return DeltaLog(spark, data)


def hashed_rows(media: DataFrame) -> DataFrame:
    """(media_id, phash, band_code) — one decode+DCT pass per image,
    four band rows out (the shared probe/build/upsert unit). Input is
    (media_id, media_type, payload); non-still rows are dropped by
    ``phash_images``. Batches carrying the same media_id keep the max
    phash deterministically (which VERSION wins is the ingest door's
    decision, mirroring the minhash index)."""
    from delta_lake_health_spark.operators.multimodal import phash_images

    # one-row pick via struct max: phash and bands must come from the
    # SAME row (bands are a bit-split of the hash — mixing two rows'
    # max() values would desynchronize them)
    hashed = (
        phash_images(media)
        .groupBy("media_id")
        .agg(F.max(F.struct("phash", "bands")).alias("pick"))
        .select("media_id", "pick.phash", "pick.bands")
    )
    return hashed.select(
        "media_id",
        "phash",
        F.posexplode("bands").alias("band_idx", "band_key"),
    ).select(
        "media_id",
        "phash",
        (F.col("band_idx").cast("long") * 65536 + F.col("band_key")).alias(
            "band_code"
        ),
    )


def _index_rows(media: DataFrame, rows: DataFrame | None = None) -> DataFrame:
    """Band rows under kind=band plus one seen-set row per image under
    kind=img, in ONE DataFrame → ONE commit. ``rows``: optional
    precomputed ``hashed_rows`` output for ``media``."""
    if rows is None:
        rows = hashed_rows(media)
    bands = rows.select(
        F.lit(_BAND).alias("kind"), "media_id", "band_code", "phash"
    )
    seen = (
        rows.groupBy("media_id")
        .agg(F.max("phash").alias("phash"))
        .select(
            F.lit(_IMG).alias("kind"),
            "media_id",
            F.lit(None).cast("long").alias("band_code"),
            "phash",
        )
    )
    return bands.unionByName(seen)


def build_phash_index(spark, media: DataFrame, path: str) -> dict:
    """Materialize the artifact from ``media`` (media_id, media_type,
    payload). Clustering by band_code is DECLARED (liquid clustering)
    and autoCompact stamped (D57) — the self-maintaining-artifact
    contract all five other index families follow."""
    from delta_lake_health_spark.sources import delta_writer

    data = _data_path(path)
    delta_writer.write(
        spark,
        _index_rows(media),
        data,
        mode="overwrite",
        partition_by=["kind"],
        cluster_by=["band_code", "media_id"],
    )
    delta_writer.set_cluster_columns(spark, data, ["band_code", "media_id"])
    delta_writer.set_table_property(
        spark, data, "delta.autoOptimize.autoCompact", "true"
    )
    n = _seen(spark, _log(spark, data)).count()
    return {"path": path, "n_images": int(n)}


def _seen(spark, log) -> DataFrame:
    """The kind=img partition — partition-pruned scan."""
    return (
        log.snapshot()
        .where(F.col("kind") == _IMG)
        .select("media_id", "phash")
    )


def _band_scan(spark, log) -> DataFrame:
    return (
        log.snapshot()
        .where(F.col("kind") == _BAND)
        .select("media_id", "band_code", "phash")
    )


def upsert_phash_index(spark, path: str, new_media: DataFrame) -> dict:
    """Add ``new_media`` without rebuilding: ONE pure-append commit
    carries the new band AND seen-set rows (|new images| decode+hash +
    write cost). Images already indexed are skipped by media_id
    (anti-join against the kind=img partition — a crash-replayed batch
    is an exact no-op)."""
    from delta_lake_health_spark.sources import delta_writer

    data = _data_path(path)
    known = _seen(spark, _log(spark, data)).select("media_id")
    fresh = (
        new_media.select("media_id", "media_type", "payload")
        .dropDuplicates(["media_id"])
        .join(known, "media_id", "left_anti")
        .localCheckpoint()
    )
    rows = hashed_rows(fresh).localCheckpoint()
    n_new = rows.select("media_id").distinct().count()
    if n_new == 0:
        return {"numImagesAdded": 0}
    delta_writer.write(spark, _index_rows(fresh, rows=rows), data, mode="append")
    return {"numImagesAdded": int(n_new)}


def serve_neardup_pairs(
    spark, path: str, max_distance: int = 10
) -> DataFrame:
    """M6's near-dup pairs served from the artifact — bit-identical to
    ``phash_neardup_pairs`` over the in-session hash pass (the packed
    band_code join IS the (band_idx, band_key) bucket join), with the
    decode+DCT pass already paid at build/upsert time. Reads only the
    kind=band partition."""
    b = _band_scan(spark, _log(spark, _data_path(path)))
    left = b.select(
        F.col("media_id").alias("id_a"),
        F.col("phash").alias("h_a"),
        "band_code",
    )
    right = b.select(
        F.col("media_id").alias("id_b"),
        F.col("phash").alias("h_b"),
        "band_code",
    )
    cand = (
        left.join(right, ["band_code"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    dist = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("int")
    return cand.select("id_a", "id_b", dist.alias("hamming")).where(
        F.col("hamming") <= max_distance
    )


def probe_phash_index(
    spark, path: str, media: DataFrame, max_distance: int = 10
) -> DataFrame:
    """Corpus-door novelty probe: which INDEXED images sit within
    ``max_distance`` hamming bits of each incoming image? Returns
    (probe_media_id, index_media_id, hamming) distinct rows. Scale
    shape: |new| decode+hash cost; the index scan is file-pruned to the
    band_code ranges the probe actually hits (broadcast range join over
    the log's per-file stats — metadata only); the bucket join then
    runs on |touched files| rows, never the corpus; the exact hamming
    verify touches only band collisions."""
    data = _data_path(path)
    log = _log(spark, data)
    probe = hashed_rows(media).localCheckpoint()
    paths = log.pruned_files_for_keys(
        probe.select("band_code"),
        "band_code",
        partition_filter={"kind": _BAND},
    )
    if not paths:
        return spark.createDataFrame(
            [], "probe_media_id long, index_media_id long, hamming int"
        )
    idx = (
        spark.read.option("basePath", data)
        .parquet(*[os.path.join(data, p) for p in paths])
        .select("media_id", "band_code", "phash")
    )
    dist = F.bit_count(
        F.col("probe_phash").bitwiseXOR(F.col("index_phash"))
    ).cast("int")
    return (
        probe.join(idx, ["band_code"])
        .select(
            probe.media_id.alias("probe_media_id"),
            idx.media_id.alias("index_media_id"),
            probe.phash.alias("probe_phash"),
            idx.phash.alias("index_phash"),
        )
        .where(F.col("probe_media_id") != F.col("index_media_id"))
        .distinct()
        .select(
            "probe_media_id",
            "index_media_id",
            dist.alias("hamming"),
        )
        .where(F.col("hamming") <= max_distance)
    )
