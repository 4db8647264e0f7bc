"""Oracle-checked multimodal query (SURVEY §2.7).

``media_decode_roundtrip`` drives the REAL multimodal plumbing — binary
payload column → Arrow-batched ``mapInPandas`` decode — and the DuckDB
oracle checks it against the metadata the encoder logged next to the
payload: the decoded width/height/n_frames must round-trip through the
binary header, and n_bytes must equal the payload length minus the
header — for the real BMP/WAV/Y4M payloads, the decoded byte count from
a genuine format parse (BMP header fields + bottom-up rows + padding;
RIFF chunk walk to the PCM data chunk; YUV4MPEG2 FRAME-marker walk).
The checksum/featurize/frame-sample stages stay pytest-covered
(tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_health_spark.sources.fixture import (
    MEDIA_FIXTURE_PATH,
    ensure_media_fixture,
)

QUERIES: dict = {}
ORACLE: dict = {}

try:  # guarantee existence before the driver's oracle side runs
    ensure_media_fixture()
except Exception:  # pragma: no cover
    pass


def query(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


@query(
    "media_decode_roundtrip",
    f"""
    SELECT media_id, media_type, width, height, n_frames, sample_rate,
           CAST(CASE media_type
                     WHEN 'bmp'   THEN width * height * 3
                     WHEN 'gif'   THEN width * height * 3
                     WHEN 'png'   THEN width * height * 3
                     WHEN 'jpeg'  THEN width * height * 3
                     WHEN 'image' THEN octet_length(payload) - 12
                     WHEN 'video' THEN octet_length(payload) - 16
                     WHEN 'wav'   THEN n_frames * 2
                     WHEN 'y4m'   THEN n_frames * ((width * height * 3) // 2)
                END AS BIGINT) AS n_bytes
    FROM read_parquet('{MEDIA_FIXTURE_PATH}')
    ORDER BY media_id
    """,
)
def media_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_health_spark.operators.multimodal import decode_media

    path = ensure_media_fixture()
    media = spark.read.parquet(path).select("media_id", "media_type", "payload")
    return (
        decode_media(media)
        .select(
            "media_id", "media_type", "width", "height", "n_frames",
            "sample_rate", "n_bytes",
        )
        .orderBy("media_id")
    )


@query(
    "media_transform_roundtrip",
    f"""
    SELECT media_id,
           CASE WHEN media_type IN ('bmp', 'png', 'gif', 'jpeg') THEN 'bmp'
                ELSE media_type END AS media_type,
           CASE WHEN media_type IN ('bmp', 'png', 'gif', 'jpeg', 'image')
                THEN 20 ELSE width END AS width,
           CASE WHEN media_type IN ('bmp', 'png', 'gif', 'jpeg', 'image')
                THEN 14 ELSE height END AS height,
           CAST(CASE WHEN media_type = 'wav' THEN (n_frames + 2) // 3
                     ELSE n_frames END AS INT) AS n_frames,
           CAST(CASE WHEN media_type = 'wav' THEN sample_rate // 3
                     ELSE 0 END AS INT) AS sample_rate,
           CAST(CASE media_type
                     WHEN 'bmp'   THEN 20 * 14 * 3
                     WHEN 'gif'   THEN 20 * 14 * 3
                     WHEN 'png'   THEN 20 * 14 * 3
                     WHEN 'jpeg'  THEN 20 * 14 * 3
                     WHEN 'image' THEN 20 * 14
                     WHEN 'video' THEN octet_length(payload) - 16
                     WHEN 'wav'   THEN ((n_frames + 2) // 3) * 2
                     WHEN 'y4m'   THEN n_frames * ((width * height * 3) // 2)
                END AS BIGINT) AS n_bytes
    FROM read_parquet('{MEDIA_FIXTURE_PATH}')
    ORDER BY media_id
    """,
)
def media_transform_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL transform pipeline driver-checked end-to-end: resize all
    still images to 20x14 (decode -> numpy NN resample -> BMP re-encode)
    then decimate audio by 3 (samples[::3] at rate//3), re-decode, and
    compare the decoded metadata against the closed-form oracle over the
    fixture's logged metadata. Pixel/sample VALUE exactness is
    pytest-proven against pure-Python references
    (tests/test_multimodal.py); this query proves the composed
    mapInPandas stages run distributed and land the format-level
    contract on every payload."""
    from delta_lake_health_spark.operators.multimodal import (
        decimate_audio,
        decode_media,
        resize_images,
    )

    path = ensure_media_fixture()
    media = spark.read.parquet(path).select(
        "media_id", "media_type", "payload",
        F.struct(
            F.col("width").cast("int").alias("width"),
            F.col("height").cast("int").alias("height"),
            F.col("n_frames").cast("int").alias("n_frames"),
            F.lit("fixture").alias("source"),
        ).alias("meta"),
    )
    out = decimate_audio(resize_images(media, 20, 14), 3)
    return (
        decode_media(out)
        .select(
            "media_id", "media_type", "width", "height", "n_frames",
            "sample_rate", "n_bytes",
        )
        .orderBy("media_id")
    )


# --------------------------------------------------------------------------
# M6 — perceptual-hash near-duplicate image detection, oracle-checked
# with a closed-form expected pair set. The query builds 12 deterministic
# smooth gradient BMPs plus a 2x NEAREST-NEIGHBOR upscaled twin of each
# (ids +1000): because pHash first NN-normalizes every image to 32x32, an
# exact-integer-ratio NN resample commutes with that normalization, so
# each twin's 64-bit DCT hash is PROVABLY bit-identical to its original
# (hamming 0) while the 12 distinct patterns sit >= 22 bits apart
# (asserted in tests/test_phash.py). The expected near-dup pair set at
# max_distance=4 is therefore exactly {(i, i+1000, 0)} — the closed form
# the DuckDB oracle emits. The Spark side runs the REAL distributed
# pipeline: binary payloads -> Arrow-batched mapInPandas decode+DCT
# hash -> banded hamming-LSH pair join (shuffle on band buckets, never
# all-pairs).
_PHASH_N = 12


def _phash_gradient_bmp(seed: int, up: int = 1) -> bytes:
    """Deterministic smooth test pattern (mixed low-freq sinusoids),
    optionally NN-upscaled by an exact integer factor, as 24-bit BMP."""
    import numpy as np

    from delta_lake_health_spark.operators.multimodal import (
        encode_bmp_from_pixels,
    )

    w = h = 64
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    a, b, c = 1 + (seed % 3), 1 + (seed // 3) % 3, seed % 7
    g = (
        127.5
        + 40 * np.sin(2 * np.pi * (a * x / w + c / 7))
        + 40 * np.cos(2 * np.pi * (b * y / h + c / 11))
    )
    px = np.stack([np.clip(g, 0, 255).astype(np.uint8)] * 3, axis=-1)
    if up > 1:
        yi = (np.arange(up * h) * h) // (up * h)
        xi = (np.arange(up * w) * w) // (up * w)
        px = px[yi][:, xi]
    bgr = px[:, :, ::-1].tobytes()
    return encode_bmp_from_pixels(bgr, px.shape[1], px.shape[0])


@query(
    "media_phash_neardup",
    f"""
    SELECT CAST(i AS BIGINT) AS id_a,
           CAST(i + 1000 AS BIGINT) AS id_b,
           CAST(0 AS INT) AS hamming
    FROM range({_PHASH_N}) t(i)
    ORDER BY id_a
    """,
)
def media_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_health_spark.operators.multimodal import (
        phash_images,
        phash_neardup_pairs,
    )

    # the SAME generated corpus the persisted M10 index builds from
    # (one definition — M10's contract is bit-identity over it)
    hashed = phash_images(_phash_media_df(spark))
    return (
        phash_neardup_pairs(hashed, max_distance=4)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a")
    )


# --------------------------------------------------------------------------
# M10 — M6's near-dup pairs SERVED from the persisted pHash index
# (operators/phash_index.py, VERDICT r12 #4): the same closed-form
# oracle — served output must be bit-identical to the in-session
# decode+DCT+band-join pipeline, with the hash pass paid once at
# build time instead of per query.
def phash_index_path() -> str:
    """The /tmp location of the served-pHash artifact — ONE definition,
    shared with bench.py's force-rebuild. The M6 corpus is generated
    (not sf-dependent), so the path carries no sf tag."""
    return "/tmp/delta_lake_health_spark_fixture/phash_index"


def _phash_media_df(spark: SparkSession) -> DataFrame:
    rows = []
    for s in range(_PHASH_N):
        rows.append((s, "bmp", _phash_gradient_bmp(s)))
        rows.append((s + 1000, "bmp", _phash_gradient_bmp(s, up=2)))
    return spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    ).repartition(4)


def _phash_fixture(spark: SparkSession) -> str:
    import os

    from delta_lake_health_spark.operators import phash_index as pi
    from delta_lake_health_spark.sources.fixture import build_once

    path = phash_index_path()
    marker = os.path.join(path, "_PHASHIX_COMPLETE")

    def build() -> None:
        pi.build_phash_index(spark, _phash_media_df(spark), path)

    from delta_lake_health_spark.operators.multimodal import (
        PHASH_BANDS,
        PHASH_INPUT,
        PHASH_SIZE,
        phash64,
        phash_bands,
    )

    build_once(
        marker,
        build,
        clean=[path],
        salt=f"{_PHASH_N}|{PHASH_BANDS}|{PHASH_INPUT}|{PHASH_SIZE}",
        deps=(
            pi.build_phash_index,
            pi._index_rows,
            pi.hashed_rows,
            _phash_media_df,
            _phash_gradient_bmp,
            phash64,
            phash_bands,
        ),
    )
    return path


@query(
    "media_phash_served",
    f"""
    SELECT CAST(i AS BIGINT) AS id_a,
           CAST(i + 1000 AS BIGINT) AS id_b,
           CAST(0 AS INT) AS hamming
    FROM range({_PHASH_N}) t(i)
    ORDER BY id_a
    """,
)
def media_phash_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_health_spark.operators import phash_index as pi

    path = _phash_fixture(spark)
    return (
        pi.serve_neardup_pairs(spark, path, max_distance=4)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a")
    )


# --------------------------------------------------------------------------
# M7 — scene-change detection, oracle-checked with a closed-form boundary
# set: 10 constant-luma Y4M videos where video i cuts luma 50 -> 200 at
# frame (i % 5) + 3 (plus one cut-free video, id 10), so the detector —
# the real FRAME walk + mean-abs-luma-diff threshold inside Arrow-batched
# mapInPandas — must report exactly one boundary at the known index (or
# none). Constant planes make the expected diff exact (150 vs 0 against
# threshold 16), so the oracle derives every column from the id formula.
_SCENE_N = 10


@query(
    "media_scene_changes",
    f"""
    SELECT CAST(i AS BIGINT) AS media_id,
           CAST(10 AS INT) AS n_frames,
           CAST(CASE WHEN i < {_SCENE_N} THEN 2 ELSE 1 END AS INT)
             AS n_scenes,
           CAST(CASE WHEN i < {_SCENE_N} THEN (i % 5) + 3 END AS INT)
             AS first_boundary
    FROM range({_SCENE_N + 1}) t(i)
    ORDER BY media_id
    """,
)
def media_scene_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_health_spark.operators.multimodal import (
        detect_scene_changes,
        encode_y4m_from_lumas,
    )

    rows = []
    for i in range(_SCENE_N):
        cut = (i % 5) + 3
        rows.append(
            (i, "y4m", encode_y4m_from_lumas([50] * cut + [200] * (10 - cut)))
        )
    rows.append((_SCENE_N, "y4m", encode_y4m_from_lumas([50] * 10)))
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    ).repartition(4)
    return (
        detect_scene_changes(media, threshold=16.0)
        .select(
            "media_id",
            "n_frames",
            "n_scenes",
            F.expr("try_element_at(boundaries, 1)").alias("first_boundary"),
        )
        .orderBy("media_id")
    )


# --------------------------------------------------------------------------
# M8 — audio fingerprinting (Wang 2003 constellation hashing): clips cut
# from the fixture's WAV tracks at a known frame offset must match their
# source track through the hash-join voting path. Rows-only by design
# (rfft peaks are not SQL-expressible); the algorithm itself is
# parity-tested against the pure-numpy reference and the expected
# (source, offset) recovery in tests/test_audio_fp.py.
_CLIP_ID_BASE = 10_000
_CLIP_FRAMES = 7  # clip length in analysis frames


def _clip_offset_frames(media_id: int) -> int:
    return 2 + media_id % 3


def _fixture_clips(spark, wav: DataFrame) -> DataFrame:
    """Hop-aligned clips cut from every fixture WAV at the per-track
    known offset — shared by the in-session (M8) and served-index (M9)
    matching queries."""
    from typing import Iterator

    import pandas as pd

    from delta_lake_health_spark.operators import audio_fp

    def mk_clips(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from delta_lake_health_spark.operators.multimodal import (
            _decode_wav_header,
            encode_wav_from_samples,
            wav_samples,
        )

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                d = _decode_wav_header(payload)
                samples = wav_samples(payload)
                off = _clip_offset_frames(int(mid)) * audio_fp.HOP
                end = off + (
                    audio_fp.FRAME
                    + (_CLIP_FRAMES - 1) * audio_fp.HOP
                )
                clip = samples[off:end]
                rows.append(
                    {
                        "media_id": int(mid) + _CLIP_ID_BASE,
                        "payload": encode_wav_from_samples(
                            clip, d["sample_rate"]
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return wav.mapInPandas(mk_clips, "media_id long, payload binary")


@query("media_audio_fingerprint", None)
def media_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut a hop-aligned clip from every WAV track, fingerprint corpus
    and clips, and recover (source track, frame offset) per clip by
    constellation voting. Output: one row per clip with its best match."""
    from delta_lake_health_spark.operators import audio_fp

    path = ensure_media_fixture()
    wav = (
        spark.read.parquet(path)
        .where(F.col("media_type") == "wav")
        .select("media_id", "payload")
    )

    clips = _fixture_clips(spark, wav)
    corpus_fp = audio_fp.audio_fingerprints(wav)
    clip_fp = audio_fp.audio_fingerprints(clips)
    return (
        audio_fp.match_fingerprints(clip_fp, corpus_fp, top=1)
        .select(
            "q_media_id",
            "match_media_id",
            F.col("dt").cast("int").alias("dt"),
            "votes",
        )
        .orderBy("q_media_id")
    )


# --------------------------------------------------------------------------
# M9 — the same clip→track recovery SERVED from the persisted
# fingerprint index (VERDICT r10 #5): the index is built once per
# machine as a cluster_by(fp) Delta artifact, the probe fingerprints
# the clips with the index's stamped parameters and reads only the
# files whose fp range the clip hashes touch
# (DeltaLog.pruned_files_for_keys). Rows-only like M8 (rfft); the
# served==in-session bit-identity is pinned in tests/test_audio_fp.py.
@query("media_audio_fp_served", None)
def media_audio_fp_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os
    from delta_lake_health_spark.operators import audio_fp
    from delta_lake_health_spark.sources.fixture import build_once

    path = ensure_media_fixture()
    wav = (
        spark.read.parquet(path)
        .where(F.col("media_type") == "wav")
        .select("media_id", "payload")
    )
    idx_path = "/tmp/delta_lake_health_spark_fixture/audio_fp_index"
    marker = _os.path.join(idx_path, "_AFPIX_COMPLETE")

    def build() -> None:
        audio_fp.build_fp_index(spark, wav, idx_path)

    # the fixture payloads are version-stamped; salt ties the index to
    # that content version so a media-fixture bump rebuilds the index
    with open(path + ".version") as fh:
        build_once(
            marker,
            build,
            clean=[idx_path],
            salt=fh.read(),
            deps=(
                audio_fp.build_fp_index,
                audio_fp.audio_fingerprints,
                audio_fp.fingerprint_samples,
            ),
        )

    clips = _fixture_clips(spark, wav)
    return (
        audio_fp.match_against_index(spark, idx_path, clips, top=1)
        .select(
            "q_media_id",
            "match_media_id",
            F.col("dt").cast("int").alias("dt"),
            "votes",
        )
        .orderBy("q_media_id")
    )
