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
           CASE WHEN media_type IN ('bmp', 'png', 'gif') THEN 'bmp'
                ELSE media_type END AS media_type,
           CASE WHEN media_type IN ('bmp', 'png', 'gif', 'image') THEN 20
                ELSE width END AS width,
           CASE WHEN media_type IN ('bmp', 'png', 'gif', 'image') THEN 14
                ELSE height END AS height,
           CAST(CASE WHEN media_type = 'wav' THEN (n_frames + 2) // 3
                     ELSE n_frames END AS INT) AS n_frames,
           CAST(CASE WHEN media_type = 'wav' THEN sample_rate // 3
                     ELSE 0 END AS INT) AS sample_rate,
           CAST(CASE media_type
                     WHEN 'bmp'   THEN 20 * 14 * 3
                     WHEN 'gif'   THEN 20 * 14 * 3
                     WHEN 'png'   THEN 20 * 14 * 3
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
