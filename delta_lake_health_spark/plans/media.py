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
