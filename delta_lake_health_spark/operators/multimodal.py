"""Multimodal column plumbing (SURVEY §2.7).

Media lives in DataFrames as an opaque ``binary`` column plus a typed
metadata struct; decode / resize / frame-sample / featurize run as
``mapInPandas`` stages (Arrow-batched, one Python worker per partition —
the only sanctioned Python hot path in this engine).

Decode support, in order of attempt:

- **BMP (real format)**: a hand-rolled 24-bit uncompressed BMP parser —
  header fields, bottom-up row order, and 4-byte row padding are decoded
  for real (``bmp_pixels`` returns the actual pixel bytes), so at least
  one genuine image format decodes with no codec library.
- **SIMG/SVID (synthetic)**: deterministic stand-in payloads (magic +
  header + bytes) for formats whose codecs aren't in this container.
- **Pillow fallback** for other real images when ``PIL`` is installed.

The Spark plumbing (schemas, batch iteration, partitioning) is identical
across all three, which is the part that matters at scale: a real codec
swap touches only ``_decode_payload``.

Scale: mapInPandas streams Arrow record batches — peak memory per task is
one batch (spark.sql.execution.arrow.maxRecordsPerBatch), not one
partition; media bytes never pass through the driver.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC_IMG = b"SIMG"
MAGIC_VID = b"SVID"

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("n_frames", IntegerType()),
                    StructField("source", StringType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
    ]
)

EMBED_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


# --- synthetic payload codec (the deterministic stand-in for real codecs) --

def encode_image(media_id: int, width: int, height: int) -> bytes:
    body = hashlib.sha256(f"img:{media_id}".encode()).digest()
    body = (body * ((width * height) // len(body) + 1))[: width * height]
    return MAGIC_IMG + struct.pack("<II", width, height) + body


def encode_video(media_id: int, width: int, height: int, n_frames: int) -> bytes:
    frames = b"".join(
        hashlib.sha256(f"vid:{media_id}:{f}".encode()).digest() for f in range(n_frames)
    )
    return MAGIC_VID + struct.pack("<III", width, height, n_frames) + frames


def encode_bmp(media_id: int, width: int, height: int, bpp: int = 24) -> bytes:
    """A REAL uncompressed BI_RGB BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER, bottom-up rows; 24-bit BGR with 4-byte row padding
    or 32-bit BGRA) with deterministic per-pixel bytes — an actual image
    format any viewer opens, so the decode path runs on genuine image
    bytes even though the container ships no codec library. The BGR
    channel bytes are identical for both depths; 32-bit adds an 0xFF
    alpha byte per pixel."""
    if bpp not in (24, 32):
        raise ValueError(f"bpp must be 24 or 32, got {bpp}")
    px_size = bpp // 8
    row_size = (width * px_size + 3) & ~3  # 32-bit rows are already aligned
    rows = []
    for y in range(height):
        row = bytearray()
        for x in range(width):
            row += hashlib.sha256(f"bmp:{media_id}:{x}:{y}".encode()).digest()[:3]
            if bpp == 32:
                row += b"\xff"
        row += b"\x00" * (row_size - len(row))
        rows.append(bytes(row))
    data = b"".join(reversed(rows))  # BMP stores rows bottom-up
    pixel_bytes = row_size * height
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + pixel_bytes, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bpp, 0, pixel_bytes,
        2835, 2835, 0, 0,
    )
    return header + info + data


def _decode_bmp_header(payload: bytes) -> dict:
    w, h = struct.unpack("<ii", payload[18:26])
    bpp = struct.unpack("<H", payload[28:30])[0]
    compression = struct.unpack("<I", payload[30:34])[0]
    if bpp not in (24, 32) or compression != 0:
        raise NotImplementedError(
            f"only 24/32-bit uncompressed (BI_RGB) BMP decodes here "
            f"(bpp={bpp}, compression={compression})"
        )
    height = abs(h)  # negative height = top-down row order
    # n_bytes = decoded BGR bytes (alpha stripped for 32-bit): 3 per pixel
    return {"width": w, "height": height, "n_frames": 1,
            "n_bytes": w * height * 3}


def bmp_pixels(payload: bytes) -> bytes:
    """Decode a 24/32-bit uncompressed BMP to top-down BGR pixel bytes —
    the real pixel decode: reads the data offset from the file header,
    strips the per-row 4-byte padding (24-bit) or the per-pixel alpha
    byte (32-bit), and un-flips the bottom-up row order. Both depths of
    the same image decode to identical BGR bytes."""
    data_offset = struct.unpack("<I", payload[10:14])[0]
    w, h = struct.unpack("<ii", payload[18:26])
    bpp = struct.unpack("<H", payload[28:30])[0]
    _decode_bmp_header(payload)  # validates bpp/compression
    height = abs(h)
    px_size = bpp // 8
    row_size = (w * px_size + 3) & ~3
    rows = []
    for r in range(height):
        row = payload[
            data_offset + r * row_size : data_offset + r * row_size + w * px_size
        ]
        if bpp == 32:
            row = b"".join(row[i : i + 3] for i in range(0, len(row), 4))
        rows.append(row)
    if h > 0:  # positive height = bottom-up storage
        rows.reverse()
    return b"".join(rows)


def _decode_payload(payload: bytes) -> dict:
    """Parse the payload header: real BMP, synthetic SIMG/SVID, then a
    Pillow fallback for other real image formats."""
    if payload[:2] == b"BM":
        return _decode_bmp_header(payload)
    if payload[:4] == MAGIC_IMG:
        w, h = struct.unpack("<II", payload[4:12])
        return {"width": w, "height": h, "n_frames": 1,
                "n_bytes": len(payload) - 12}
    if payload[:4] == MAGIC_VID:
        w, h, nf = struct.unpack("<III", payload[4:16])
        return {"width": w, "height": h, "n_frames": nf,
                "n_bytes": len(payload) - 16}
    try:  # pragma: no cover - codec not in this container
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload))
        return {"width": img.width, "height": img.height, "n_frames": 1,
                "n_bytes": len(payload)}
    except ImportError:
        raise NotImplementedError(
            "this payload needs an image codec (Pillow); only BMP and "
            "the synthetic SIMG/SVID formats decode codec-free"
        )


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """n deterministic media rows: synthetic images, real BMP images,
    and synthetic videos."""
    rows = []
    for i in range(n):
        if i % 4 == 3:
            w, h, nf = 32 + (i % 5) * 16, 24 + (i % 3) * 16, 4 + i % 5
            payload, mtype = encode_video(i, w, h, nf), "video"
        elif i % 4 == 1:
            w, h, nf = 16 + (i % 3) * 4, 12 + (i % 2) * 4, 1
            payload, mtype = encode_bmp(i, w, h, bpp=32 if i % 8 == 5 else 24), "bmp"
        else:
            w, h, nf = 64 + (i % 7) * 32, 48 + (i % 4) * 32, 1
            payload, mtype = encode_image(i, w, h), "image"
        rows.append((i, mtype, payload, (w, h, nf, f"synth://{i}")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# --- mapInPandas stages ------------------------------------------------------

def decode_media(media: DataFrame) -> DataFrame:
    """binary payload → typed decode record (header parse, checksum)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                d = _decode_payload(bytes(payload))
                out.append(
                    {
                        "media_id": int(mid),
                        "media_type": mtype,
                        **{k: d[k] for k in ("width", "height", "n_frames")},
                        "n_bytes": d["n_bytes"],
                        "checksum": hashlib.md5(bytes(payload)).hexdigest(),
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(fn, DECODED_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """image payloads → resized payloads (synthetic re-encode; a real
    build swaps the body for actual resampling). Videos pass through."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, payload, meta in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"], pdf["meta"]
            ):
                if mtype == "image":
                    payload = encode_image(int(mid), width, height)
                    meta = {**meta, "width": width, "height": height}
                rows.append(
                    {"media_id": int(mid), "media_type": mtype,
                     "payload": payload, "meta": meta}
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(fn, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """video payloads → one row per sampled frame (frame_idx, frame hash).
    Output is exploded, so downstream per-frame featurization stays
    embarrassingly parallel."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_checksum", StringType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                if mtype != "video":
                    continue
                payload = bytes(payload)
                _w, _h, nf = struct.unpack("<III", payload[4:16])
                frames = payload[16:]
                fsize = len(frames) // nf if nf else 0
                for idx in range(0, nf, every_k):
                    fr = frames[idx * fsize : (idx + 1) * fsize]
                    rows.append(
                        {"media_id": int(mid), "frame_idx": idx,
                         "frame_checksum": hashlib.md5(fr).hexdigest()}
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(fn, schema)


def featurize(media: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """payload → deterministic fake embedding (md5-seeded floats in
    [-1, 1]); the real featurizer would run a vision model here with the
    same signature."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                h = hashlib.md5(bytes(payload)).digest()
                vec = [
                    (h[j % len(h)] / 127.5 - 1.0) * (1 if j % 2 == 0 else -1)
                    for j in range(dim)
                ]
                rows.append({"media_id": int(mid), "embedding": vec})
            yield pd.DataFrame(rows)

    return media.mapInPandas(fn, FEATURE_SCHEMA)


def media_stats(decoded: DataFrame) -> DataFrame:
    """Plain DataFrame agg over the decoded records (JVM-side)."""
    return (
        decoded.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.avg("width").alias("avg_width"),
            F.avg("height").alias("avg_height"),
            F.sum("n_frames").alias("total_frames"),
        )
        .orderBy("media_type")
    )
