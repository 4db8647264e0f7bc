"""Multimodal plumbing tests (SURVEY §2.7): schema, mapInPandas batch
shape, deterministic decode/resize/frame-sample/featurize."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_health_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthetic_media(spark, 64).repartition(4).cache()


def test_decode(spark, media):
    dec = mm.decode_media(media)
    rows = dec.collect()
    assert len(rows) == 64
    by_id = {r.media_id: r for r in rows}
    assert by_id[0].media_type == "image" and by_id[0].n_frames == 1
    assert by_id[3].media_type == "video" and by_id[3].n_frames >= 4
    # deterministic: re-decoding yields identical checksums
    again = {r.media_id: r.checksum for r in mm.decode_media(media).collect()}
    assert {r.media_id: r.checksum for r in rows} == again


def test_decode_unknown_format_raises(spark):
    df = spark.createDataFrame(
        [(999, "image", b"JUNKDATA", (1, 1, 1, "x"))], mm.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        mm.decode_media(df).collect()


def test_resize(spark, media):
    resized = mm.resize_images(media, 16, 16)
    dec = {r.media_id: r for r in mm.decode_media(resized).collect()}
    orig = {r.media_id: r for r in mm.decode_media(media).collect()}
    for mid, r in dec.items():
        if r.media_type == "image":
            assert (r.width, r.height) == (16, 16)
            assert r.n_bytes == 16 * 16
        else:  # videos and bmp rows pass through untouched
            o = orig[mid]
            assert (r.width, r.height, r.checksum) == (
                o.width, o.height, o.checksum
            )


def test_sample_frames(spark, media):
    frames = mm.sample_frames(media, every_k=2).collect()
    vids = {r.media_id for r in frames}
    assert vids == {i for i in range(64) if i % 4 == 3}
    # frame indices are the sampled ones
    for mid in vids:
        idxs = sorted(r.frame_idx for r in frames if r.media_id == mid)
        assert idxs == list(range(0, max(idxs) + 1, 2))


def test_featurize(spark, media):
    emb = mm.featurize(media).collect()
    assert len(emb) == 64
    assert all(len(r.embedding) == mm.EMBED_DIM for r in emb)
    assert all(-1.0 <= v <= 1.0 for r in emb for v in r.embedding)
    # deterministic across runs
    emb2 = {r.media_id: r.embedding for r in mm.featurize(media).collect()}
    assert {r.media_id: r.embedding for r in emb} == emb2


def test_media_stats(spark, media):
    stats = {r.media_type: r for r in mm.media_stats(mm.decode_media(media)).collect()}
    assert stats["image"].n_media == 32
    assert stats["bmp"].n_media == 16
    assert stats["video"].n_media == 16
    assert stats["video"].total_frames > 16


def test_bmp_is_a_real_decode(spark):
    """The BMP path is a genuine image-format parse, not a stub: pixel
    bytes survive an encode→decode roundtrip including the bottom-up row
    flip and the 4-byte row padding (width 17 → 3 pad bytes/row), and the
    header decode agrees with the encoder's dimensions."""
    import hashlib

    w, h = 17, 5  # odd width forces non-zero row padding
    payload = mm.encode_bmp(7, w, h)
    d = mm._decode_payload(payload)
    assert (d["width"], d["height"], d["n_frames"]) == (w, h, 1)
    assert d["n_bytes"] == w * h * 3

    px = mm.bmp_pixels(payload)
    assert len(px) == w * h * 3
    for x, y in [(0, 0), (16, 0), (3, 4), (16, 4)]:
        want = hashlib.sha256(f"bmp:7:{x}:{y}".encode()).digest()[:3]
        assert px[(y * w + x) * 3 : (y * w + x) * 3 + 3] == want

    # and through the Spark mapInPandas stage
    df = spark.createDataFrame(
        [(7, "bmp", payload, (w, h, 1, "x"))], mm.MEDIA_SCHEMA
    )
    row = mm.decode_media(df).collect()[0]
    assert (row.width, row.height, row.n_bytes) == (w, h, w * h * 3)


def test_bmp_32bit_decode_matches_24bit_pixels():
    """32-bit BI_RGB: same header fields, n_bytes counts the decoded BGR
    bytes (alpha stripped), and the BGR pixel bytes are identical to the
    24-bit encoding of the same image."""
    import delta_lake_health_spark.operators.multimodal as mm

    w, h = 17, 9  # odd width: 24-bit rows need padding, 32-bit rows don't
    p24 = mm.encode_bmp(7, w, h, bpp=24)
    p32 = mm.encode_bmp(7, w, h, bpp=32)
    assert p24 != p32
    d = mm._decode_bmp_header(p32)
    assert (d["width"], d["height"], d["n_bytes"]) == (w, h, w * h * 3)
    px32 = mm.bmp_pixels(p32)
    assert len(px32) == w * h * 3
    assert px32 == mm.bmp_pixels(p24)
    # unsupported depth still refuses loudly
    import struct

    import pytest

    bad = p32[:28] + struct.pack("<H", 16) + p32[30:]
    with pytest.raises(NotImplementedError):
        mm._decode_bmp_header(bad)
