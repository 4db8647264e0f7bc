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
    dec = mm.decode_media(resized).collect()
    for r in dec:
        if r.media_type == "image":
            assert (r.width, r.height) == (16, 16)
            assert r.n_bytes == 16 * 16
        else:
            assert r.width != 16 or r.height != 16  # videos untouched


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
    assert stats["image"].n_media == 48
    assert stats["video"].n_media == 16
    assert stats["video"].total_frames > 16
