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
    assert by_id[3].media_type == "y4m" and by_id[3].n_frames >= 4
    assert by_id[7].media_type == "video" and by_id[7].n_frames >= 4
    assert by_id[6].media_type == "wav" and by_id[6].sample_rate == 8000
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
        o = orig[mid]
        if r.media_type == "image":
            assert (r.width, r.height) == (16, 16)
            assert r.n_bytes == 16 * 16
        elif o.media_type in ("bmp", "png", "gif", "jpeg"):
            # real NN resample: re-encoded as 24-bit BMP at the target
            assert r.media_type == "bmp"
            assert (r.width, r.height) == (16, 16)
        else:  # videos and audio pass through untouched
            assert (r.width, r.height, r.checksum) == (
                o.width, o.height, o.checksum
            )


def test_resize_real_pixels_match_reference(spark, media):
    """The resampled pixel VALUES equal a pure-Python nearest-neighbor
    reference computed from the original decoded pixels — for every
    decodable still format (BMP both depths, PNG, GIF)."""
    rows = {r.media_id: r for r in media.collect()}
    resized = {
        r.media_id: r
        for r in mm.resize_images(media, 9, 7).collect()
        if rows[r.media_id].media_type in ("bmp", "png", "gif")
    }
    assert len(resized) >= 10
    for mid, r in resized.items():
        src = rows[mid]
        sw, sh = src.meta.width, src.meta.height
        orig = mm.rgb_pixels(src.media_type, bytes(src.payload))
        got_bgr = mm.bmp_pixels(bytes(r.payload))
        for y in range(7):
            sy = (y * sh) // 7
            for x in range(9):
                sx = (x * sw) // 9
                want = orig[3 * (sy * sw + sx) : 3 * (sy * sw + sx) + 3]
                got = got_bgr[3 * (y * 9 + x) : 3 * (y * 9 + x) + 3]
                assert got == want[::-1], (mid, x, y)  # BGR vs RGB


def test_decimate_audio_real_samples(spark, media):
    """Decimated WAVs decode to exactly samples[::k] of the original at
    rate // k; non-audio rows pass through untouched."""
    orig = {r.media_id: r for r in media.collect()}
    out = {r.media_id: r for r in mm.decimate_audio(media, 3).collect()}
    n_wav = 0
    for mid, r in out.items():
        o = orig[mid]
        if o.media_type == "wav":
            n_wav += 1
            want = mm.wav_samples(bytes(o.payload))[::3]
            got = mm.wav_samples(bytes(r.payload))
            assert (got == want).all()
            od = mm._decode_wav_header(bytes(o.payload))
            nd = mm._decode_wav_header(bytes(r.payload))
            assert nd["sample_rate"] == od["sample_rate"] // 3
            assert r.meta.n_frames == len(want)
        else:
            assert bytes(r.payload) == bytes(o.payload)
    assert n_wav >= 5


def test_wav_from_samples_roundtrip():
    import numpy as np

    arr = (np.arange(24, dtype="<i2") * 371 % 32003 - 16000).reshape(-1, 2)
    payload = mm.encode_wav_from_samples(arr, 4000)
    assert (mm.wav_samples(payload) == arr).all()
    d = mm._decode_wav_header(payload)
    assert (d["sample_rate"], d["channels"]) == (4000, 2)


def test_bmp_from_pixels_roundtrip():
    import os as _os

    bgr = _os.urandom(5 * 3 * 3).replace(b"\x00", b"\x01")
    payload = mm.encode_bmp_from_pixels(bgr, 5, 3)
    assert mm.bmp_pixels(payload) == bgr
    assert mm._decode_bmp_header(payload)["width"] == 5


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
    assert stats["image"].n_media == 4
    assert stats["jpeg"].n_media == 4  # i % 16 == 8: half the old image slot
    assert stats["png"].n_media == 8
    assert stats["bmp"].n_media == 16
    assert stats["gif"].n_media == 8
    assert stats["video"].n_media == 8
    assert stats["y4m"].n_media == 8
    assert stats["wav"].n_media == 8
    assert stats["video"].total_frames > 8
    assert stats["y4m"].total_frames > 8


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


def test_wav_is_a_real_decode(spark):
    """The WAV path is a genuine RIFF parse: chunk walk (including an
    unknown word-aligned chunk injected between fmt and data), PCM16
    sample decode, and real DSP features from the actual sample values."""
    import struct

    import numpy as np

    payload = mm.encode_wav(11, n_samples=1000, sample_rate=16000)
    d = mm._decode_payload(payload)
    assert (d["n_frames"], d["sample_rate"], d["n_bytes"]) == (1000, 16000, 2000)
    assert (d["width"], d["height"]) == (0, 0)

    samples = mm.wav_samples(payload)
    assert samples.shape == (1000, 1)
    # samples are the encoder's sha256 stream, decoded little-endian
    import hashlib

    first_words = np.frombuffer(
        hashlib.sha256(b"wav:11:0").digest(), dtype="<i2"
    )
    assert list(samples[:16, 0]) == list(first_words)

    # inject an unknown odd-sized chunk before data: reader must skip it
    # (word-aligned) and still find fmt /data
    fmt_end = 12 + 8 + 16
    junk = b"LIST" + struct.pack("<I", 5) + b"abcde" + b"\x00"
    payload2 = payload[:fmt_end] + junk + payload[fmt_end:]
    d2 = mm._decode_payload(payload2)
    assert d2 == d
    assert np.array_equal(mm.wav_samples(payload2), samples)

    # non-PCM refuses loudly
    bad = payload[:20] + struct.pack("<H", 3) + payload[22:]
    with pytest.raises(NotImplementedError):
        mm._decode_payload(bad)

    # audio_features over the Spark stage: real numbers from real samples
    df = spark.createDataFrame(
        [(11, "wav", payload, (0, 0, 1000, "x"))], mm.MEDIA_SCHEMA
    )
    feat = mm.audio_features(df).collect()[0]
    mono = samples.astype(np.float64).mean(axis=1)
    assert feat.n_samples == 1000
    assert feat.duration_ms == pytest.approx(62.5)
    assert feat.rms == pytest.approx(float(np.sqrt(np.mean(mono**2))), rel=1e-6)
    assert feat.peak == int(np.abs(mono).max())
    assert feat.zero_crossings == int(
        np.count_nonzero(np.diff(np.signbit(mono)))
    )


def test_y4m_is_a_real_decode(spark):
    """The Y4M path is a genuine YUV4MPEG2 parse: header parameters,
    FRAME-marker walk (including markers carrying parameters), 4:2:0
    plane geometry, and frame extraction returning the actual YUV
    bytes."""
    import hashlib

    payload = mm.encode_y4m(9, 32, 24, 5)
    d = mm._decode_payload(payload)
    assert (d["width"], d["height"], d["n_frames"]) == (32, 24, 5)
    assert d["n_bytes"] == 5 * (32 * 24 * 3 // 2)

    frames = dict(mm.y4m_frames(payload))
    assert sorted(frames) == [0, 1, 2, 3, 4]
    # frame 2's bytes are exactly the encoder's deterministic plane bytes
    want = bytearray()
    i = 0
    while len(want) < 32 * 24 * 3 // 2:
        want += hashlib.sha256(f"y4m:9:2:{i}".encode()).digest()
        i += 1
    assert frames[2] == bytes(want[: 32 * 24 * 3 // 2])

    # FRAME markers may carry parameters (e.g. "FRAME Ixxx\n"): the
    # walker must honor the newline, not a fixed marker width
    head_end = payload.index(b"\n") + 1
    with_params = (
        payload[:head_end]
        + payload[head_end:].replace(b"FRAME\n", b"FRAME Ip\n", 1)
    )
    assert dict(mm.y4m_frames(with_params)) == frames

    # and through the Spark frame sampler (every_k=2 → frames 0,2,4)
    df = spark.createDataFrame(
        [(9, "y4m", payload, (32, 24, 5, "x"))], mm.MEDIA_SCHEMA
    )
    rows = mm.sample_frames(df, every_k=2).collect()
    assert sorted(r.frame_idx for r in rows) == [0, 2, 4]
    by_idx = {r.frame_idx: r.frame_checksum for r in rows}
    assert by_idx[2] == hashlib.md5(frames[2]).hexdigest()


# ---- GIF / LZW (round-5) ---------------------------------------------------

def _pack_lsb(codes, widths):
    """Independent LSB-first bit packer for hand-built LZW streams."""
    acc = nbits = 0
    out = bytearray()
    for c, w in zip(codes, widths):
        acc |= c << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_lzw_decode_hand_derived_vectors():
    """Ground truth worked by hand from the GIF spec's LZW semantics —
    NOT produced by our encoder, so encoder and decoder can't be wrong
    together."""
    from delta_lake_health_spark.operators.multimodal import _lzw_decode

    # mcs=2 (clear=4, end=5), all 3-bit codes:
    # 4(clear) 1 2 4(clear) 0 0 5(end)  ->  indices 1,2,0,0
    data = _pack_lsb([4, 1, 2, 4, 0, 0, 5], [3] * 7)
    assert _lzw_decode(data, 2) == bytes([1, 2, 0, 0])

    # KwKwK: 4(clear) 0 6 5(end) — code 6 not yet in the table ->
    # prev + prev[0] = 0,0 ; total output 0,0,0
    data = _pack_lsb([4, 0, 6, 5], [3] * 4)
    assert _lzw_decode(data, 2) == bytes([0, 0, 0])

    # dictionary reuse: 4(clear) 1 0 6 5(end) — 6 = "1,0" learned from
    # the first two literals -> output 1,0,1,0
    data = _pack_lsb([4, 1, 0, 6, 5], [3] * 5)
    assert _lzw_decode(data, 2) == bytes([1, 0, 1, 0])


def test_lzw_code_width_growth():
    """After the table fills 2^width entries the code width must grow
    (3 -> 4 bits with mcs=2): hand-packed stream with the width change
    at exactly the spec'd position."""
    from delta_lake_health_spark.operators.multimodal import _lzw_decode

    # mcs=2: base table len 6. Literals 0,1,2,3,0 learn 4 entries
    # (table 6->10); after the append that makes len==8 the width is 4,
    # so codes are 3,3,3 then 4-bit from the point len(table)==8.
    # Walk: clear(3b) 0(3b) 1(3b: len->7) 2(3b: len->8, width->4)
    #       3(4b: len->9) 0(4b: len->10) end(4b)
    codes = [4, 0, 1, 2, 3, 0, 5]
    widths = [3, 3, 3, 3, 4, 4, 4]
    data = _pack_lsb(codes, widths)
    assert _lzw_decode(data, 2) == bytes([0, 1, 2, 3, 0])


def test_gif_roundtrip_and_known_layout():
    from delta_lake_health_spark.operators.multimodal import (
        _decode_gif_header,
        _gif_palette,
        encode_gif,
        gif_pixels,
    )
    import hashlib as _hl

    payload = encode_gif(9, 10, 8)
    assert payload[:6] == b"GIF89a"
    assert payload[-1:] == b"\x3b"
    hdr = _decode_gif_header(payload)
    assert hdr == {"width": 10, "height": 8, "n_frames": 1,
                   "n_bytes": 10 * 8 * 3}
    rgb = gif_pixels(payload)
    assert len(rgb) == 10 * 8 * 3
    # first pixel: palette entry of the deterministic first index
    pal = _gif_palette(9)
    first_idx = _hl.sha256(b"gif:9:0").digest()[0]
    assert rgb[:3] == pal[3 * first_idx : 3 * first_idx + 3]


def test_gif_flows_through_decode_media(spark):
    from delta_lake_health_spark.operators.multimodal import (
        decode_media,
        synthetic_media,
    )

    media = synthetic_media(spark, 24)
    got = {
        r.media_id: r
        for r in decode_media(media).collect()
    }
    gif_ids = [i for i in range(24) if i % 8 == 2]
    assert gif_ids
    for i in gif_ids:
        r = got[i]
        assert r.media_type == "gif"
        assert r.n_bytes == r.width * r.height * 3
        assert r.n_frames == 1 and r.sample_rate == 0


def test_png_unfilter_hand_derived_vectors():
    """Decoder correctness against BY-HAND filter arithmetic (PNG spec
    §9), independent of our encoder: a 2x2 RGB image whose two scanlines
    use Sub then Paeth, with every reconstructed byte derived manually."""
    import struct
    import zlib

    from delta_lake_health_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        png_pixels,
    )

    # Row 0, filter 1 (Sub): raw = [10,20,30, 40,50,60]
    #   filtered[i] = raw[i] - raw[i-3]  -> [10,20,30, 30,30,30]
    # Row 1, filter 4 (Paeth): raw = [15,25,35, 45,55,65]
    #   x=0..2: left=0, up=row0[i], ul=0 -> predictor = up
    #     filtered = [15-10, 25-20, 35-30] = [5,5,5]
    #   x=3..5: left=row1[i-3], up=row0[i], ul=row0[i-3]
    #     p = left+up-ul: (15+40-10)=45->|p-a|=30,|p-b|=5,|p-c|=35 -> up
    #     (25+50-20)=55 -> up; (35+60-30)=65 -> up
    #     filtered = [45-40, 55-50, 65-60] = [5,5,5]
    filtered = bytes([1, 10, 20, 30, 30, 30, 30,
                      4, 5, 5, 5, 5, 5, 5])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(filtered))
        + _png_chunk(b"IEND", b"")
    )
    assert png_pixels(payload) == bytes(
        [10, 20, 30, 40, 50, 60, 15, 25, 35, 45, 55, 65]
    )


def test_png_roundtrip_all_filter_types():
    """encode_png cycles filters 0-4 across rows; decoding reproduces
    the deterministic sha256 pixel pattern exactly."""
    import hashlib

    from delta_lake_health_spark.operators.multimodal import (
        _decode_png_header,
        encode_png,
        png_pixels,
    )

    w, h = 9, 7  # 7 rows -> filters 0,1,2,3,4,0,1 all exercised
    payload = encode_png(3, w, h)
    assert _decode_png_header(payload) == {
        "width": w, "height": h, "n_frames": 1, "n_bytes": w * h * 3
    }
    want = b"".join(
        hashlib.sha256(f"png:3:{x}:{y}".encode()).digest()[:3]
        for y in range(h)
        for x in range(w)
    )
    assert png_pixels(payload) == want


def test_png_unsupported_shapes_raise():
    import struct
    import zlib

    import pytest

    from delta_lake_health_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        png_pixels,
    )

    # 16-bit depth refused
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="8-bit truecolor"):
        png_pixels(bad)
    # short pixel stream refused
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    short = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x01\x02"))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="short PNG"):
        png_pixels(short)


def test_png_flows_through_decode_media(spark):
    """PNG payloads decode through the Arrow-batched plumbing with the
    right header-derived metadata."""
    from delta_lake_health_spark.operators.multimodal import (
        decode_media,
        media_row,
        synthetic_media,
    )

    media = synthetic_media(spark, 64)
    got = {r.media_id: r for r in decode_media(media).collect()}
    png_ids = [i for i in range(64) if media_row(i)[0] == "png"]
    assert png_ids
    for i in png_ids:
        r = got[i]
        assert r.media_type == "png"
        assert r.n_bytes == r.width * r.height * 3
        assert r.n_frames == 1 and r.sample_rate == 0


def test_scene_change_detection(spark):
    """Known constant-luma cuts are found exactly; gradual drift below
    the threshold is not a boundary; the real fixture videos decode
    through the same path without error."""
    from delta_lake_health_spark.operators.multimodal import (
        detect_scene_changes,
        encode_y4m_from_lumas,
        synthetic_media,
    )

    rows = [
        (0, "y4m", encode_y4m_from_lumas([50] * 4 + [200] * 4)),   # one cut
        (1, "y4m", encode_y4m_from_lumas([50] * 8)),                # none
        (2, "y4m", encode_y4m_from_lumas(list(range(60, 140, 10)))),  # drift
        (3, "y4m", encode_y4m_from_lumas([50, 200, 50, 200])),      # 3 cuts
    ]
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    )
    got = {
        r.media_id: (r.n_frames, r.n_scenes, list(r.boundaries))
        for r in detect_scene_changes(media, threshold=16.0).collect()
    }
    assert got[0] == (8, 2, [4])
    assert got[1] == (8, 1, [])
    assert got[2] == (8, 1, [])   # 10-luma steps < threshold 16
    assert got[3] == (4, 4, [1, 2, 3])
    # fixture videos run through the same path (non-video rows dropped)
    fx = detect_scene_changes(synthetic_media(spark, 24)).collect()
    assert all(r.n_frames >= 1 for r in fx)
