"""From-scratch baseline JPEG codec — operators/jpeg.py (M2).

The decode path is pinned by HAND-DERIVED vectors that do not pass
through the encoder: minimal grayscale streams are assembled marker by
marker in the test, and the expected pixels come straight from the DCT
definition —

- a single DC coefficient D (dequantized) decodes to the flat value
  D/8 + 128 (the u=v=0 basis is constant 1/8);
- a single AC coefficient decodes to the corresponding separable cosine
  basis image, computed here with math.cos, independent of the codec's
  matrix.

Plus: encoder roundtrip error bound at quant=1, spec-conformance
refusals (progressive SOF2, subsampled streams), and the fixture
integration (decode / resize / pHash accept jpeg rows).
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from delta_lake_health_spark.operators import jpeg, multimodal
from delta_lake_health_spark.operators.jpeg import (
    _AC_BITS,
    _AC_VALUES,
    _DC_BITS,
    _DC_VALUES,
    _BitWriter,
    _build_codes,
    _dht_segment,
)


def _gray_stream(coeffs: dict[int, int], quant: int = 1) -> bytes:
    """Assemble a minimal single-block grayscale baseline JPEG whose
    quantized coefficients (by ZIGZAG position) are ``coeffs`` — built
    by hand from the marker layout, NOT via encode_jpeg_from_rgb."""
    dc_codes = _build_codes(_DC_BITS, _DC_VALUES)
    ac_codes = _build_codes(_AC_BITS, _AC_VALUES)
    w = _BitWriter()
    dc = coeffs.get(0, 0)
    size = 0 if dc == 0 else abs(dc).bit_length()
    code, length = dc_codes[size]
    w.put(code, length)
    if size:
        w.put(dc if dc > 0 else dc + (1 << size) - 1, size)
    run = 0
    for k in range(1, 64):
        v = coeffs.get(k, 0)
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            w.put(code, length)
            run -= 16
        size = abs(v).bit_length()
        code, length = ac_codes[(run << 4) | size]
        w.put(code, length)
        w.put(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        code, length = ac_codes[0x00]
        w.put(code, length)
    data = w.flush()

    qz = bytes([quant] * 64)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qz
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_BITS, _DC_VALUES)
    out += _dht_segment(1, 0, _AC_BITS, _AC_VALUES)
    sos = b"\x01" + bytes([1, 0x00]) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += data + b"\xff\xd9"
    return bytes(out)


def test_hand_vector_flat_dc_block():
    """DC-only block: quantized DC 24 at quant step 16 dequantizes to
    384; the orthonormal u=v=0 basis is constant 1/8, so every pixel is
    384/8 + 128 = 176 exactly."""
    w, h, nc, px = jpeg.decode_jpeg(_gray_stream({0: 24}, quant=16))
    assert (w, h, nc) == (8, 8, 1)
    vals = np.frombuffer(px, np.uint8).reshape(8, 8, 3)
    assert vals.min() == vals.max() == 176


def test_hand_vector_negative_dc():
    """DC -40 at quant 8 -> -320/8 + 128 = 88 (exercises the one's-
    complement negative value bits)."""
    _, _, _, px = jpeg.decode_jpeg(_gray_stream({0: -40}, quant=8))
    vals = np.frombuffer(px, np.uint8).reshape(8, 8, 3)
    assert vals.min() == vals.max() == 88


def test_hand_vector_single_ac_basis():
    """One AC coefficient at zigzag position 1 (natural (u=0, v=1)):
    pixel(y, x) = a * (1/sqrt(8)) * (1/2) cos((2x+1) pi / 16) + 128,
    computed here from math.cos — independent of the codec's DCT
    matrix. Rows must be identical (u=0), columns follow the cosine."""
    a = 80
    _, _, _, px = jpeg.decode_jpeg(_gray_stream({0: 0, 1: a}, quant=1))
    vals = np.frombuffer(px, np.uint8).reshape(8, 8, 3)[:, :, 0].astype(int)
    for x in range(8):
        expected = a * (1 / math.sqrt(8)) * 0.5 * math.cos(
            (2 * x + 1) * math.pi / 16
        ) + 128
        col = vals[:, x]
        assert col.min() == col.max(), "u=0 basis must be row-constant"
        assert abs(col[0] - expected) <= 1, (x, col[0], expected)


def test_roundtrip_error_bound():
    """encode(quant=1) -> decode: per-pixel error bounded by DCT float
    rounding + YCbCr conversion (<= 4), not content-dependent drift."""
    import hashlib

    w, h = 23, 17  # non-multiples of 8: exercises edge padding
    rgb = bytearray()
    for y in range(h):
        for x in range(w):
            rgb += hashlib.sha256(f"t:{x}:{y}".encode()).digest()[:3]
    payload = jpeg.encode_jpeg_from_rgb(bytes(rgb), w, h, quant=1)
    gw, gh, nc, out = jpeg.decode_jpeg(payload)
    assert (gw, gh, nc) == (w, h, 3)
    a = np.frombuffer(bytes(rgb), np.uint8).astype(int)
    b = np.frombuffer(out, np.uint8).astype(int)
    assert np.abs(a - b).max() <= 4


def test_encoder_is_deterministic():
    p1 = multimodal.encode_jpeg(8, 16, 11)
    p2 = multimodal.encode_jpeg(8, 16, 11)
    assert p1 == p2


def test_refuses_progressive_and_subsampled():
    sof2 = bytearray(b"\xff\xd8")
    body = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    sof2 += b"\xff\xc2" + struct.pack(">H", len(body) + 2) + body
    sof2 += b"\xff\xd9"
    with pytest.raises(NotImplementedError, match="baseline"):
        jpeg.decode_jpeg(bytes(sof2))

    sub = bytearray(b"\xff\xd8")
    body = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x22, 0])
    sub += b"\xff\xc0" + struct.pack(">H", len(body) + 2) + body
    sub += b"\xff\xd9"
    with pytest.raises(NotImplementedError, match="1x1 sampling"):
        jpeg.decode_jpeg(bytes(sub))


def test_media_row_jpeg_slot_and_header_decode():
    mtype, payload, w, h, nf, rate = multimodal.media_row(8)
    assert mtype == "jpeg" and payload[:2] == b"\xff\xd8"
    d = multimodal._decode_payload(payload)
    assert (d["width"], d["height"], d["n_frames"]) == (w, h, 1)
    assert d["n_bytes"] == w * h * 3
    # the pixel front door decodes it
    rgb = multimodal.rgb_pixels("jpeg", payload)
    assert len(rgb) == w * h * 3


def test_jpeg_rows_flow_through_resize_and_phash(spark):
    mtype, payload, w, h, _, _ = multimodal.media_row(8)
    media = spark.createDataFrame(
        [(8, mtype, payload, (w, h, 1, "t"))], multimodal.MEDIA_SCHEMA
    )
    resized = multimodal.resize_images(media, 20, 14).collect()[0]
    assert resized.media_type == "bmp"
    assert multimodal._decode_bmp_header(bytes(resized.payload))["width"] == 20
    hashed = multimodal.phash_images(media).collect()
    assert len(hashed) == 1 and hashed[0].media_id == 8
