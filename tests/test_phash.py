"""Perceptual hash (pHash) — operators/multimodal.py.

Verifies the DCT hash against a pure-Python double-loop reference,
its mathematical invariances (exact-ratio NN resample, brightness
shift), discrimination between distinct patterns, the banding bound,
and the distributed pipeline (phash_images + phash_neardup_pairs).
"""

from __future__ import annotations

import itertools
import math

import numpy as np
import pytest

from delta_lake_health_spark.operators import multimodal as mm
from delta_lake_health_spark.plans.media import _phash_gradient_bmp


def _gradient(seed: int, w: int = 64, h: int = 64) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    a, b, c = 1 + (seed % 3), 1 + (seed // 3) % 3, seed % 7
    g = (
        127.5
        + 40 * np.sin(2 * np.pi * (a * x / w + c / 7))
        + 40 * np.cos(2 * np.pi * (b * y / h + c / 11))
    )
    return np.stack([np.clip(g, 0, 255).astype(np.uint8)] * 3, axis=-1)


def _nn(px: np.ndarray, nw: int, nh: int) -> np.ndarray:
    h, w = px.shape[:2]
    yi = (np.arange(nh) * h) // nh
    xi = (np.arange(nw) * w) // nw
    return px[yi][:, xi]


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _phash_reference(rgb: bytes, width: int, height: int) -> int:
    """Independent pure-Python (no numpy linalg) pHash: same pipeline,
    explicit O(n^4) DCT double loop."""
    n = mm.PHASH_INPUT
    px = list(rgb)
    gray = [
        [
            0.299 * px[3 * (r * width + c)]
            + 0.587 * px[3 * (r * width + c) + 1]
            + 0.114 * px[3 * (r * width + c) + 2]
            for c in range(width)
        ]
        for r in range(height)
    ]
    small = [
        [gray[(r * height) // n][(c * width) // n] for c in range(n)]
        for r in range(n)
    ]
    coef = []
    for k in range(mm.PHASH_SIZE):
        row = []
        for m in range(mm.PHASH_SIZE):
            s = 0.0
            for i in range(n):
                for j in range(n):
                    s += (
                        small[i][j]
                        * math.cos(math.pi * k * (2 * i + 1) / (2 * n))
                        * math.cos(math.pi * m * (2 * j + 1) / (2 * n))
                    )
            sk = math.sqrt(1.0 / n) if k == 0 else math.sqrt(2.0 / n)
            sm = math.sqrt(1.0 / n) if m == 0 else math.sqrt(2.0 / n)
            row.append(s * sk * sm)
        coef.append(row)
    low = [coef[r][c] for r in range(mm.PHASH_SIZE) for c in range(mm.PHASH_SIZE)]
    tail = sorted(low[1:])
    med = (
        (tail[len(tail) // 2 - 1] + tail[len(tail) // 2]) / 2
        if len(tail) % 2 == 0
        else tail[len(tail) // 2]
    )
    bits = 0
    for j, v in enumerate(low):
        if v > med:
            bits |= 1 << j
    return bits - (1 << 64) if bits >= 1 << 63 else bits


def _texture(seed: int, w: int = 64, h: int = 64) -> np.ndarray:
    """Dense-spectrum deterministic texture (md5 bytes): every DCT
    coefficient is well away from the median, so the reference-parity
    check is evaluation-order-robust (the sinusoid gradients put many
    coefficients EXACTLY at a zero median, where ulp noise between
    matmul and double-loop evaluation flips boundary bits)."""
    import hashlib

    buf = b"".join(
        hashlib.md5(f"tex:{seed}:{i}".encode()).digest()
        for i in range(w * h * 3 // 16 + 1)
    )
    return np.frombuffer(buf[: w * h * 3], dtype=np.uint8).reshape(h, w, 3)


def test_phash_matches_pure_python_reference():
    for seed in (0, 3, 7):
        px = _texture(seed)
        got = mm.phash64(px.tobytes(), 64, 64)
        want = _phash_reference(px.tobytes(), 64, 64)
        assert got == want, (seed, got, want)


def test_exact_ratio_resample_is_hash_identical():
    """NN resample at an exact integer ratio commutes with the 32x32
    normalization — the closed form the driver oracle relies on."""
    for seed in range(6):
        px = _gradient(seed)
        h0 = mm.phash64(px.tobytes(), 64, 64)
        h_up = mm.phash64(_nn(px, 128, 128).tobytes(), 128, 128)
        h_dn = mm.phash64(_nn(px, 32, 32).tobytes(), 32, 32)
        assert h0 == h_up
        assert h0 == h_dn


def test_brightness_shift_moves_dc_only():
    """A uniform in-range brightness shift changes only the DC
    coefficient (row 0 of the DCT basis is the constant vector), so the
    hash moves by at most the DC bit plus median-boundary flips."""
    px = _gradient(2).astype(np.int16)
    assert px.max() + 10 <= 255
    h0 = mm.phash64(px.astype(np.uint8).tobytes(), 64, 64)
    h1 = mm.phash64((px + 10).astype(np.uint8).tobytes(), 64, 64)
    assert _ham(h0, h1) <= 2


def test_distinct_patterns_are_far():
    hashes = [
        mm.phash64(_gradient(s).tobytes(), 64, 64) for s in range(12)
    ]
    for a, b in itertools.combinations(range(12), 2):
        assert _ham(hashes[a], hashes[b]) >= 10, (a, b)


def test_banding_bound():
    """Any two hashes within hamming distance PHASH_BANDS - 1 share at
    least one exact 16-bit band (pigeonhole)."""
    h = mm.phash64(_gradient(1).tobytes(), 64, 64)
    u = h + (1 << 64) if h < 0 else h
    for flips in ([3], [0, 17], [5, 21, 40]):
        v = u
        for bit in flips:
            v ^= 1 << bit
        tw = v - (1 << 64) if v >= 1 << 63 else v
        shared = set(
            i
            for i, (a, b) in enumerate(
                zip(mm.phash_bands(h), mm.phash_bands(tw))
            )
            if a == b
        )
        assert shared, flips


def test_phash_images_distributed(spark):
    media = mm.synthetic_media(spark, 24)
    out = mm.phash_images(media).collect()
    stills = [r for r in out]
    assert stills, "fixture must contain still images"
    for r in stills:
        assert r.media_type in ("bmp", "png", "gif", "jpeg")
        assert r.bands == mm.phash_bands(r.phash)
    # parity with the local path
    local = {}
    for i in range(24):
        mtype, payload, w, h, _nf, _rate = mm.media_row(i)
        if mtype in ("bmp", "png", "gif", "jpeg"):
            local[i] = mm.phash64(mm.rgb_pixels(mtype, payload), w, h)
    assert {r.media_id: r.phash for r in stills} == local


def test_neardup_pairs_find_twins_only(spark):
    rows = []
    for s in range(8):
        rows.append((s, "bmp", _phash_gradient_bmp(s)))
        rows.append((s + 1000, "bmp", _phash_gradient_bmp(s, up=2)))
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    )
    pairs = mm.phash_neardup_pairs(mm.phash_images(media), max_distance=4)
    got = {(r.id_a, r.id_b, r.hamming) for r in pairs.collect()}
    assert got == {(s, s + 1000, 0) for s in range(8)}
