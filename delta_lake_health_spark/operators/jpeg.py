"""Baseline-sequential JFIF (JPEG) codec from scratch (SURVEY §2.7 M2 —
closes the largest declared codec stub; VERDICT r8 task #8).

Pure algorithm, no codec library: the encoder emits a spec-conformant
baseline JPEG (SOI/APP0/DQT/SOF0/DHT/SOS/EOI; 4:4:4 sampling, canonical
Huffman tables declared in the stream) and the decoder reads any
baseline-sequential stream with 8-bit quant tables and 1x1 sampling
(grayscale or 3-component), which covers the encoder's output and the
common "no chroma subsampling" interchange case. Out-of-scope variants
fail loudly (progressive SOF2, subsampled SOF0, arithmetic coding, DRI
restart intervals) — a stub that guessed would corrupt the pHash /
resize operators downstream.

The DCT pair is the exact orthonormal 8x8 transform (numpy matrix
product — the same float math both directions), quantization is
per-table integer rounding, entropy coding is canonical Huffman built
per Annex C (BITS/HUFFVAL -> codes) with 0xFF byte stuffing. The
encoder's tables are deliberately simple-but-valid: every DC category
at 4 bits, every AC (run,size) symbol at 9 bits — legal DHT payloads
(Kraft-satisfying, no all-ones codeword), chosen so correctness never
depends on remembering the spec's Annex K example tables.

Decode correctness is pinned by HAND-DERIVED vectors independent of
the encoder (tests/test_jpeg.py): a single-DC-coefficient block must
decode to the flat value DC*q/8 + 128, and a single-AC-coefficient
block to the corresponding cosine basis image — both computable by
hand from the DCT definition.
"""

from __future__ import annotations

import struct

import numpy as np

# --- 8x8 orthonormal DCT ----------------------------------------------------

_DCT = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _DCT[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _fdct(block: np.ndarray) -> np.ndarray:
    return _DCT @ block @ _DCT.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _DCT.T @ coef @ _DCT


# --- canonical Huffman (Annex C) ---------------------------------------------

def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical generation: codes of
    each length are consecutive, doubling on length increase."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-at-a-time decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _build_codes(bits, values).items()
    }


# encoder-side tables: every DC category at 4 bits (12 codes, Kraft
# 12/16), every AC (run,size) + EOB + ZRL at 9 bits (162 codes, Kraft
# 162/512) — valid, canonical, and trivially rederivable
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALUES = list(range(12))
_AC_VALUES = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_BITS = [0] * 16
_AC_BITS[8] = len(_AC_VALUES)  # all 9-bit


def _category(v: int) -> int:
    """JPEG magnitude category: smallest s with |v| < 2^s."""
    return 0 if v == 0 else int(v).bit_length() if v > 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self._acc = (self._acc << 1) | ((code >> i) & 1)
            self._n += 1
            if self._n == 8:
                b = self._acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self._acc = 0
                self._n = 0

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # 1-fill, per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise NotImplementedError("JPEG entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise NotImplementedError(
                        "unexpected marker inside entropy data (DRI restart "
                        "intervals are not supported)"
                    )
                self.pos += 1  # skip the stuffed 0x00
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise NotImplementedError("invalid Huffman code in entropy stream")


def _receive_extend(reader: _BitReader, size: int) -> int:
    if size == 0:
        return 0
    v = reader.bits(size)
    if v < (1 << (size - 1)):  # negative branch
        v -= (1 << size) - 1
    return v


# --- encoder ------------------------------------------------------------------

def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ],
        axis=-1,
    )


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    return np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )


def _encode_block(
    writer: _BitWriter,
    coef: np.ndarray,
    qtab: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    q = np.round(coef / qtab).astype(int)
    zz = [int(q.flat[ZIGZAG[i]]) for i in range(64)]
    diff = zz[0] - pred
    size = _category(diff)
    code, length = dc_codes[size]
    writer.put(code, length)
    if size:
        writer.put(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    for v in zz[1:]:
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.put(code, length)
            run -= 16
        size = _category(v)
        code, length = ac_codes[(run << 4) | size]
        writer.put(code, length)
        writer.put(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        code, length = ac_codes[0x00]  # EOB
        writer.put(code, length)
    return zz[0]


def _dht_segment(tclass: int, tid: int, bits: list[int], values: list[int]) -> bytes:
    body = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg_from_rgb(
    rgb: bytes, width: int, height: int, quant: int = 1
) -> bytes:
    """Encode top-down RGB bytes as a baseline 4:4:4 JFIF stream.
    ``quant`` is the flat quantization step for every coefficient of
    every component (1 = near-lossless up to DCT float rounding)."""
    px = (
        np.frombuffer(rgb, dtype=np.uint8)
        .reshape(height, width, 3)
        .astype(np.float64)
    )
    ycc = _rgb_to_ycbcr(px)
    # pad to multiples of 8 by edge replication
    ph = (height + 7) & ~7
    pw = (width + 7) & ~7
    padded = np.pad(
        ycc, ((0, ph - height), (0, pw - width), (0, 0)), mode="edge"
    )
    qtab = np.full((8, 8), quant, dtype=np.float64)
    dc_codes = _build_codes(_DC_BITS, _DC_VALUES)
    ac_codes = _build_codes(_AC_BITS, _AC_VALUES)
    writer = _BitWriter()
    preds = [0, 0, 0]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for comp in range(3):  # MCU = one block per component (1x1)
                block = padded[by : by + 8, bx : bx + 8, comp] - 128.0
                preds[comp] = _encode_block(
                    writer, _fdct(block), qtab, preds[comp],
                    dc_codes, ac_codes,
                )
    data = writer.flush()

    zz_q = bytes(int(qtab.flat[ZIGZAG[i]]) for i in range(64))
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    app0 = b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q  # DQT 0
    sof = struct.pack(">BHHB", 8, height, width, 3)
    for cid in (1, 2, 3):
        sof += bytes([cid, 0x11, 0])  # 1x1 sampling, qtable 0
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_BITS, _DC_VALUES)
    out += _dht_segment(1, 0, _AC_BITS, _AC_VALUES)
    sos = b"\x03" + b"".join(bytes([cid, 0x00]) for cid in (1, 2, 3))
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += data
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ------------------------------------------------------------------

def _segments(payload: bytes):
    """Yield (marker, body) for every segment between SOI and SOS; the
    entropy-coded data after SOS is returned via the 'scan' sentinel."""
    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG (missing SOI)")
    pos = 2
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise NotImplementedError(f"bad marker alignment at byte {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            return
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDA:  # SOS: rest (minus EOI) is entropy data
            yield marker, body
            yield 0x100, payload[pos : len(payload) - 2]
            return
        yield marker, body


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline-sequential 1x1-sampled JPEG.
    Returns (width, height, n_components, top-down RGB bytes) — a
    grayscale stream is expanded to RGB. Progressive (SOF2), subsampled,
    arithmetic-coded, and restart-interval streams raise."""
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    width = height = 0
    scan_order: list[dict] = []
    data = b""
    for marker, body in _segments(payload):
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            pos = 0
            while pos < len(body):
                pq, tq = body[pos] >> 4, body[pos] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tab = np.zeros(64)
                for i in range(64):
                    tab[ZIGZAG[i]] = body[pos + 1 + i]
                qtabs[tq] = tab.reshape(8, 8)
                pos += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            pos = 0
            while pos < len(body):
                tc, th = body[pos] >> 4, body[pos] & 0xF
                bits = list(body[pos + 1 : pos + 17])
                nvals = sum(bits)
                values = list(body[pos + 17 : pos + 17 + nvals])
                huff[(tc, th)] = _decode_table(bits, values)
                pos += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            precision, height, width, ncomp = struct.unpack(
                ">BHHB", body[:6]
            )
            if precision != 8:
                raise NotImplementedError("only 8-bit precision")
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                if hv != 0x11:
                    raise NotImplementedError(
                        "subsampled JPEG (only 1x1 sampling decodes here)"
                    )
                comps.append({"id": cid, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline-sequential (SOF0) JPEG decodes here"
            )
        elif marker == 0xDD:
            raise NotImplementedError("DRI restart intervals")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for s in range(ns):
                cid, tables = body[1 + 2 * s], body[2 + 2 * s]
                comp = next(c for c in comps if c["id"] == cid)
                scan_order.append(
                    {**comp, "dc": tables >> 4, "ac": tables & 0xF}
                )
        elif marker == 0x100:
            data = body
    if not scan_order or width == 0:
        raise NotImplementedError("JPEG without SOF0/SOS")

    reader = _BitReader(data)
    ph, pw = (height + 7) & ~7, (width + 7) & ~7
    planes = [
        np.zeros((ph, pw), dtype=np.float64) for _ in scan_order
    ]
    preds = [0] * len(scan_order)
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci, comp in enumerate(scan_order):
                zz = np.zeros(64)
                size = reader.huff(huff[(0, comp["dc"])])
                preds[ci] += _receive_extend(reader, size)
                zz[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = reader.huff(huff[(1, comp["ac"])])
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += rs >> 4
                    if k > 63:
                        raise NotImplementedError("AC run past block end")
                    zz[k] = _receive_extend(reader, rs & 0xF)
                    k += 1
                coef = np.zeros(64)
                coef[ZIGZAG] = zz
                block = _idct(
                    coef.reshape(8, 8) * qtabs[comp["tq"]]
                ) + 128.0
                planes[ci][by : by + 8, bx : bx + 8] = block
    planes = [p[:height, :width] for p in planes]
    if len(planes) == 1:
        rgb = np.repeat(planes[0][..., None], 3, axis=-1)
    else:
        rgb = _ycbcr_to_rgb(np.stack(planes, axis=-1))
    return (
        width,
        height,
        len(scan_order),
        np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes(),
    )


def decode_jpeg_header(payload: bytes) -> dict:
    """Dimensions from SOF0 alone (no entropy decode)."""
    for marker, body in _segments(payload):
        if marker == 0xC0:
            _, height, width, _ = struct.unpack(">BHHB", body[:6])
            return {"width": width, "height": height, "n_frames": 1,
                    "n_bytes": width * height * 3}
        if marker == 0x100:
            break
    raise NotImplementedError("JPEG without a SOF0 header")
