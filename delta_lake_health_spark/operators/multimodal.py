"""Multimodal column plumbing (SURVEY §2.7).

Media lives in DataFrames as an opaque ``binary`` column plus a typed
metadata struct; decode / resize / frame-sample / featurize run as
``mapInPandas`` stages (Arrow-batched, one Python worker per partition —
the only sanctioned Python hot path in this engine).

Decode support, in order of attempt:

- **BMP (real image format)**: a hand-rolled 24/32-bit uncompressed BMP
  parser — header fields, bottom-up row order, and 4-byte row padding are
  decoded for real (``bmp_pixels`` returns the actual pixel bytes).
- **WAV (real audio format)**: a RIFF chunk walker (fmt /data chunks,
  word-aligned sizes, unknown chunks skipped) for PCM16 audio;
  ``wav_samples`` returns the actual sample values and
  ``audio_features`` computes real DSP statistics (RMS, peak,
  zero-crossing rate) from them.
- **Y4M (real video format)**: a YUV4MPEG2 parser (header parameters,
  per-frame FRAME markers, 4:2:0/4:2:2/4:4:4 plane sizes);
  ``y4m_frames`` yields the actual raw YUV frame bytes, which is what
  frame-sampling operates on.
- **JPEG (real image format)**: baseline-sequential JFIF encode AND
  decode from scratch (canonical Huffman, 8x8 DCT/IDCT, YCbCr —
  operators/jpeg.py; hand-derived-vector tests in tests/test_jpeg.py).
- **SIMG/SVID (synthetic)**: deterministic stand-in payloads (magic +
  header + bytes) for the remaining codec-bearing formats (MP4/MP3/...)
  whose codecs aren't re-implementable in scope.
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
        StructField("sample_rate", IntegerType()),  # 0 for non-audio
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


def encode_bmp_from_pixels(bgr: bytes, width: int, height: int) -> bytes:
    """24-bit BI_RGB BMP from raw top-down BGR pixel bytes — the
    re-encode half of a real decode→transform→encode stage (the inverse
    of ``bmp_pixels``)."""
    if len(bgr) != width * height * 3:
        raise ValueError(
            f"pixel buffer is {len(bgr)} bytes, want {width * height * 3}"
        )
    row_size = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_size - width * 3)
    rows = [
        bgr[y * width * 3 : (y + 1) * width * 3] + pad for y in range(height)
    ]
    data = b"".join(reversed(rows))  # BMP stores rows bottom-up
    pixel_bytes = row_size * height
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + pixel_bytes, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes,
        2835, 2835, 0, 0,
    )
    return header + info + data


def rgb_pixels(media_type: str, payload: bytes) -> bytes:
    """Top-down RGB bytes for any decodable still-image payload — one
    front door over the per-format decoders (BMP stores BGR; PNG/GIF
    decode to RGB natively; JPEG through the baseline-sequential
    Huffman+IDCT decoder in operators/jpeg.py)."""
    if media_type == "bmp":
        bgr = bmp_pixels(payload)
        return bytes(
            b
            for i in range(0, len(bgr), 3)
            for b in (bgr[i + 2], bgr[i + 1], bgr[i])
        )
    if media_type == "png":
        return png_pixels(payload)
    if media_type == "gif":
        return gif_pixels(payload)
    if media_type == "jpeg":
        from delta_lake_health_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)[3]
    raise NotImplementedError(f"no pixel decoder for {media_type!r}")


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


def encode_wav(
    media_id: int, n_samples: int, sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """A REAL RIFF/WAVE PCM16 file (fmt + data chunks) with deterministic
    sample values — an actual audio format any player opens, so the audio
    decode path runs on genuine bytes with no codec library. Samples are
    sha256-derived int16 little-endian words."""
    need = n_samples * channels * 2
    body = bytearray()
    i = 0
    while len(body) < need:
        body += hashlib.sha256(f"wav:{media_id}:{i}".encode()).digest()
        i += 1
    data = bytes(body[:need])
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _wav_chunks(payload: bytes) -> dict[bytes, tuple[int, int]]:
    """Walk the RIFF chunk list: {chunk_id: (offset, size)}. Chunk bodies
    are word-aligned (odd sizes padded), unknown chunks (LIST, fact, ...)
    are skipped — a real-world WAV reader, not a fixed-offset peek."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    chunks: dict[bytes, tuple[int, int]] = {}
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        chunks.setdefault(cid, (pos + 8, size))
        pos += 8 + size + (size & 1)
    return chunks


def _decode_wav_header(payload: bytes) -> dict:
    chunks = _wav_chunks(payload)
    if b"fmt " not in chunks or b"data" not in chunks:
        raise NotImplementedError("WAV payload missing fmt /data chunks")
    off, size = chunks[b"fmt "]
    audio_format, channels, rate, _byte_rate, block_align, bits = struct.unpack(
        "<HHIIHH", payload[off : off + 16]
    )
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM16 WAV decodes codec-free (format={audio_format}, "
            f"bits={bits})"
        )
    _doff, dsize = chunks[b"data"]
    n_samples = dsize // block_align
    return {"width": 0, "height": 0, "n_frames": n_samples,
            "n_bytes": dsize, "sample_rate": rate, "channels": channels}


def wav_samples(payload: bytes):
    """Decode a PCM16 WAV to a numpy int16 array of shape
    (n_samples, channels) — the real sample decode."""
    import numpy as np

    d = _decode_wav_header(payload)
    off, size = _wav_chunks(payload)[b"data"]
    arr = np.frombuffer(payload[off : off + size], dtype="<i2")
    return arr.reshape(-1, d["channels"])


def encode_wav_from_samples(samples, sample_rate: int) -> bytes:
    """PCM16 RIFF/WAVE from an int16 array of shape (n, channels) — the
    re-encode half of a real decode→transform→encode audio stage (the
    inverse of ``wav_samples``)."""
    import numpy as np

    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    channels = arr.shape[1]
    data = arr.tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def encode_y4m(media_id: int, width: int, height: int, n_frames: int) -> bytes:
    """A REAL YUV4MPEG2 stream (header parameters + FRAME markers + raw
    4:2:0 planar YUV) with deterministic plane bytes — an actual video
    format ffmpeg/mpv open, codec-free by design (that is the point of
    Y4M), so video decode and frame sampling run on genuine bytes."""
    if width % 2 or height % 2:
        raise ValueError("C420 requires even dimensions")
    frame_size = width * height * 3 // 2
    out = [f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420jpeg\n".encode()]
    for f in range(n_frames):
        out.append(b"FRAME\n")
        body = bytearray()
        i = 0
        while len(body) < frame_size:
            body += hashlib.sha256(
                f"y4m:{media_id}:{f}:{i}".encode()
            ).digest()
            i += 1
        out.append(bytes(body[:frame_size]))
    return b"".join(out)


_Y4M_FRAME_BYTES = {"420": 3, "422": 4, "444": 6}  # ×(w*h)/2


def _y4m_geometry(payload: bytes) -> tuple[int, int, int, int]:
    """Parse the YUV4MPEG2 header line → (width, height, frame_size,
    data_start)."""
    nl = payload.index(b"\n")
    tokens = payload[:nl].decode("ascii").split(" ")
    if tokens[0] != "YUV4MPEG2":
        raise NotImplementedError("not a YUV4MPEG2 payload")
    w = h = None
    chroma = "420"
    for t in tokens[1:]:
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("C"):
            chroma = t[1:4]
    if w is None or h is None or chroma not in _Y4M_FRAME_BYTES:
        raise NotImplementedError(f"unsupported Y4M geometry ({tokens})")
    return w, h, w * h * _Y4M_FRAME_BYTES[chroma] // 2, nl + 1


def y4m_frames(payload: bytes):
    """Yield (frame_idx, raw_yuv_bytes) by walking the FRAME markers —
    the real frame extraction a sampler needs."""
    w, h, frame_size, pos = _y4m_geometry(payload)
    idx = 0
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise NotImplementedError(f"bad FRAME marker at byte {pos}")
        pos = payload.index(b"\n", pos) + 1  # FRAME line may carry params
        yield idx, payload[pos : pos + frame_size]
        pos += frame_size
        idx += 1


def _decode_y4m_header(payload: bytes) -> dict:
    w, h, frame_size, _ = _y4m_geometry(payload)
    n_frames = sum(1 for _ in y4m_frames(payload))
    return {"width": w, "height": h, "n_frames": n_frames,
            "n_bytes": n_frames * frame_size}


# --- GIF: a real LZW-compressed format, decoded codec-free ----------------
# (GIF87a/89a per the CompuServe spec; LZW is pure algorithm, so unlike
# JPEG/PNG no codec library is needed — the whole decode is ~60 lines.)


def _gif_palette(media_id: int) -> bytes:
    """Deterministic 256-entry RGB global color table."""
    out = bytearray()
    i = 0
    while len(out) < 768:
        out += hashlib.sha256(f"gifpal:{media_id}:{i}".encode()).digest()
        i += 1
    return bytes(out[:768])


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: LSB-first variable-width codes, CLEAR/END codes,
    code width grows when the table fills (cap 12 bits), KwKwK case."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1

    def base_table():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = base_table()
    code_size = min_code_size + 1
    acc = nbits = 0
    out = bytearray()
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = base_table()
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return bytes(out)
            if code < len(table) and (code < clear or code > end):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]  # KwKwK
            else:
                raise NotImplementedError(f"corrupt LZW code {code}")
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = entry
    return bytes(out)


def _gif_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at pos; return (data, next)."""
    out = bytearray()
    while True:
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += payload[pos : pos + n]
        pos += n


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(media_id: int, width: int, height: int) -> bytes:
    """A REAL PNG (8-bit RGB, color type 2, no interlace) built from the
    standard library alone: IHDR + one zlib IDAT + IEND, CRCs included.
    Scanline filters CYCLE through all five spec types (None/Sub/Up/
    Average/Paeth, §9 of the PNG spec) so the decoder's unfilter path is
    exercised on every type, not just the trivial one. Pixels are the
    same deterministic sha256 pattern the BMP encoder uses."""
    import zlib

    raw_rows = []
    for y in range(height):
        row = bytearray()
        for x in range(width):
            row += hashlib.sha256(f"png:{media_id}:{x}:{y}".encode()).digest()[:3]
        raw_rows.append(bytes(row))
    stride = width * 3
    filtered = bytearray()
    prev = b"\x00" * stride
    for y, row in enumerate(raw_rows):
        ft = y % 5
        filtered.append(ft)
        for i in range(stride):
            left = row[i - 3] if i >= 3 else 0
            up = prev[i]
            ul = prev[i - 3] if i >= 3 else 0
            if ft == 0:
                f = row[i]
            elif ft == 1:
                f = row[i] - left
            elif ft == 2:
                f = row[i] - up
            elif ft == 3:
                f = row[i] - (left + up) // 2
            else:
                f = row[i] - _paeth(left, up, ul)
            filtered.append(f & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + _png_chunk(b"IEND", b"")
    )


def encode_jpeg(media_id: int, width: int, height: int) -> bytes:
    """A REAL baseline-sequential JFIF stream (4:4:4, flat quant step 1
    — near-lossless up to DCT float rounding; the roundtrip test bounds
    per-pixel error) from the from-scratch codec in operators/jpeg.py.
    Pixels are the same deterministic sha256 pattern the PNG/BMP
    encoders use."""
    from delta_lake_health_spark.operators.jpeg import encode_jpeg_from_rgb

    rgb = bytearray()
    for y in range(height):
        for x in range(width):
            rgb += hashlib.sha256(
                f"jpg:{media_id}:{x}:{y}".encode()
            ).digest()[:3]
    return encode_jpeg_from_rgb(bytes(rgb), width, height, quant=1)


def _png_chunks(payload: bytes):
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def _decode_png_header(payload: bytes) -> dict:
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    "only 8-bit truecolor non-interlaced PNG is supported "
                    f"(depth={depth} color={color} interlace={interlace})"
                )
            return {"width": w, "height": h, "n_frames": 1,
                    "n_bytes": w * h * 3}
    raise NotImplementedError("PNG payload without an IHDR chunk")


def png_pixels(payload: bytes) -> bytes:
    """Fully decode to RGB bytes: zlib-inflate the concatenated IDAT
    stream, then unfilter every scanline (all five PNG filter types)."""
    import zlib

    hdr = _decode_png_header(payload)
    w, h = hdr["width"], hdr["height"]
    idat = b"".join(d for t, d in _png_chunks(payload) if t == b"IDAT")
    raw = zlib.decompress(idat)
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise NotImplementedError(
            f"short PNG pixel stream: {len(raw)} of {h * (stride + 1)}"
        )
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _y in range(h):
        ft = raw[pos]
        if ft > 4:
            raise NotImplementedError(f"unknown PNG filter type {ft}")
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        for i in range(stride):
            left = line[i - 3] if i >= 3 else 0
            up = prev[i]
            ul = prev[i - 3] if i >= 3 else 0
            if ft == 1:
                line[i] = (line[i] + left) & 0xFF
            elif ft == 2:
                line[i] = (line[i] + up) & 0xFF
            elif ft == 3:
                line[i] = (line[i] + (left + up) // 2) & 0xFF
            elif ft == 4:
                line[i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        out += line
        prev = line
    return bytes(out)


def encode_gif(media_id: int, width: int, height: int) -> bytes:
    """A REAL single-frame GIF89a (global 256-color table, LZW image
    data in the fixed-9-bit form: CLEAR emitted before the table can
    force a width change — the classic 'uncompressed GIF' encoding every
    conformant decoder accepts)."""
    idx = bytearray()
    for p in range(width * height):
        idx.append(
            hashlib.sha256(f"gif:{media_id}:{p}".encode()).digest()[0]
        )
    clear, end = 256, 257
    codes: list[int] = []
    for i, px in enumerate(idx):
        if i % 128 == 0:
            codes.append(clear)
        codes.append(px)
    codes.append(end)
    acc = nbits = 0
    packed = bytearray()
    for c in codes:  # 9-bit LSB-first, width never grows (cleared early)
        acc |= c << nbits
        nbits += 9
        while nbits >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        packed.append(acc & 0xFF)
    blocks = bytearray()
    for off in range(0, len(packed), 255):
        chunk = packed[off : off + 255]
        blocks += bytes([len(chunk)]) + chunk
    return (
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + bytes([0xF7, 0, 0])  # GCT present, 256 entries
        + _gif_palette(media_id)
        + b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        + bytes([8])  # LZW min code size
        + bytes(blocks)
        + b"\x00\x3b"
    )


def _gif_walk(payload: bytes):
    """Yield (left, top, w, h, interlaced, palette, lzw_data) per frame."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("not a GIF payload")
    pos = 10
    packed = payload[pos]
    pos += 3
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            _, pos = _gif_subblocks(payload, pos)
            continue
        if block != 0x2C:
            raise NotImplementedError(f"unknown GIF block 0x{block:02x}")
        left, top, w, h = struct.unpack("<HHHH", payload[pos : pos + 8])
        ipacked = payload[pos + 8]
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = payload[pos : pos + 3 * n]
            pos += 3 * n
        mcs = payload[pos]
        pos += 1
        data, pos = _gif_subblocks(payload, pos)
        yield left, top, w, h, bool(ipacked & 0x40), pal, (mcs, data)


def _decode_gif_header(payload: bytes) -> dict:
    w, h = struct.unpack("<HH", payload[6:10])
    n_frames = sum(1 for _ in _gif_walk(payload))
    return {"width": w, "height": h, "n_frames": n_frames,
            "n_bytes": n_frames * w * h * 3}


def gif_pixels(payload: bytes) -> bytes:
    """Fully decode the FIRST frame to RGB bytes: LZW-decompress the
    index stream, then map through the active color table."""
    for left, top, w, h, interlaced, pal, (mcs, data) in _gif_walk(payload):
        if interlaced:
            raise NotImplementedError("interlaced GIF not supported")
        if pal is None:
            raise NotImplementedError("GIF frame without a color table")
        idx = _lzw_decode(data, mcs)
        if len(idx) < w * h:
            raise NotImplementedError(
                f"short LZW stream: {len(idx)} of {w * h} pixels"
            )
        out = bytearray()
        for p in idx[: w * h]:
            out += pal[3 * p : 3 * p + 3]
        return bytes(out)
    raise NotImplementedError("GIF has no image frame")


def _decode_payload(payload: bytes) -> dict:
    """Parse the payload header: real BMP/WAV/Y4M, synthetic SIMG/SVID,
    then a Pillow fallback for other real image formats. Non-audio
    formats report sample_rate 0."""
    if payload[:2] == b"BM":
        return {**_decode_bmp_header(payload), "sample_rate": 0}
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return {**_decode_gif_header(payload), "sample_rate": 0}
    if payload[:8] == _PNG_SIG:
        return {**_decode_png_header(payload), "sample_rate": 0}
    if payload[:2] == b"\xff\xd8":
        from delta_lake_health_spark.operators.jpeg import decode_jpeg_header

        return {**decode_jpeg_header(payload), "sample_rate": 0}
    if payload[:4] == b"RIFF":
        d = _decode_wav_header(payload)
        return {k: d[k] for k in
                ("width", "height", "n_frames", "n_bytes", "sample_rate")}
    if payload[:9] == b"YUV4MPEG2":
        return {**_decode_y4m_header(payload), "sample_rate": 0}
    if payload[:4] == MAGIC_IMG:
        w, h = struct.unpack("<II", payload[4:12])
        return {"width": w, "height": h, "n_frames": 1,
                "n_bytes": len(payload) - 12, "sample_rate": 0}
    if payload[:4] == MAGIC_VID:
        w, h, nf = struct.unpack("<III", payload[4:16])
        return {"width": w, "height": h, "n_frames": nf,
                "n_bytes": len(payload) - 16, "sample_rate": 0}
    try:  # pragma: no cover - codec not in this container
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload))
        return {"width": img.width, "height": img.height, "n_frames": 1,
                "n_bytes": len(payload), "sample_rate": 0}
    except ImportError:
        raise NotImplementedError(
            "this payload needs a codec (Pillow); only BMP/WAV/Y4M and "
            "the synthetic SIMG/SVID formats decode codec-free"
        )


def media_row(i: int) -> tuple[str, bytes, int, int, int, int]:
    """Deterministic media mix for row i → (type, payload, w, h,
    n_frames, sample_rate): synthetic SIMG images, real BMP images
    (both depths), real Y4M videos, synthetic SVID videos, real PCM16
    WAV audio. Shared by the in-memory table and the parquet fixture so
    the oracle and the Spark decode always agree."""
    if i % 8 == 3:  # real YUV4MPEG2 video (even dims for C420)
        w, h, nf = 32 + (i % 5) * 16, 24 + (i % 3) * 16, 4 + i % 5
        return "y4m", encode_y4m(i, w, h, nf), w, h, nf, 0
    if i % 8 == 7:  # synthetic video payload
        w, h, nf = 32 + (i % 5) * 16, 24 + (i % 3) * 16, 4 + i % 5
        return "video", encode_video(i, w, h, nf), w, h, nf, 0
    if i % 4 == 1:  # real BMP, alternating 24/32-bit depths
        w, h = 16 + (i % 3) * 4, 12 + (i % 2) * 4
        return "bmp", encode_bmp(i, w, h, bpp=32 if i % 8 == 5 else 24), w, h, 1, 0
    if i % 8 == 6:  # real PCM16 WAV audio (n_frames = samples)
        ns, rate = 800 + (i % 7) * 37, 8000 + (i % 3) * 4000
        return "wav", encode_wav(i, ns, rate), 0, 0, ns, rate
    if i % 8 == 2:  # real LZW-compressed GIF89a
        w, h = 10 + (i % 4) * 3, 8 + (i % 3) * 2
        return "gif", encode_gif(i, w, h), w, h, 1, 0
    if i % 8 == 4:  # real zlib-compressed PNG (all 5 filter types)
        w, h = 12 + (i % 5) * 4, 10 + (i % 3) * 5
        return "png", encode_png(i, w, h), w, h, 1, 0
    if i % 16 == 8:  # real baseline JFIF (Huffman + DCT, from scratch)
        w, h = 16 + (i % 3) * 5, 11 + (i % 4) * 4
        return "jpeg", encode_jpeg(i, w, h), w, h, 1, 0
    w, h = 64 + (i % 7) * 32, 48 + (i % 4) * 32
    return "image", encode_image(i, w, h), w, h, 1, 0


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """n deterministic media rows across all five payload formats."""
    rows = []
    for i in range(n):
        mtype, payload, w, h, nf, _rate = media_row(i)
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
                        **{
                            k: d[k]
                            for k in (
                                "width", "height", "n_frames", "sample_rate"
                            )
                        },
                        "n_bytes": d["n_bytes"],
                        "checksum": hashlib.md5(bytes(payload)).hexdigest(),
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(fn, DECODED_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Still images → REAL nearest-neighbor resample: BMP/PNG/GIF
    payloads decode to pixels, resample via numpy index maps (the
    standard NN kernel: source row/col = floor(dst * src / dst_size)),
    and re-encode as 24-bit BMP — the decoded-normalized re-encode a
    real ingest pipeline performs when standardizing formats. Synthetic
    SIMG payloads re-encode synthetically (no pixel semantics to
    preserve); videos/audio pass through. Arrow-batched mapInPandas —
    per-task memory is one batch of images, independent of table size."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, mtype, payload, meta in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"], pdf["meta"]
            ):
                if mtype in ("bmp", "png", "gif", "jpeg"):
                    sw, sh = int(meta["width"]), int(meta["height"])
                    rgb = np.frombuffer(
                        rgb_pixels(mtype, bytes(payload)), dtype=np.uint8
                    ).reshape(sh, sw, 3)
                    yi = (np.arange(height) * sh) // height
                    xi = (np.arange(width) * sw) // width
                    out = rgb[yi][:, xi]          # H x W x 3, RGB
                    bgr = out[:, :, ::-1].tobytes()
                    payload = encode_bmp_from_pixels(bgr, width, height)
                    mtype = "bmp"
                    meta = {**meta, "width": width, "height": height}
                elif mtype == "image":
                    payload = encode_image(int(mid), width, height)
                    meta = {**meta, "width": width, "height": height}
                rows.append(
                    {"media_id": int(mid), "media_type": mtype,
                     "payload": payload, "meta": meta}
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(fn, MEDIA_SCHEMA)


def decimate_audio(media: DataFrame, factor: int) -> DataFrame:
    """WAV rows → REAL sample-rate decimation: keep every ``factor``-th
    PCM16 sample and re-encode at ``rate // factor`` (naive decimation —
    no anti-alias filter, documented; the deterministic fixture has no
    spectral content to alias). Non-audio rows pass through. The same
    Arrow-batched mapInPandas shape as resize — per-task memory is one
    batch, independent of table size."""
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, payload, meta in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"], pdf["meta"]
            ):
                if mtype == "wav":
                    payload = bytes(payload)
                    d = _decode_wav_header(payload)
                    kept = wav_samples(payload)[::factor]
                    payload = encode_wav_from_samples(
                        kept, max(1, d["sample_rate"] // factor)
                    )
                    meta = {**meta, "n_frames": len(kept)}
                rows.append(
                    {"media_id": int(mid), "media_type": mtype,
                     "payload": payload, "meta": meta}
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(fn, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """video payloads → one row per sampled frame (frame_idx, frame hash).
    Y4M payloads go through the real YUV4MPEG2 frame walk; synthetic SVID
    payloads through the stand-in layout. Output is exploded, so
    downstream per-frame featurization stays embarrassingly parallel."""
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
                payload = bytes(payload)
                if mtype == "y4m":
                    frames_iter = (
                        (idx, fr)
                        for idx, fr in y4m_frames(payload)
                        if idx % every_k == 0
                    )
                elif mtype == "video":
                    _w, _h, nf = struct.unpack("<III", payload[4:16])
                    frames = payload[16:]
                    fsize = len(frames) // nf if nf else 0
                    frames_iter = (
                        (idx, frames[idx * fsize : (idx + 1) * fsize])
                        for idx in range(0, nf, every_k)
                    )
                else:
                    continue
                for idx, fr in frames_iter:
                    rows.append(
                        {"media_id": int(mid), "frame_idx": idx,
                         "frame_checksum": hashlib.md5(fr).hexdigest()}
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(fn, schema)


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", FloatType()),
        StructField("rms", FloatType()),
        StructField("peak", IntegerType()),
        StructField("zero_crossings", LongType()),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """WAV payloads → real DSP features over the decoded PCM16 samples
    (numpy-vectorized per payload inside the Arrow batch): RMS amplitude,
    peak magnitude, zero-crossing count, duration. Non-audio rows are
    dropped."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                if payload[:4] != b"RIFF":
                    continue
                d = _decode_wav_header(payload)
                mono = wav_samples(payload).astype(np.float64).mean(axis=1)
                rows.append(
                    {
                        "media_id": int(mid),
                        "sample_rate": d["sample_rate"],
                        "n_samples": len(mono),
                        "duration_ms": 1000.0 * len(mono) / d["sample_rate"],
                        "rms": float(np.sqrt(np.mean(mono**2))),
                        "peak": int(np.abs(mono).max()) if len(mono) else 0,
                        "zero_crossings": int(
                            np.count_nonzero(np.diff(np.signbit(mono)))
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(fn, AUDIO_FEATURE_SCHEMA)


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


# --- perceptual hashing (image near-duplicate detection) --------------------

PHASH_SIZE = 8          # 8x8 low-frequency block -> 64-bit hash
PHASH_INPUT = 32        # images are normalized to 32x32 before the DCT
PHASH_BANDS = 4         # 4 x 16-bit bands for hamming-LSH bucketing

PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("phash", LongType()),
        StructField("bands", ArrayType(LongType())),
    ]
)


def _dct_matrix(n: int):
    """Orthonormal DCT-II basis matrix (the classical pHash transform).
    Built from closed-form cosines — deterministic across platforms at
    double precision."""
    import numpy as np

    k = np.arange(n).reshape(-1, 1).astype(np.float64)
    i = np.arange(n).reshape(1, -1).astype(np.float64)
    m = np.cos(np.pi * k * (2 * i + 1) / (2 * n))
    m[0, :] *= np.sqrt(1.0 / n)
    m[1:, :] *= np.sqrt(2.0 / n)
    return m


def phash64(rgb: bytes, width: int, height: int) -> int:
    """64-bit perceptual hash of an RGB888 buffer: grayscale ->
    nearest-neighbor 32x32 -> 2D DCT-II -> top-left 8x8 low-frequency
    block -> bit i = coefficient > median (DC term excluded from the
    median, pHash convention). Signed int64 (two's complement) so it
    stores in a Spark LongType column."""
    import numpy as np

    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    gray = (
        0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    ).astype(np.float64)
    yi = (np.arange(PHASH_INPUT) * height) // PHASH_INPUT
    xi = (np.arange(PHASH_INPUT) * width) // PHASH_INPUT
    small = gray[yi][:, xi]
    d = _dct_matrix(PHASH_INPUT)
    coef = d @ small @ d.T
    low = coef[:PHASH_SIZE, :PHASH_SIZE].flatten()
    med = float(np.median(low[1:]))  # skip the DC coefficient
    bits = 0
    for j, v in enumerate(low):
        if v > med:
            bits |= 1 << j
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def phash_bands(h: int) -> list[int]:
    """Split a 64-bit hash into PHASH_BANDS 16-bit band keys (banding
    LSH over hamming space: any pair within hamming distance
    PHASH_BANDS - 1 shares at least one exact band by pigeonhole)."""
    u = h + (1 << 64) if h < 0 else h
    return [(u >> (16 * b)) & 0xFFFF for b in range(PHASH_BANDS)]


def phash_images(media: DataFrame) -> DataFrame:
    """Still-image rows (bmp/png/gif) → (media_id, phash, bands).
    Arrow-batched mapInPandas; non-still rows are dropped. The DCT and
    resize are tiny fixed-size numpy ops per image — per-task memory is
    one batch, independent of table size."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                if mtype not in ("bmp", "png", "gif", "jpeg"):
                    continue
                payload = bytes(payload)
                d = _decode_payload(payload)
                h = phash64(
                    rgb_pixels(mtype, payload), d["width"], d["height"]
                )
                rows.append(
                    {
                        "media_id": int(mid),
                        "media_type": mtype,
                        "phash": h,
                        "bands": phash_bands(h),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "media_type", "phash", "bands"],
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        fn, PHASH_SCHEMA
    )


def phash_neardup_pairs(
    hashed: DataFrame, max_distance: int = 10
) -> DataFrame:
    """Near-duplicate image pairs from a (media_id, phash, bands) frame:
    explode the band keys, self-join on (band_idx, band_key) — the
    banding bound means every pair within hamming distance
    PHASH_BANDS - 1 is guaranteed a candidate, and closer pairs almost
    always collide on some band — then filter candidates by exact
    hamming distance over the XOR popcount. Scale shape: the shuffle is
    on band buckets (like MinHash-LSH), NEVER all-pairs; the exact
    distance touches only candidates."""
    b = hashed.select(
        "media_id", "phash", F.posexplode("bands").alias("bidx", "bkey")
    )
    left = b.select(
        F.col("media_id").alias("id_a"),
        F.col("phash").alias("h_a"),
        "bidx",
        "bkey",
    )
    right = b.select(
        F.col("media_id").alias("id_b"),
        F.col("phash").alias("h_b"),
        "bidx",
        "bkey",
    )
    cand = (
        left.join(right, ["bidx", "bkey"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    dist = F.bit_count(
        F.col("h_a").bitwiseXOR(F.col("h_b"))
    ).cast("int")
    return (
        cand.select("id_a", "id_b", dist.alias("hamming"))
        .where(F.col("hamming") <= max_distance)
    )


# --- video scene-change detection -------------------------------------------

def encode_y4m_from_lumas(
    lumas: list[int], width: int = 16, height: int = 16
) -> bytes:
    """YUV4MPEG2 stream with one constant-luma 4:2:0 frame per entry —
    the content-controlled encoder twin of ``encode_y4m`` (what tests
    and closed-form oracles need: known per-frame luma means)."""
    if width % 2 or height % 2:
        raise ValueError("C420 requires even dimensions")
    out = [f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420jpeg\n".encode()]
    for y in lumas:
        out.append(b"FRAME\n")
        out.append(bytes([y & 0xFF]) * (width * height))
        out.append(bytes([128]) * (width * height // 2))  # U+V planes
    return b"".join(out)


SCENE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("n_scenes", IntegerType()),
        StructField("boundaries", ArrayType(IntegerType())),
    ]
)


def detect_scene_changes(media: DataFrame, threshold: float = 16.0) -> DataFrame:
    """Video rows (y4m) → shot/scene boundaries: a frame starts a new
    scene when its mean absolute LUMA difference to the previous frame
    exceeds ``threshold`` (the classical pixel-difference shot detector;
    PySceneDetect's content-detector baseline restricted to luma).
    Arrow-batched mapInPandas over the real FRAME walk — per-task memory
    is two luma planes, independent of video length or table size.
    Non-video rows are dropped; n_scenes = len(boundaries) + 1."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                if mtype != "y4m":
                    continue
                payload = bytes(payload)
                w, h, _fs, _ = _y4m_geometry(payload)
                prev = None
                bounds: list[int] = []
                n = 0
                for idx, frame in y4m_frames(payload):
                    luma = np.frombuffer(
                        frame[: w * h], dtype=np.uint8
                    ).astype(np.int16)
                    if prev is not None:
                        if float(np.abs(luma - prev).mean()) > threshold:
                            bounds.append(idx)
                    prev = luma
                    n = idx + 1
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_frames": n,
                        "n_scenes": len(bounds) + 1,
                        "boundaries": bounds,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_frames", "n_scenes", "boundaries"],
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        fn, SCENE_SCHEMA
    )
