"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star extension (SURVEY.md §7.4). Images/audio/video ride through
the engine as ``binary`` columns with a struct of metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over ``mapInPandas`` so the heavy per-item work happens
executor-side in columnar batches, never row-at-a-time.

Codecs available in this container (no PIL/ffmpeg):

- ``codec="headers"`` — REAL container-format parsing in pure Python:
  PNG (signature + IHDR), JPEG (marker walk to SOF0/1/2), GIF
  (logical-screen descriptor). Extracts format + dimensions from the
  actual bytes; handles any real file of these formats.
- ``codec="stub"`` — deterministic fake decode (dims derived from
  payload length) for plumbing tests where payloads aren't images.
- ``codec="raster"`` — TRUE pixel decode, no image library: grayscale
  PNG (zlib inflate + all five filter types) and baseline-DCT
  grayscale JPEG (canonical Huffman + dequantize + float IDCT).

``encode_png``/``encode_gif`` generate real payloads (valid PNG incl.
CRCs and zlib IDAT; GIF structurally valid); ``encode_jpeg_gray`` is
a REAL baseline JPEG encoder (DCT + Annex K Huffman) whose output any
compliant decoder reads, while ``encode_jpeg`` keeps the header-only
stub-scan form for header-parse corpora.
"""

from __future__ import annotations

import math
import struct
import zlib
from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.StringType(), True),
    ]
)


def attach_payload(
    df: DataFrame, text_col: str, id_col: str, *, mime: str = "application/octet-stream"
) -> DataFrame:
    """Build a MEDIA_SCHEMA frame from any source column (here: utf-8
    bytes of a text column — the testdata has no real media; in
    production the payload arrives from object storage or parquet
    binary columns directly)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit(mime).alias("mime"),
        F.create_map(
            F.lit("source"), F.lit("text"), F.lit("codec"), F.lit("stub")
        ).alias("meta"),
    )


HEADER_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


# --------------------------------------------------------------------------
# pure-python encoders (planted test media with known dimensions)
# --------------------------------------------------------------------------


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png_gray(
    width: int, height: int, pixels: bytes, *, filter_cycle: bool = False
) -> bytes:
    """A fully valid 8-bit grayscale PNG (correct CRCs, zlib IDAT) from
    a row-major raster. ``filter_cycle=True`` encodes row y with filter
    type y % 5 (None/Sub/Up/Average/Paeth) so every decoder filter path
    can be exercised; default uses filter 0 for all rows."""
    if len(pixels) != width * height:
        raise ValueError(f"raster size {len(pixels)} != {width}x{height}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    rows = []
    prev = bytes(width)
    for y in range(height):
        row = pixels[y * width : (y + 1) * width]
        ft = (y % 5) if filter_cycle else 0
        if ft == 0:
            enc = row
        elif ft == 1:  # Sub
            enc = bytes((row[x] - (row[x - 1] if x else 0)) % 256 for x in range(width))
        elif ft == 2:  # Up
            enc = bytes((row[x] - prev[x]) % 256 for x in range(width))
        elif ft == 3:  # Average
            enc = bytes(
                (row[x] - ((row[x - 1] if x else 0) + prev[x]) // 2) % 256
                for x in range(width)
            )
        else:  # Paeth
            enc = bytes(
                (row[x] - _paeth((row[x - 1] if x else 0), prev[x],
                                 (prev[x - 1] if x else 0))) % 256
                for x in range(width)
            )
        rows.append(bytes([ft]) + enc)
        prev = row
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(rows), 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png(width: int, height: int) -> bytes:
    """A fully valid 8-bit grayscale PNG with the deterministic gradient
    raster ``(x*31 + y*17) % 256`` — decodable by any PNG library."""
    raster = bytes(
        (x * 31 + y * 17) % 256 for y in range(height) for x in range(width)
    )
    return encode_png_gray(width, height, raster)


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (left, up, up-left)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png_gray(payload: bytes | None) -> tuple[int, int, bytes] | None:
    """REAL raster decode of an 8-bit grayscale PNG: chunk walk, IDAT
    concatenation, zlib inflate, and per-row unfiltering (all five PNG
    filter types). Returns (width, height, row-major pixels); None for
    null payloads; raises on non-PNG or unsupported color/depth (full
    color/interlace support would need an image library — grayscale-8
    is the corpus this engine plants and the one true-pixel path)."""
    if payload is None:
        return None
    b = bytes(payload)
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    i, w, h, idat = 8, None, None, []
    while i + 8 <= len(b):
        (length,) = struct.unpack(">I", b[i : i + 4])
        tag = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8 or ctype != 0 or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={ctype}, "
                    f"interlace={interlace}): only non-interlaced grayscale-8"
                )
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        i += 12 + length  # len + tag + data + crc
    if w is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (w + 1) * h:
        raise ValueError(f"IDAT inflates to {len(raw)}, want {(w + 1) * h}")
    out = bytearray(w * h)
    prev = bytes(w)
    for y in range(h):
        ft = raw[y * (w + 1)]
        row = bytearray(raw[y * (w + 1) + 1 : (y + 1) * (w + 1)])
        if ft == 1:  # Sub
            for x in range(1, w):
                row[x] = (row[x] + row[x - 1]) % 256
        elif ft == 2:  # Up
            for x in range(w):
                row[x] = (row[x] + prev[x]) % 256
        elif ft == 3:  # Average
            for x in range(w):
                left = row[x - 1] if x else 0
                row[x] = (row[x] + (left + prev[x]) // 2) % 256
        elif ft == 4:  # Paeth
            for x in range(w):
                left = row[x - 1] if x else 0
                ul = prev[x - 1] if x else 0
                row[x] = (row[x] + _paeth(left, prev[x], ul)) % 256
        elif ft != 0:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y * w : (y + 1) * w] = row
        prev = row
    return w, h, bytes(out)


def encode_jpeg(width: int, height: int) -> bytes:
    """Structurally valid JPEG byte stream: SOI + JFIF APP0 + SOF0
    (carrying the real dimensions) + SOS with stub entropy data. The
    marker segments are spec-conformant; only the compressed scan data
    is fake — enough for any header parser, not for raster decode."""
    app0 = (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1)
        + b"\x00\x00"
    )
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x01\x11\x00"
    )
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    return b"\xff\xd8" + app0 + sof0 + sos + b"\x00" + b"\xff\xd9"


# --------------------------------------------------------------------------
# real baseline JPEG codec (pure python + numpy DCT) — grayscale,
# fixed flat quant table, standard Annex K luminance Huffman tables
# --------------------------------------------------------------------------

# JPEG zigzag scan order: index z -> (row*8 + col) position
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K luminance tables: (BITS counts per code length 1..16, HUFFVAL)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# flat quantization table (all 2s): near-lossless — roundtrip error is
# DCT rounding only, keeping the planted-perturbation pHash signal
# intact while the full quantize/entropy path is still exercised
_JPEG_QUANT = 2


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical JPEG Huffman assignment: val -> (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _dct_mat():
    import numpy as np

    n = 8
    c = np.zeros((n, n))
    for k in range(n):
        for x in range(n):
            c[k, x] = math.cos((2 * x + 1) * k * math.pi / (2 * n))
    c *= math.sqrt(2.0 / n)
    c[0, :] /= math.sqrt(2.0)
    return c


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.acc = self.nbits = 0
        return bytes(self.buf)


def _mag_bits(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: (category, amplitude bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


_POW2 = [1 << k for k in range(24)]  # quantized DCT coeffs are << 2^23


def _mag_size_amp_arrays(v, np):
    """Vectorized :func:`_mag_bits` over an int64 array — exact
    integer arithmetic (powers-of-two searchsorted, never a float
    log), elementwise-equal including v == 0 -> (0, 0)."""
    a = np.abs(v)
    sizes = np.searchsorted(_POW2, a, side="right")
    amps = np.where(
        v > 0, v, v + np.left_shift(np.int64(1), sizes) - np.int64(1)
    )
    return sizes, amps


def _pack_scan(c, ln) -> bytes:
    """Vectorized twin of feeding (code, length) pairs through
    :class:`_BitWriter` + ``flush()``: expand every symbol to its
    MSB-first bits in one (nsym x maxlen) masked matrix, ``packbits``
    the flat stream, pad the tail byte with 1-bits, byte-stuff 0x00
    after every 0xFF (a stuffed pad byte included) — BYTE-IDENTICAL
    output, pinned by the encoder equality test (the catalog's image
    oracles replay values derived from decoded pixels, so the encoded
    bytes may never drift)."""
    import numpy as np

    c = np.asarray(c, dtype=np.int64)
    ln = np.asarray(ln, dtype=np.int64)
    maxlen = int(ln.max())
    sh = ln[:, None] - 1 - np.arange(maxlen)[None, :]
    valid = sh >= 0
    bits = (c[:, None] >> np.maximum(sh, 0)) & 1
    flat = bits[valid].astype(np.uint8)  # row-major == stream order
    pad = (-len(flat)) % 8
    if pad:
        flat = np.concatenate([flat, np.ones(pad, dtype=np.uint8)])
    by = np.packbits(flat)
    stuff = np.nonzero(by == 0xFF)[0]
    if len(stuff):
        by = np.insert(by, stuff + 1, 0)
    return by.tobytes()


_HUFF_ARR_CACHE: dict = {}


def _huff_arrays(np):
    """DC/AC Huffman tables as dense int64 LUT arrays (code, length)
    indexed by symbol — the array-gather form of _huff_codes for the
    vectorized emitter. Built once per process."""
    if "v" not in _HUFF_ARR_CACHE:
        dc = _huff_codes(_DC_BITS, _DC_VALS)
        ac = _huff_codes(_AC_BITS, _AC_VALS)
        dcc = np.zeros(16, dtype=np.int64)
        dcl = np.zeros(16, dtype=np.int64)
        for s, (code, length) in dc.items():
            dcc[s], dcl[s] = code, length
        acc = np.zeros(256, dtype=np.int64)
        acl = np.zeros(256, dtype=np.int64)
        for s, (code, length) in ac.items():
            acc[s], acl[s] = code, length
        _HUFF_ARR_CACHE["v"] = (dcc, dcl, acc, acl)
    return _HUFF_ARR_CACHE["v"]


def _entropy_symbols(zz_arr, dc_deltas, np):
    """Vectorized JPEG entropy-symbol stream for an interleaved block
    sequence: ``zz_arr`` (n_blocks, 64) zigzag-ordered quantized
    coefficients, ``dc_deltas`` the per-block DC prediction deltas
    (already chained by the caller — per component for color). Returns
    (codes, lengths) int64 arrays in exact stream order.

    The run-length walk the python loop did per coefficient becomes
    array algebra: nonzero positions in row-major order ARE stream
    order; each nonzero's zero-run is its column gap to the previous
    nonzero in the row; ZRL symbols are a ``repeat`` by run>>4; EOB
    rows are those whose final zigzag slot is zero. Every symbol gets
    a (block, intra-block) sort key and one stable lexsort interleaves
    DC/ZRL/code/amplitude/EOB records exactly as the sequential writer
    emitted them — byte-equality with the loop form is pinned by
    tests on planted, flat, saturated, and random rasters."""
    dcc, dcl, acc, acl = _huff_arrays(np)
    n = zz_arr.shape[0]
    dsz, damp = _mag_size_amp_arrays(dc_deltas, np)
    A = zz_arr[:, 1:]
    asz, aamp = _mag_size_amp_arrays(A, np)
    rows_n = np.arange(n, dtype=np.int64)
    parts_r: list = []
    parts_k: list = []
    parts_c: list = []
    parts_l: list = []

    def add(r, k, c, ln):
        parts_r.append(r)
        parts_k.append(k)
        parts_c.append(c)
        parts_l.append(ln)

    # DC code, then DC amplitude where size > 0
    add(rows_n, np.full(n, -3, dtype=np.int64), dcc[dsz], dcl[dsz])
    m = dsz > 0
    add(rows_n[m], np.full(int(m.sum()), -2, dtype=np.int64), damp[m], dsz[m])
    rr, cc2 = np.nonzero(A != 0)
    if len(rr):
        first = np.empty(len(rr), dtype=bool)
        first[0] = True
        first[1:] = rr[1:] != rr[:-1]
        prev = np.empty(len(cc2), dtype=np.int64)
        prev[0] = -1
        prev[1:] = cc2[:-1]
        prev[first] = -1
        runs = cc2 - prev - 1
        nzrl = runs >> 4
        s = asz[rr, cc2]
        sym = ((runs & 15) << 4) | s
        zr = np.repeat(rr, nzrl)
        zc = np.repeat(cc2, nzrl)
        zrl_c, zrl_l = int(acc[0xF0]), int(acl[0xF0])
        add(
            zr,
            4 * zc,
            np.full(len(zr), zrl_c, dtype=np.int64),
            np.full(len(zr), zrl_l, dtype=np.int64),
        )
        add(rr, 4 * cc2 + 1, acc[sym], acl[sym])
        add(rr, 4 * cc2 + 2, aamp[rr, cc2], s)
    eob = A[:, 62] == 0
    ne = int(eob.sum())
    add(
        rows_n[eob],
        np.full(ne, 400, dtype=np.int64),
        np.full(ne, int(acc[0x00]), dtype=np.int64),
        np.full(ne, int(acl[0x00]), dtype=np.int64),
    )
    rows = np.concatenate(parts_r)
    keys = np.concatenate(parts_k)
    codes = np.concatenate(parts_c)
    lens = np.concatenate(parts_l)
    order = np.lexsort((keys, rows))
    return codes[order], lens[order]


def encode_jpeg_gray(width: int, height: int, pixels: bytes) -> bytes:
    """A REAL baseline-DCT grayscale JPEG (ITU T.81): 8x8 blocks with
    edge-replication padding, float DCT-II, flat quantization, and
    canonical Annex K Huffman entropy coding with byte stuffing — any
    standards-compliant decoder reads it. Replaces the stub-scan
    ``encode_jpeg`` wherever decoded pixels matter (VERDICT r05 item 6).
    """
    import numpy as np

    if len(pixels) != width * height:
        raise ValueError(f"raster size {len(pixels)} != {width}x{height}")
    img = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(height, width)
    bw, bh = (width + 7) // 8, (height + 7) // 8
    padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
    padded[:height, :width] = img
    padded[height:, :width] = img[-1:, :]  # edge replication
    padded[:, width:] = padded[:, width - 1 : width]
    padded -= 128.0
    c = _dct_mat()
    # batched DCT + quantize + zigzag up front (per-block numpy scalar
    # indexing dominated the original loop) — bit-identical to the
    # per-block form (same dgemm per 8x8 slice), pinned by the
    # decode-checksum test. The entropy stage is fully vectorized too
    # (_entropy_symbols + _pack_scan) — byte-equal to the sequential
    # _BitWriter form, pinned by the encoder equality test.
    tiles = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    qall = np.round((c @ tiles @ c.T) / _JPEG_QUANT).astype(np.int64)
    zz_arr = qall.reshape(bh * bw, 64)[:, _ZIGZAG]
    codes, lens = _entropy_symbols(
        zz_arr, np.diff(zz_arr[:, 0], prepend=np.int64(0)), np
    )
    scan = _pack_scan(codes, lens)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(payload)) + payload

    dqt = seg(0xDB, b"\x00" + bytes(_JPEG_QUANT for _ in range(64)))
    sof0 = seg(0xC0, b"\x08" + struct.pack(">HH", height, width) + b"\x01\x01\x11\x00")
    dht = seg(
        0xC4,
        b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS)
        + b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS),
    )
    sos = seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    return b"\xff\xd8" + dqt + sof0 + dht + sos + scan + b"\xff\xd9"


def _extend(amp: int, size: int) -> int:
    """Inverse of JPEG magnitude coding."""
    if size == 0:
        return 0
    return amp if amp >= (1 << (size - 1)) else amp - (1 << size) + 1


_HUFF_LUT_CACHE: dict[bytes, "object"] = {}


def _huff_lut(spec: bytes):
    """Table-driven canonical Huffman decode: a 2^16-entry LUT mapping
    every 16-bit lookahead to ``(symbol << 8) | code_length`` (0 where
    no code matches). Built once per DHT byte-spec and cached for the
    worker's lifetime — the per-bit tree walk this replaces dominated
    JPEG decode (~70% of wall in profiling; the LUT makes each symbol
    one integer index)."""
    cached = _HUFF_LUT_CACHE.get(spec)
    if cached is not None:
        return cached
    import numpy as np

    bits = list(spec[:16])
    vals = list(spec[16:])
    lut = np.zeros(1 << 16, dtype=np.int32)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            start = code << (16 - length)
            lut[start : start + (1 << (16 - length))] = (vals[k] << 8) | length
            code += 1
            k += 1
        code <<= 1
    as_list = lut.tolist()  # plain-int indexing is ~3x numpy scalar access
    _HUFF_LUT_CACHE[spec] = as_list
    return as_list


def decode_jpeg_gray(payload: bytes | None) -> tuple[int, int, bytes] | None:
    """REAL raster decode of a baseline-DCT grayscale JPEG: segment
    walk (DQT/SOF0/DHT/SOS from the actual bytes — no assumption the
    encoder was ours), canonical Huffman decode with byte unstuffing,
    dequantize, float IDCT, level shift + clamp. Returns (width,
    height, row-major pixels); None for null payloads; raises on
    progressive/multi-component/stub-scan streams. This replaces the
    r05 header-only JPEG guard with a true pixel path."""
    import numpy as np

    if payload is None:
        return None
    b = bytes(payload)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    i = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    w = h = None
    comp_q = 0
    scan_start = None
    dc_id = ac_id = 0
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError("bad JPEG segment alignment")
        marker = b[i + 1]
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
        data = b[i + 4 : i + 2 + seglen]
        if marker == 0xDB:
            j = 0
            while j < len(data):
                pq, tq = data[j] >> 4, data[j] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = list(data[j + 1 : j + 65])
                j += 65
        elif marker in (0xC1, 0xC2) or (marker in _JPEG_SOF and marker != 0xC0):
            raise ValueError(f"non-baseline JPEG (SOF{marker - 0xC0})")
        elif marker == 0xC0:
            if data[0] != 8 or data[5] != 1:
                raise ValueError("only 8-bit single-component JPEG")
            h, w = struct.unpack(">HH", data[1:5])
            if data[7] != 0x11:
                raise ValueError("subsampled JPEG unsupported")
            comp_q = data[8]
        elif marker == 0xC4:
            j = 0
            while j < len(data):
                tc, th = data[j] >> 4, data[j] & 0xF
                bits = list(data[j + 1 : j + 17])
                n = sum(bits)
                huff[(tc, th)] = bytes(data[j + 1 : j + 17 + n])
                j += 17 + n
        elif marker == 0xDA:
            if data[0] != 1:
                raise ValueError("multi-component scan unsupported")
            dc_id, ac_id = data[2] >> 4, data[2] & 0xF
            scan_start = i + 2 + seglen
            break
        i += 2 + seglen
    if w is None or scan_start is None:
        raise ValueError("JPEG missing SOF0 or SOS")
    if comp_q not in qt or (0, dc_id) not in huff or (1, ac_id) not in huff:
        raise ValueError("JPEG missing quant/Huffman tables (stub scan?)")
    q = np.array(qt[comp_q], dtype=np.float64)
    dc_lut, ac_lut = _huff_lut(huff[(0, dc_id)]), _huff_lut(huff[(1, ac_id)])
    end = b.rfind(b"\xff\xd9")
    scan = b[scan_start : end if end > scan_start else len(b)]
    # validate byte stuffing up front (vectorized), then destuff once —
    # replaces the per-bit stuffing checks the old reader paid
    sarr = np.frombuffer(scan, dtype=np.uint8)
    ff = np.nonzero(sarr == 0xFF)[0]
    if len(ff):
        if ff[-1] == len(sarr) - 1 or not np.all(sarr[ff + 1] == 0x00):
            raise ValueError("unexpected marker in scan")
    # zero-padded so the last block's 16-bit peeks never IndexError on
    # a well-formed stream; a genuinely truncated scan runs off the pad
    stream = scan.replace(b"\xff\x00", b"\xff") + b"\x00\x00\x00"
    c = _dct_mat()
    bw, bh = (w + 7) // 8, (h + 7) // 8
    try:
        return _jpeg_scan_decode(stream, (dc_lut, ac_lut), bw, bh, w, h, q, c, np)
    except IndexError:
        raise ValueError("JPEG scan truncated") from None


def _jpeg_scan_decode(stream, lut_list, bw, bh, w, h, q, c, np):
    """Hot loop of decode_jpeg_gray, two-phase (r16 — measured ~2x on
    the pHash corpus over the r15 per-block form):

    1. SERIAL entropy parse — buffered bit reader (`buf` holds `nbits`
       pending bits) + one cached-LUT 16-bit peek per Huffman symbol
       instead of a per-bit tree walk, emitting (block, zigzag-pos,
       value) triples as plain Python ints. No numpy inside the
       per-symbol loop: the r15 form paid ~6 small-array numpy calls
       per 8x8 block (zero/scatter/2 matmuls/store), which dominated
       once the bit reader was LUT-fast.
    2. ONE vectorized tail — fancy-index scatter of all coefficients,
       broadcast dequantize, one de-zigzag permutation, and a single
       batched (n,8,8) IDCT. Identical float operations in identical
       per-block order (elementwise zz*q then c.T @ B @ c per 8x8
       slice), so decoded rasters are BYTE-IDENTICAL to the serial
       form — pinned by the corpus sweep in
       tests/test_streaming_multimodal.py."""
    dc_lut, ac_lut = lut_list
    buf = nbits = pos = 0
    prev_dc = 0
    nblocks = bw * bh
    bidx: list = []
    zpos: list = []
    vals: list = []
    for bi in range(nblocks):
        # DC symbol
        while nbits < 16:
            buf = (buf << 8) | stream[pos]
            pos += 1
            nbits += 8
        e = dc_lut[(buf >> (nbits - 16)) & 0xFFFF]
        ln = e & 0xFF
        if ln == 0:
            raise ValueError("bad Huffman code in JPEG scan")
        nbits -= ln
        size = e >> 8
        if size:
            while nbits < size:
                buf = (buf << 8) | stream[pos]
                pos += 1
                nbits += 8
            amp = (buf >> (nbits - size)) & ((1 << size) - 1)
            nbits -= size
            prev_dc += (
                amp if amp >= (1 << (size - 1)) else amp - (1 << size) + 1
            )
        buf &= (1 << nbits) - 1
        bidx.append(bi)
        zpos.append(0)
        vals.append(prev_dc)
        z = 1
        while z < 64:
            while nbits < 16:
                buf = (buf << 8) | stream[pos]
                pos += 1
                nbits += 8
            e = ac_lut[(buf >> (nbits - 16)) & 0xFFFF]
            ln = e & 0xFF
            if ln == 0:
                raise ValueError("bad Huffman code in JPEG scan")
            nbits -= ln
            sym = e >> 8
            if sym == 0x00:  # EOB
                buf &= (1 << nbits) - 1
                break
            run, size = sym >> 4, sym & 0xF
            if size == 0:
                if run != 15:
                    raise ValueError("bad AC symbol")
                z += 16  # ZRL
                buf &= (1 << nbits) - 1
                continue
            z += run
            if z >= 64:
                raise ValueError("AC run overflow")
            while nbits < size:
                buf = (buf << 8) | stream[pos]
                pos += 1
                nbits += 8
            amp = (buf >> (nbits - size)) & ((1 << size) - 1)
            nbits -= size
            buf &= (1 << nbits) - 1
            bidx.append(bi)
            zpos.append(z)
            vals.append(
                amp if amp >= (1 << (size - 1)) else amp - (1 << size) + 1
            )
            z += 1
    coefs = np.zeros((nblocks, 64), dtype=np.float64)
    coefs[bidx, zpos] = vals
    coefs *= q  # q is zigzag-ordered; same elementwise product as zz*q
    nat = np.zeros((nblocks, 64), dtype=np.float64)
    nat[:, _ZIGZAG] = coefs
    blocks = nat.reshape(nblocks, 8, 8)
    res = (c.T @ blocks) @ c  # batched per-slice dgemm
    out = (
        res.reshape(bh, bw, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(bh * 8, bw * 8)
    )
    pix = np.clip(np.round(out[:h, :w] + 128.0), 0, 255).astype(np.uint8)
    return w, h, pix.tobytes()


def decode_raster(payload: bytes | None) -> tuple[int, int, bytes] | None:
    """Format-dispatching raster decode: PNG (lossless zlib/unfilter
    path), baseline JPEG (DCT path), or GIF (LZW path) by signature.
    The single entry point the pHash pipeline uses — JPEG corpora now
    get true pixels instead of the r05 header-only guard."""
    if payload is None:
        return None
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png_gray(b)
    if b[:2] == b"\xff\xd8":
        return decode_jpeg_gray(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_gray(b)
    raise ValueError("unsupported raster format (PNG/JPEG/GIF only)")


def encode_gif(width: int, height: int) -> bytes:
    """Minimal GIF89a: header + logical screen descriptor + trailer."""
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00" + b"\x3b"


def _lzw_gif_encode(indices: bytes, min_code_size: int = 8) -> bytes:
    """GIF LZW compression (the deflate-free half of GIF89a):
    variable-width codes packed LSB-first, CLEAR emitted up front and
    whenever the dictionary hits 4096, EOI at the end. Bit-width bumps
    when the next free code would overflow the current width — the
    exact mirror of the decoder below."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    cur = b""
    for byte in indices:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = nxt[-1:]
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_gif_decode(data: bytes, min_code_size: int = 8) -> bytes:
    """GIF LZW decompression, including the KwKwK self-reference case
    and mid-stream CLEAR handling."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    acc = nbits = pos = 0
    out = bytearray()
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated (no EOI)")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError("bad GIF LZW code")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        if len(table) >= (1 << width) and width < 12:
            width += 1
        prev = entry


def encode_gif_gray(width: int, height: int, pixels: bytes) -> bytes:
    """A fully valid GIF89a for an 8-bit grayscale raster: global
    color table of 256 identity-gray entries, one image block, REAL
    LZW-compressed index stream in 255-byte sub-blocks — any compliant
    decoder reads it (the raster IS the palette indices). Replaces the
    structural-only ``encode_gif`` wherever decoded pixels matter."""
    if len(pixels) != width * height:
        raise ValueError(f"raster size {len(pixels)} != {width}x{height}")
    lsd = struct.pack("<HH", width, height) + b"\xf7\x00\x00"
    gct = bytes(v for i in range(256) for v in (i, i, i))
    desc = b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    lzw = _lzw_gif_encode(bytes(pixels), 8)
    blocks = bytearray(b"\x08")
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return b"GIF89a" + lsd + gct + desc + bytes(blocks) + b"\x3b"


def decode_gif_gray(payload: bytes | None) -> tuple[int, int, bytes] | None:
    """REAL raster decode of a grayscale (identity-palette) GIF:
    logical-screen walk, global color table, extension-block skip,
    sub-block reassembly, LZW decompression, palette lookup (gray =
    red channel). Raises on interlaced images, local color tables, or
    index streams of the wrong length; None for null payloads."""
    if payload is None:
        return None
    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack("<HH", b[6:10])
    packed = b[10]
    i = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = b[i : i + 3 * n]
        i += 3 * n
    while i < len(b):
        block = b[i]
        if block == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(b) and b[i] != 0:
                i += 1 + b[i]
            i += 1
        elif block == 0x2C:
            left, top, iw, ih = struct.unpack("<HHHH", b[i + 1 : i + 9])
            ipacked = b[i + 9]
            i += 10
            if ipacked & 0x40:
                raise ValueError("interlaced GIF unsupported")
            if ipacked & 0x80:
                raise ValueError("local color tables unsupported")
            if (left, top, iw, ih) != (0, 0, w, h):
                raise ValueError("sub-frame GIF unsupported")
            min_code = b[i]
            i += 1
            lzw = bytearray()
            while i < len(b) and b[i] != 0:
                ln = b[i]
                lzw += b[i + 1 : i + 1 + ln]
                i += 1 + ln
            i += 1
            if palette is None:
                raise ValueError("GIF missing color table")
            idx = _lzw_gif_decode(bytes(lzw), min_code)
            if len(idx) != w * h:
                raise ValueError(
                    f"GIF indices {len(idx)}, want {w * h}"
                )
            # gray value = palette red channel of each index
            return w, h, bytes(palette[3 * k] for k in idx)
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"bad GIF block 0x{block:02x}")
    raise ValueError("GIF missing image data (structural stub?)")


# --------------------------------------------------------------------------
# real header parsing (the "headers" codec)
# --------------------------------------------------------------------------

# SOF markers carrying frame dimensions: C0-CF minus DHT(C4)/JPG(C8)/DAC(CC)
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def parse_image_header(
    payload: bytes | None,
) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) from real container bytes; (None, None,
    None) when the payload is null or no known signature matches."""
    if payload is None:
        return None, None, None
    b = bytes(payload)
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return "png", w, h
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker == 0xFF:  # optional 0xFF fill byte before a marker
                i += 1
                continue
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone
                i += 2
                continue
            if marker == 0xDA:  # scan data — dims must precede it
                break
            seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if marker in _JPEG_SOF and i + 9 <= len(b):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return "jpeg", w, h
            i += 2 + seglen
        return None, None, None
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return "gif", w, h
    return None, None, None


MEDIA_HEADER_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def encode_wav(
    sample_rate: int,
    n_samples: int,
    *,
    channels: int = 1,
    bits: int = 16,
    pcm: bytes | None = None,
) -> bytes:
    """RIFF/WAVE PCM container. With ``pcm`` (little-endian int16
    frames) the data chunk carries the REAL samples — a playable file
    any WAV reader accepts. Without it, the chunk declares the true
    size but carries at most 64 bytes: enough for any header parser,
    not for playback (same stance as the JPEG entropy stub)."""
    block_align = channels * bits // 8
    data_size = n_samples * block_align
    fmt_chunk = b"fmt " + struct.pack(
        "<IHHIIHH",
        16,
        1,
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    if pcm is not None:
        if len(pcm) != data_size:
            raise ValueError(f"pcm is {len(pcm)} bytes, expected {data_size}")
        body = pcm
    else:
        body = b"\x00" * min(data_size, 64)
    data_chunk = b"data" + struct.pack("<I", data_size) + body
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVE"
        + fmt_chunk
        + data_chunk
    )


def _mp4_box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def encode_mp4(duration_ms: int, *, timescale: int = 1000) -> bytes:
    """Minimal ISO-BMFF stream: ftyp + moov(mvhd v0) carrying the real
    timescale/duration. Box structure is spec-conformant; there are no
    media tracks (header-only stub)."""
    mvhd = _mp4_box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation/modification
        + struct.pack(">II", timescale, duration_ms * timescale // 1000)
        + struct.pack(">I", 0x00010000)  # rate
        + struct.pack(">H", 0x0100)  # volume
        + b"\x00" * 10  # reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", 2),  # next_track_ID
    )
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    return ftyp + _mp4_box(b"moov", mvhd)


def _parse_wav(b: bytes):
    """(sample_rate, channels, duration_ms) from RIFF chunks; sizes come
    from chunk headers (robust to stub sample data)."""
    i, sr, ch, block_align, data_size = 12, None, None, None, None
    while i + 8 <= len(b):
        tag = b[i : i + 4]
        size = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if tag == b"fmt " and i + 24 <= len(b):
            _, ch, sr, _, block_align, _ = struct.unpack("<HHIIHH", b[i + 8 : i + 24])
        elif tag == b"data":
            data_size = size
            break  # declared size may exceed the stub bytes present
        i += 8 + size + (size & 1)
    if sr and ch and block_align and data_size is not None:
        n_samples = data_size // block_align
        return sr, ch, n_samples * 1000 // sr
    return None, None, None


def _parse_mp4(b: bytes):
    """duration_ms from moov/mvhd (version 0 or 1)."""
    i = 0
    while i + 8 <= len(b):
        size = struct.unpack(">I", b[i : i + 4])[0]
        if size < 8:
            break
        if b[i + 4 : i + 8] == b"moov":
            j = i + 8
            end = min(i + size, len(b))
            while j + 8 <= end:
                bsize = struct.unpack(">I", b[j : j + 4])[0]
                if bsize < 8:
                    break
                if b[j + 4 : j + 8] == b"mvhd":
                    ver = b[j + 8] if j + 9 <= end else None
                    if ver == 1 and j + 40 <= end:
                        ts, dur = struct.unpack(">IQ", b[j + 28 : j + 40])
                    elif ver == 0 and j + 28 <= end:
                        ts, dur = struct.unpack(">II", b[j + 20 : j + 28])
                    else:
                        return None  # truncated mvhd — malformed, not a crash
                    if ts:
                        return dur * 1000 // ts
                j += bsize
        i += size
    return None


def parse_media_header(payload: bytes | None):
    """(fmt, width, height, sample_rate, channels, duration_ms) across
    the image formats plus WAV audio and MP4 video; fields that don't
    apply to the format are None."""
    fmt, w, h = parse_image_header(payload)
    if fmt is not None:
        return fmt, w, h, None, None, None
    if payload is None:
        return None, None, None, None, None, None
    b = bytes(payload)
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        sr, ch, dur = _parse_wav(b)
        return ("wav", None, None, sr, ch, dur) if sr else (None,) * 6
    if len(b) >= 12 and b[4:8] == b"ftyp":
        dur = _parse_mp4(b)
        if dur is not None:
            return "mp4", None, None, None, None, dur
    return None, None, None, None, None, None


def _stub_decode(payload: bytes | None) -> tuple[int | None, int | None]:
    """Deterministic fake decode: derives a (width, height) from payload
    length — stands in for an image codec so the batch plumbing and
    downstream schema are exercised end-to-end."""
    if payload is None:
        return None, None
    n = len(payload)
    return (n % 640) + 1, ((n * 7) % 480) + 1


def decode_image_batch(
    df: DataFrame, *, codec: str = "stub", batch_hint_mb: int = 64
) -> DataFrame:
    """Decode payloads to per-item metadata via ``mapInPandas``.

    Arrow moves each partition to Python in columnar batches; the udf
    iterates batches, never rows. ``repartition`` upstream controls
    batch memory (payloads are large — size partitions so a batch of
    them fits executor memory; see SURVEY.md §7.5.3).

    ``codec="headers"`` parses REAL PNG/JPEG/GIF container bytes
    (format + dimensions, see :func:`parse_image_header`) and returns
    ``HEADER_SCHEMA``; ``codec="raster"`` performs TRUE pixel decode
    (grayscale PNG / baseline JPEG via :func:`decode_raster`) and
    returns ``DECODED_SCHEMA`` with the md5 of the decoded raster;
    ``codec="stub"`` returns ``DECODED_SCHEMA`` with length-derived
    fake dims.
    """
    if codec == "raster":

        def raster_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import hashlib

            for pdf in batches:
                ws, hs, cks = [], [], []
                for p in pdf["payload"]:
                    decoded = decode_raster(p)
                    if decoded is None:
                        ws.append(None); hs.append(None); cks.append(None)
                    else:
                        w, h, pix = decoded
                        ws.append(w); hs.append(h)
                        cks.append(hashlib.md5(pix).hexdigest())
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "width": pd.array(ws, dtype="Int32"),
                        "height": pd.array(hs, dtype="Int32"),
                        "n_bytes": [
                            len(p) if p is not None else None
                            for p in pdf["payload"]
                        ],
                        "checksum": cks,
                    }
                )

        return df.mapInPandas(raster_fn, DECODED_SCHEMA)
    if codec == "headers":

        def parse_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                parsed = [parse_image_header(p) for p in pdf["payload"]]
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "fmt": [p[0] for p in parsed],
                        "width": pd.array([p[1] for p in parsed], dtype="Int32"),
                        "height": pd.array([p[2] for p in parsed], dtype="Int32"),
                        "n_bytes": [
                            len(p) if p is not None else None
                            for p in pdf["payload"]
                        ],
                    }
                )

        return df.mapInPandas(parse_fn, HEADER_SCHEMA)
    if codec != "stub":
        raise NotImplementedError(
            f"codec {codec!r}: available codecs are 'raster' (true "
            "grayscale PNG/baseline-JPEG pixel decode), 'headers' "
            "(PNG/JPEG/GIF header parse), and 'stub'; other formats "
            "need an image library not present in this container"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            dims = [_stub_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.array(
                        [d[0] for d in dims], dtype="Int32"
                    ),
                    "height": pd.array(
                        [d[1] for d in dims], dtype="Int32"
                    ),
                    "n_bytes": [
                        len(p) if p is not None else None for p in pdf["payload"]
                    ],
                    "checksum": [
                        hashlib.md5(p).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                }
            )

    return df.mapInPandas(fn, DECODED_SCHEMA)


def decode_media_batch(df: DataFrame) -> DataFrame:
    """Full-spectrum header decode (images + WAV + MP4) via
    ``mapInPandas`` — same batch shape as :func:`decode_image_batch`,
    wider metadata schema."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_media_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "fmt": [p[0] for p in parsed],
                    "width": pd.array([p[1] for p in parsed], dtype="Int32"),
                    "height": pd.array([p[2] for p in parsed], dtype="Int32"),
                    "sample_rate": pd.array([p[3] for p in parsed], dtype="Int32"),
                    "channels": pd.array([p[4] for p in parsed], dtype="Int32"),
                    "duration_ms": pd.array([p[5] for p in parsed], dtype="Int64"),
                }
            )

    return df.mapInPandas(fn, MEDIA_HEADER_SCHEMA)


def plant_media_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic mixed-modality corpus: format cycles png/jpeg/gif/
    wav/mp4 by ``id % 5``, every metadata field an arithmetic function
    of the id (see the query oracle in queries/llm.py):

        images: width = id % 64 + 1, height = (id * 7) % 48 + 1
        wav:    sample_rate = 8000 + (id % 4) * 4000,
                duration_ms = (id % 10 + 1) * 100
        mp4:    duration_ms = (id % 20 + 1) * 500
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _gen(ids: pd.Series) -> pd.Series:
        def make(i: int) -> bytes:
            m = i % 5
            if m < 3:
                enc = (encode_png, encode_jpeg, encode_gif)[m]
                return enc(i % 64 + 1, (i * 7) % 48 + 1)
            if m == 3:
                sr = 8000 + (i % 4) * 4000
                dur_ms = (i % 10 + 1) * 100
                return encode_wav(sr, sr * dur_ms // 1000)
            return encode_mp4((i % 20 + 1) * 500)

        return ids.map(lambda i: make(int(i)))

    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        _gen(F.col(id_col)).alias("payload"),
    )


def plant_image_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic media corpus for decode verification: per id, a
    REAL image payload (format cycling png/jpeg/gif by ``id % 3``) whose
    dimensions are arithmetic functions of the id — so an oracle can
    predict what a genuine decode must return:

        width  = id % 64 + 1,  height = (id * 7) % 48 + 1

    Generation runs executor-side as an Arrow-batched pandas UDF.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _gen(ids: pd.Series) -> pd.Series:
        encoders = (encode_png, encode_jpeg, encode_gif)
        return ids.map(
            lambda i: encoders[int(i) % 3](int(i) % 64 + 1, (int(i) * 7) % 48 + 1)
        )

    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        _gen(F.col(id_col)).alias("payload"),
    )


# --------------------------------------------------------------------------
# perceptual hash over DECODED pixels (difference hash, 64-bit)
# --------------------------------------------------------------------------

# planted pHash corpus parameters — the oracle predicts every pixel from
# these (queries/llm.py), so the whole decode→hash path is hash-verified
PHASH_COPY_OFFSET = 1_000_000
PHASH_COPY_EVERY = 4


def dhash64(pix: bytes, w: int, h: int) -> tuple[int, int]:
    """64-bit difference hash over a row-major grayscale raster,
    returned as two non-negative 32-bit halves (portable: packing the
    full 64 bits into one BIGINT would set the sign bit).

    Classic dHash: sample a 9x8 grid (nearest-neighbor at x=i*w//9,
    y=j*h//8 — integer arithmetic only, so an engine-independent oracle
    can reproduce it), emit bit j*8+i = 1 iff grid[j][i] > grid[j][i+1].
    Near-identical images differ in few bits; Hamming distance over the
    halves ranks similarity."""
    xs = [i * w // 9 for i in range(9)]
    ys = [j * h // 8 for j in range(8)]
    hi = lo = 0
    for j in range(8):
        base = ys[j] * w
        for i in range(8):
            if pix[base + xs[i]] > pix[base + xs[i + 1]]:
                k = j * 8 + i
                if k < 32:
                    hi |= 1 << k
                else:
                    lo |= 1 << (k - 32)
    return hi, lo


def _phash_raster(bid: int, w: int, h: int, nflip: int) -> bytes:
    """Deterministic per-id raster (id-dependent so distinct ids get
    distinct images): pixel = (x*31 + y*17 + bid*13) % 256, with the
    first ``nflip`` dHash row-sample pixels at x=0 brightened by 125 —
    a formulaic perturbation that flips at most ``nflip`` hash bits.
    Evaluated as one numpy outer sum (the corpus plants run this for
    every image; the scalar formula stays in this docstring and the
    query oracles)."""
    import numpy as np

    pix = (
        np.add.outer(
            np.arange(h, dtype=np.int64) * 17,
            np.arange(w, dtype=np.int64) * 31,
        )
        + bid * 13
    ) % 256
    pix = bytearray(pix.astype(np.uint8).tobytes())
    for j in range(nflip):
        p = (j * h // 8) * w
        pix[p] = (pix[p] + 125) % 256
    return bytes(pix)


def plant_phash_corpus(
    df: DataFrame, id_col: str, *, codec: str = "png"
) -> DataFrame:
    """Near-duplicate image corpus as REAL payloads (``codec``: "png"
    lossless or "jpeg" baseline-DCT): one base image per id (dims and
    raster arithmetic functions of the id) plus, for every
    ``PHASH_COPY_EVERY``-th id, a perturbed copy under id +
    ``PHASH_COPY_OFFSET`` whose raster differs in ``id % 3`` sampled
    pixels. Payload generation is an Arrow-batched pandas UDF."""
    from pyspark.sql.functions import pandas_udf

    if codec not in ("png", "jpeg"):
        raise ValueError(f"codec {codec!r}: png or jpeg")
    enc = encode_png_gray if codec == "png" else encode_jpeg_gray

    @pandas_udf("binary")
    def _gen(ids: pd.Series) -> pd.Series:
        def make(i: int) -> bytes:
            is_copy = i >= PHASH_COPY_OFFSET
            bid = i - PHASH_COPY_OFFSET if is_copy else i
            w, h = bid % 48 + 16, (bid * 7) % 32 + 16
            nflip = bid % 3 if is_copy else 0
            return enc(w, h, _phash_raster(bid, w, h, nflip))

        return ids.map(lambda i: make(int(i)))

    ids = df.select(F.col(id_col).cast("long").alias("media_id"))
    copies = ids.filter(F.col("media_id") % PHASH_COPY_EVERY == 0).select(
        (F.col("media_id") + PHASH_COPY_OFFSET).alias("media_id")
    )
    # the id list inherits the source table's (few) input partitions;
    # hash-repartition the tiny long column BEFORE generating payloads
    # so the expensive encode — and every decode stage pipelined on top
    # of it — spreads across all cores. The partition count must be
    # EXPLICIT: the ids are ~KBs, so AQE's size-based coalescing would
    # fold an unnumbered repartition back to one task and serialize
    # the whole codec stage (measured 24 s at sf0.1 vs ~2 s spread).
    spark = df.sparkSession
    n_parts = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
    )
    corpus = ids.unionByName(copies).repartition(n_parts, F.col("media_id"))
    return corpus.select("media_id", _gen(F.col("media_id")).alias("payload"))


CROSS_CODEC_OFFSET = 1_000_000
CROSS_CODEC_EVERY = 2


def plant_cross_codec_corpus(df: DataFrame, id_col: str) -> DataFrame:
    """Cross-codec duplicate corpus: every id gets a PNG of its planted
    raster; every ``CROSS_CODEC_EVERY``-th id ALSO appears as a REAL
    baseline JPEG of the SAME raster under id + ``CROSS_CODEC_OFFSET``
    — the asset-dedup scenario where one image circulates re-encoded.
    The pHash pipeline must match them across codecs (JPEG loss on this
    raster never flips a dHash bit — adjacent-pixel gaps are ~31 vs
    <=2-LSB quantization noise)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _gen(ids: pd.Series) -> pd.Series:
        def make(i: int) -> bytes:
            is_jpeg = i >= CROSS_CODEC_OFFSET
            bid = i - CROSS_CODEC_OFFSET if is_jpeg else i
            w, h = bid % 48 + 16, (bid * 7) % 32 + 16
            pix = _phash_raster(bid, w, h, 0)
            enc = encode_jpeg_gray if is_jpeg else encode_png_gray
            return enc(w, h, pix)

        return ids.map(lambda i: make(int(i)))

    ids = df.select(F.col(id_col).cast("long").alias("media_id"))
    copies = ids.filter(F.col("media_id") % CROSS_CODEC_EVERY == 0).select(
        (F.col("media_id") + CROSS_CODEC_OFFSET).alias("media_id")
    )
    corpus = _spread_ids(ids.unionByName(copies), "media_id")
    return corpus.select("media_id", _gen(F.col("media_id")).alias("payload"))


def plant_tri_codec_corpus(df: DataFrame, id_col: str) -> DataFrame:
    """Triple-codec duplicate corpus: every CROSS_CODEC_EVERY-th id
    appears as the SAME planted raster encoded three ways — PNG (id),
    baseline JPEG (id + CROSS_CODEC_OFFSET), and LZW GIF (id +
    2*CROSS_CODEC_OFFSET) — the asset-dedup scenario where one image
    circulates re-encoded through whatever pipeline touched it last.
    The pHash path must collapse all three."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _gen(ids: pd.Series) -> pd.Series:
        def make(i: int) -> bytes:
            codec, bid = i // CROSS_CODEC_OFFSET, i % CROSS_CODEC_OFFSET
            w, h = bid % 48 + 16, (bid * 7) % 32 + 16
            pix = _phash_raster(bid, w, h, 0)
            if codec == 0:
                return encode_png_gray(w, h, pix)
            if codec == 1:
                return encode_jpeg_gray(w, h, pix)
            return encode_gif_gray(w, h, pix)

        return ids.map(lambda i: make(int(i)))

    ids = df.select(F.col(id_col).cast("long").alias("media_id"))
    dup = ids.filter(F.col("media_id") % CROSS_CODEC_EVERY == 0)
    corpus = ids.unionByName(
        dup.select((F.col("media_id") + CROSS_CODEC_OFFSET).alias("media_id"))
    ).unionByName(
        dup.select(
            (F.col("media_id") + 2 * CROSS_CODEC_OFFSET).alias("media_id")
        )
    )
    corpus = _spread_ids(corpus, "media_id")
    return corpus.select("media_id", _gen(F.col("media_id")).alias("payload"))


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("h_hi", T.LongType(), True),
        T.StructField("h_lo", T.LongType(), True),
    ]
)


def phash_batch(df: DataFrame) -> DataFrame:
    """media (media_id, payload) → perceptual hash via REAL pixel
    decode, dispatched by signature (decode_raster): PNG zlib-inflate
    + unfilter, or baseline-JPEG Huffman + IDCT. dHash the raster.
    Arrow-batched mapInPandas — the decode loop runs executor-side
    over columnar batches."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, his, los = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                decoded = decode_raster(payload)
                ids.append(mid)
                if decoded is None:
                    ws.append(None); hs.append(None)
                    his.append(None); los.append(None)
                    continue
                w, h, pix = decoded
                hi, lo = dhash64(pix, w, h)
                ws.append(w); hs.append(h); his.append(hi); los.append(lo)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": pd.array(ws, dtype="Int64"),
                    "height": pd.array(hs, dtype="Int64"),
                    "h_hi": pd.array(his, dtype="Int64"),
                    "h_lo": pd.array(los, dtype="Int64"),
                }
            )

    return df.mapInPandas(fn, PHASH_SCHEMA)


# Row-block budget for the Arrow Hamming verify (float-free: n x n
# uint64 matrices), same rationale as similarity._PAIR_BLOCK_ELEMS —
# a hot band bucket streams through in bounded slices.
_HAM_BLOCK_ELEMS = 1 << 22
_HAM_NUM_BLOCKS = 8
# The Arrow verify's hot threshold is much higher than the join twin's
# (dedup.banded_pairs hot_threshold=64):
# the kernel row-blocks internally (memory stays bounded), a 4096-row
# bucket is ~16M vectorized XOR/popcount ops ≈ tens of ms in one task,
# and splitting earlier costs more than it buys — the blocked scheme's
# x{_HAM_NUM_BLOCKS} replication and 36x group fan-out put ~47k pandas
# group frames through the workers at sf0.1 (measured slower than the
# join). Blocks exist for buckets past this, where one task's n^2 wall
# would dominate.
_HAM_ARROW_HOT_THRESHOLD = 4096


def _hamming_pair_kernel(max_distance: int, blocked: bool):
    """applyInPandas kernel emitting a bucket's Hamming-close pairs:
    vectorized XOR + SWAR popcount over row blocks, ``id_a < id_b``.
    Integer-only, so equality with the join path is exact by
    construction. ``blocked=True`` is the hot-bucket form: rows carry
    ``__blk`` and the group's (b1, b2) replica key, and a pair is
    emitted only when its ordered block pair IS the group key — the
    exactly-once rule of dedup.banded_pairs' blocked self-join."""
    import numpy as np

    M1 = np.uint64(0x5555555555555555)
    M2 = np.uint64(0x3333333333333333)
    M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    H01 = np.uint64(0x0101010101010101)

    def popcount(x):
        x = x - ((x >> np.uint64(1)) & M1)
        x = (x & M2) + ((x >> np.uint64(2)) & M2)
        x = (x + (x >> np.uint64(4))) & M4
        return (x * H01) >> np.uint64(56)

    empty = pd.DataFrame(
        {
            "id_a": pd.array([], dtype="int64"),
            "id_b": pd.array([], dtype="int64"),
            "hamming": pd.array([], dtype="int64"),
        }
    )

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n <= 1:
            return empty
        ids = pdf["doc"].to_numpy(dtype=np.int64)
        o = np.argsort(ids)  # one row per doc per bucket -> unique ids
        ids = ids[o]
        hi = pdf["h_hi"].to_numpy(dtype=np.int64)[o].astype(np.uint64)
        lo = pdf["h_lo"].to_numpy(dtype=np.int64)[o].astype(np.uint64)
        if blocked:
            blk = pdf["__blk"].to_numpy(dtype=np.int64)[o]
            b1 = int(pdf["b1"].iloc[0])
            b2 = int(pdf["b2"].iloc[0])
        step = max(1, _HAM_BLOCK_ELEMS // n)
        out_a, out_b, out_h = [], [], []
        for s in range(0, n, step):
            e = min(s + step, n)
            ham = popcount(hi[s:e, None] ^ hi[None, :]) + popcount(
                lo[s:e, None] ^ lo[None, :]
            )
            keep = (ham <= np.uint64(max_distance)) & (
                ids[None, :] > ids[s:e, None]
            )
            if blocked:
                bmin = np.minimum(blk[s:e, None], blk[None, :])
                bmax = np.maximum(blk[s:e, None], blk[None, :])
                keep &= (bmin == b1) & (bmax == b2)
            rr, cc = np.nonzero(keep)
            out_a.append(ids[s + rr])
            out_b.append(ids[cc])
            out_h.append(ham[rr, cc].astype(np.int64))
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "hamming": np.concatenate(out_h),
            }
        )

    return kern


_HAM_PAIR_SCHEMA = "id_a long, id_b long, hamming long"


def phash_hamming_pairs(
    hashes: DataFrame,
    *,
    max_distance: int = 3,
    cache_into: list | None = None,
    impl: str = "arrow",
) -> DataFrame:
    """Image near-dup pairs by pHash Hamming distance via banded LSH:
    the 64-bit hash splits into four 16-bit bands; by pigeonhole, any
    pair within Hamming distance 3 agrees on at least one band, so
    bucketing on (band, value) finds EVERY such pair while comparing
    only within buckets — linear in corpus size, never all-pairs.

    VERIFY stage (VERDICT r14 #4): the id-derived planted rasters put
    ~88M candidate pairs through ~1.4k buckets at sf0.1, and the
    ``impl="join"`` twin (the skew-guarded
    :func:`..dedup.banded_pairs` self-join) materializes every
    candidate as a JVM join row before the distance filter drops all
    but a few thousand — measured 9.7 s at sf0.1 for the pair stage
    alone. The default ``impl="arrow"`` keeps the identical banding,
    window-count hot/cold split, and blocked exactly-once hot-bucket
    scheme, but scores each bucket in ONE applyInPandas kernel
    (row-blocked XOR + SWAR popcount, ≤ {_HAM_BLOCK_ELEMS}-element
    slices) and only SURVIVING pairs cross the Arrow boundary.
    Hamming is integer arithmetic, so the two impls are equal by
    construction — pinned by a twin-equality test and the unchanged
    DuckDB oracles of every consumer.

    ``hashes``: (media_id, h_hi, h_lo). Returns (id_a, id_b, hamming).
    """
    if impl not in ("arrow", "join"):
        raise ValueError(f"impl {impl!r}: arrow or join")
    mask = F.lit(0xFFFF)
    bandvals = [
        F.shiftrightunsigned(F.col("h_hi"), 16).bitwiseAND(mask),
        F.col("h_hi").bitwiseAND(mask),
        F.shiftrightunsigned(F.col("h_lo"), 16).bitwiseAND(mask),
        F.col("h_lo").bitwiseAND(mask),
    ]
    band_struct = F.explode(
        F.array(
            *[
                F.struct(F.lit(b).alias("band"), v.alias("key"))
                for b, v in enumerate(bandvals)
            ]
        )
    ).alias("bk")
    if impl == "join":
        from .dedup import banded_pairs

        exploded = hashes.select(
            F.col("media_id").alias("doc"),
            F.struct("h_hi", "h_lo").alias("ph"),
            band_struct,
        ).select(
            "doc", "ph", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
        )
        pairs = banded_pairs(exploded, payload_col="ph", cache_into=cache_into)
        ham = (
            F.bit_count(F.col("ph_a.h_hi").bitwiseXOR(F.col("ph_b.h_hi")))
            + F.bit_count(F.col("ph_a.h_lo").bitwiseXOR(F.col("ph_b.h_lo")))
        ).cast("long")
        return (
            pairs.select("id_a", "id_b", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_distance)
            .distinct()  # a close pair can share several bands
        )

    exploded = hashes.select(
        F.col("media_id").alias("doc"), "h_hi", "h_lo", band_struct
    ).select(
        "doc", "h_hi", "h_lo",
        F.col("bk.band").alias("band"), F.col("bk.key").alias("key"),
    )
    # EXPLICIT partition count (the plant_phash_corpus lesson): the
    # banded table is only ~8 MB at sf0.1, so AQE's size-based
    # coalescing folds the groupBy exchange to ONE post-shuffle
    # partition and the entire kernel serializes on one core (measured
    # 6 s vs ~1.5 s spread). One keyed repartition serves the window,
    # the cold grouping, AND the hot grouping (hash on (band, key)
    # satisfies the superset clustering (band, key, b1, b2)), so the
    # arrow path pays exactly one exchange of the banded rows.
    spark = hashes.sparkSession
    n_parts = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
    )
    exploded = exploded.repartition(n_parts, "band", "key")
    # same persist rationale as banded_pairs: the cold/hot split makes
    # two consumers of the expensive hash stage feeding ``exploded``
    w = Window.partitionBy("band", "key")
    tagged = exploded.withColumn("__bn", F.count(F.lit(1)).over(w)).persist()
    if cache_into is not None:
        cache_into.append(tagged)
    cold = tagged.filter(F.col("__bn") <= _HAM_ARROW_HOT_THRESHOLD).drop(
        "__bn"
    )
    hot = tagged.filter(F.col("__bn") > _HAM_ARROW_HOT_THRESHOLD).drop("__bn")
    cold_pairs = cold.groupBy("band", "key").applyInPandas(
        _hamming_pair_kernel(max_distance, blocked=False), _HAM_PAIR_SCHEMA
    )
    # hot buckets: the banded_pairs blocked scheme — replicate each row
    # once per block q under the ordered key (min(blk,q), max(blk,q));
    # the kernel's block-pair equality keeps each pair exactly once and
    # the worst GROUP shrinks from n to ~2n/num_blocks rows.
    blocks = F.array(*[F.lit(q) for q in range(_HAM_NUM_BLOCKS)])
    hotb = hot.withColumn(
        "__blk",
        F.pmod(F.xxhash64(F.col("doc")), F.lit(_HAM_NUM_BLOCKS)).cast("int"),
    )
    replicated = hotb.withColumn(
        "__bp",
        F.explode(
            F.transform(
                blocks,
                lambda q: F.struct(
                    F.least(F.col("__blk"), q).alias("b1"),
                    F.greatest(F.col("__blk"), q).alias("b2"),
                ),
            )
        ),
    ).select(
        "doc", "h_hi", "h_lo", "band", "key", "__blk",
        F.col("__bp.b1").alias("b1"), F.col("__bp.b2").alias("b2"),
    )
    hot_pairs = replicated.groupBy("band", "key", "b1", "b2").applyInPandas(
        _hamming_pair_kernel(max_distance, blocked=True), _HAM_PAIR_SCHEMA
    )
    # a close pair can share several bands (and a hot and a cold bucket
    # across different bands) — distinct at pair grain, like the twin
    return cold_pairs.unionByName(hot_pairs).distinct()


# --------------------------------------------------------------------------
# truecolor rasters: RGB PNG + 4:4:4 color JPEG + ITU-R luma (VERDICT
# r06 item 7 — real corpora are color JPEGs; the gray-only decoders
# above stay untouched because their perf is plan-/bench-pinned)
# --------------------------------------------------------------------------


def encode_png_rgb(
    width: int, height: int, rgb: bytes, *, filter_cycle: bool = False
) -> bytes:
    """A fully valid 8-bit TRUECOLOR PNG (color type 2, correct CRCs,
    zlib IDAT) from row-major interleaved RGB. Filters operate bytewise
    with bpp=3 ("left" is 3 bytes back, per the PNG spec);
    ``filter_cycle=True`` rotates the five filter types across rows to
    exercise every decoder path."""
    if len(rgb) != 3 * width * height:
        raise ValueError(f"raster size {len(rgb)} != 3*{width}x{height}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = 3 * width
    rows = []
    prev = bytes(stride)
    for y in range(height):
        row = rgb[y * stride : (y + 1) * stride]
        ft = (y % 5) if filter_cycle else 0
        if ft == 0:
            enc = row
        elif ft == 1:  # Sub
            enc = bytes(
                (row[x] - (row[x - 3] if x >= 3 else 0)) % 256
                for x in range(stride)
            )
        elif ft == 2:  # Up
            enc = bytes((row[x] - prev[x]) % 256 for x in range(stride))
        elif ft == 3:  # Average
            enc = bytes(
                (row[x] - ((row[x - 3] if x >= 3 else 0) + prev[x]) // 2) % 256
                for x in range(stride)
            )
        else:  # Paeth
            enc = bytes(
                (
                    row[x]
                    - _paeth(
                        (row[x - 3] if x >= 3 else 0),
                        prev[x],
                        (prev[x - 3] if x >= 3 else 0),
                    )
                )
                % 256
                for x in range(stride)
            )
        rows.append(bytes([ft]) + enc)
        prev = row
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(rows), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_rgb(payload: bytes | None) -> tuple[int, int, bytes] | None:
    """REAL raster decode of an 8-bit truecolor PNG (color type 2):
    chunk walk, zlib inflate, bpp=3 unfiltering for all five filter
    types. Returns (width, height, interleaved RGB); raises on
    non-truecolor streams (decode_png_gray owns color type 0)."""
    if payload is None:
        return None
    b = bytes(payload)
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    i, w, h, idat = 8, None, None, []
    while i + 8 <= len(b):
        (length,) = struct.unpack(">I", b[i : i + 4])
        tag = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={ctype}, "
                    f"interlace={interlace}): only non-interlaced truecolor-8"
                )
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        i += 12 + length
    if w is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    raw = zlib.decompress(b"".join(idat))
    stride = 3 * w
    if len(raw) != (stride + 1) * h:
        raise ValueError(f"IDAT inflates to {len(raw)}, want {(stride + 1) * h}")
    out = bytearray(stride * h)
    prev = bytes(stride)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ft == 1:  # Sub
            for x in range(3, stride):
                row[x] = (row[x] + row[x - 3]) % 256
        elif ft == 2:  # Up
            for x in range(stride):
                row[x] = (row[x] + prev[x]) % 256
        elif ft == 3:  # Average
            for x in range(stride):
                left = row[x - 3] if x >= 3 else 0
                row[x] = (row[x] + (left + prev[x]) // 2) % 256
        elif ft == 4:  # Paeth
            for x in range(stride):
                left = row[x - 3] if x >= 3 else 0
                ul = prev[x - 3] if x >= 3 else 0
                row[x] = (row[x] + _paeth(left, prev[x], ul)) % 256
        elif ft != 0:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y * stride : (y + 1) * stride] = row
        prev = row
    return w, h, bytes(out)


def _rgb_to_ycc(rgb, np):
    """JFIF RGB -> YCbCr (float planes, clamped to [0, 255])."""
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return [np.clip(p, 0.0, 255.0) for p in (y, cb, cr)]


def encode_jpeg_color(width: int, height: int, rgb: bytes) -> bytes:
    """A REAL baseline-DCT COLOR JPEG (ITU T.81, JFIF YCbCr, 4:4:4 —
    no chroma subsampling, so each MCU is one 8x8 block per component
    interleaved Y,Cb,Cr): per-plane edge-replication padding, float
    DCT-II, flat quantization, canonical Annex K Huffman with per-
    component DC prediction. All three components legally share quant
    table 0 and the luminance Huffman tables. Any standards-compliant
    decoder reads the stream."""
    import numpy as np

    if len(rgb) != 3 * width * height:
        raise ValueError(f"raster size {len(rgb)} != 3*{width}x{height}")
    img = np.frombuffer(bytes(rgb), dtype=np.uint8).reshape(height, width, 3)
    planes = _rgb_to_ycc(img, np)
    bw, bh = (width + 7) // 8, (height + 7) // 8
    padded = []
    for p in planes:
        pp = np.empty((bh * 8, bw * 8), dtype=np.float64)
        pp[:height, :width] = p
        pp[height:, :width] = p[-1:, :]
        pp[:, width:] = pp[:, width - 1 : width]
        padded.append(pp - 128.0)
    c = _dct_mat()
    # batched DCT + quantize + zigzag for every block of every plane up
    # front (per-block numpy scalar indexing dominated the loop); the
    # entropy stage is the vectorized emitter shared with the gray
    # encoder — interleaved (by, bx, ci) block order, DC prediction
    # chained PER COMPONENT, byte-equal to the sequential _BitWriter
    # form (encoder equality test).
    tiles = np.stack(
        [
            p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
            for p in padded
        ],
        axis=2,
    )  # (bh, bw, 3, 8, 8)
    qall = np.round((c @ tiles @ c.T) / _JPEG_QUANT).astype(np.int64)
    zz_arr = qall.reshape(bh * bw * 3, 64)[:, _ZIGZAG]
    dcs = zz_arr[:, 0].reshape(-1, 3)
    deltas = np.diff(dcs, axis=0, prepend=np.zeros((1, 3), dtype=np.int64))
    codes, lens = _entropy_symbols(zz_arr, deltas.reshape(-1), np)
    scan = _pack_scan(codes, lens)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(payload)) + payload

    dqt = seg(0xDB, b"\x00" + bytes(_JPEG_QUANT for _ in range(64)))
    sof0 = seg(
        0xC0,
        b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x03"
        + b"\x01\x11\x00"
        + b"\x02\x11\x00"
        + b"\x03\x11\x00",
    )
    dht = seg(
        0xC4,
        b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS)
        + b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS),
    )
    sos = seg(0xDA, b"\x03\x01\x00\x02\x00\x03\x00\x00\x3f\x00")
    return b"\xff\xd8" + dqt + sof0 + dht + sos + scan + b"\xff\xd9"


def decode_jpeg_color(payload: bytes | None) -> tuple[int, int, bytes] | None:
    """REAL raster decode of a baseline-DCT 4:4:4 COLOR JPEG: segment
    walk (DQT/SOF0/DHT/SOS from the actual bytes), interleaved-MCU
    Huffman decode with per-component DC prediction and the shared
    16-bit LUT (_huff_lut), dequantize + float IDCT per plane, then
    JFIF YCbCr -> RGB. Returns (width, height, interleaved RGB);
    raises on progressive/subsampled/single-component streams
    (decode_jpeg_gray owns those)."""
    import numpy as np

    if payload is None:
        return None
    b = bytes(payload)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    i = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], bytes] = {}
    w = h = None
    comp_q = [0, 0, 0]
    scan_tabs = [(0, 0), (0, 0), (0, 0)]
    scan_start = None
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError("bad JPEG segment alignment")
        marker = b[i + 1]
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
        data = b[i + 4 : i + 2 + seglen]
        if marker == 0xDB:
            j = 0
            while j < len(data):
                pq, tq = data[j] >> 4, data[j] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = list(data[j + 1 : j + 65])
                j += 65
        elif marker in _JPEG_SOF and marker != 0xC0:
            raise ValueError(f"non-baseline JPEG (SOF{marker - 0xC0})")
        elif marker == 0xC0:
            if data[0] != 8 or data[5] != 3:
                raise ValueError("only 8-bit 3-component JPEG")
            h, w = struct.unpack(">HH", data[1:5])
            for ci in range(3):
                if data[6 + 3 * ci + 1] != 0x11:
                    raise ValueError("subsampled JPEG unsupported")
                comp_q[ci] = data[6 + 3 * ci + 2]
        elif marker == 0xC4:
            j = 0
            while j < len(data):
                tc, th = data[j] >> 4, data[j] & 0xF
                bits = list(data[j + 1 : j + 17])
                n = sum(bits)
                huff[(tc, th)] = bytes(data[j + 1 : j + 17 + n])
                j += 17 + n
        elif marker == 0xDA:
            if data[0] != 3:
                raise ValueError("expected 3-component scan")
            for ci in range(3):
                t = data[2 + 2 * ci]
                scan_tabs[ci] = (t >> 4, t & 0xF)
            scan_start = i + 2 + seglen
            break
        i += 2 + seglen
    if w is None or scan_start is None:
        raise ValueError("JPEG missing SOF0 or SOS")
    for ci in range(3):
        if comp_q[ci] not in qt:
            raise ValueError("JPEG missing quant table")
        if (0, scan_tabs[ci][0]) not in huff or (1, scan_tabs[ci][1]) not in huff:
            raise ValueError("JPEG missing Huffman tables")
    qs = [np.array(qt[comp_q[ci]], dtype=np.float64) for ci in range(3)]
    luts = [
        (_huff_lut(huff[(0, scan_tabs[ci][0])]), _huff_lut(huff[(1, scan_tabs[ci][1])]))
        for ci in range(3)
    ]
    end = b.rfind(b"\xff\xd9")
    scan = b[scan_start : end if end > scan_start else len(b)]
    sarr = np.frombuffer(scan, dtype=np.uint8)
    ff = np.nonzero(sarr == 0xFF)[0]
    if len(ff):
        if ff[-1] == len(sarr) - 1 or not np.all(sarr[ff + 1] == 0x00):
            raise ValueError("unexpected marker in scan")
    stream = scan.replace(b"\xff\x00", b"\xff") + b"\x00\x00\x00"
    c = _dct_mat()
    bw, bh = (w + 7) // 8, (h + 7) // 8
    # pure-Python zigzag buffers in the bit loop; dequantize + IDCT run
    # as ONE batched numpy pass afterwards (per-block numpy calls cost
    # more than the math at 8x8)
    n_blocks = bh * bw
    allzz = [[0.0] * 64 for _ in range(n_blocks * 3)]
    buf = nbits = pos = 0
    prev_dc = [0, 0, 0]
    bi = 0
    try:
        for _by in range(bh):
            for _bx in range(bw):
                for ci in range(3):
                    dc_lut, ac_lut = luts[ci]
                    zz = allzz[bi]
                    bi += 1
                    while nbits < 16:
                        buf = (buf << 8) | stream[pos]
                        pos += 1
                        nbits += 8
                    e = dc_lut[(buf >> (nbits - 16)) & 0xFFFF]
                    ln = e & 0xFF
                    if ln == 0:
                        raise ValueError("bad Huffman code in JPEG scan")
                    nbits -= ln
                    size = e >> 8
                    if size:
                        while nbits < size:
                            buf = (buf << 8) | stream[pos]
                            pos += 1
                            nbits += 8
                        amp = (buf >> (nbits - size)) & ((1 << size) - 1)
                        nbits -= size
                        prev_dc[ci] += (
                            amp
                            if amp >= (1 << (size - 1))
                            else amp - (1 << size) + 1
                        )
                    buf &= (1 << nbits) - 1
                    zz[0] = prev_dc[ci]
                    z = 1
                    while z < 64:
                        while nbits < 16:
                            buf = (buf << 8) | stream[pos]
                            pos += 1
                            nbits += 8
                        e = ac_lut[(buf >> (nbits - 16)) & 0xFFFF]
                        ln = e & 0xFF
                        if ln == 0:
                            raise ValueError("bad Huffman code in JPEG scan")
                        nbits -= ln
                        sym = e >> 8
                        if sym == 0x00:  # EOB
                            buf &= (1 << nbits) - 1
                            break
                        run, size = sym >> 4, sym & 0xF
                        if size == 0:
                            if run != 15:
                                raise ValueError("bad AC symbol")
                            z += 16
                            buf &= (1 << nbits) - 1
                            continue
                        z += run
                        if z >= 64:
                            raise ValueError("AC run overflow")
                        while nbits < size:
                            buf = (buf << 8) | stream[pos]
                            pos += 1
                            nbits += 8
                        amp = (buf >> (nbits - size)) & ((1 << size) - 1)
                        nbits -= size
                        buf &= (1 << nbits) - 1
                        zz[z] = (
                            amp
                            if amp >= (1 << (size - 1))
                            else amp - (1 << size) + 1
                        )
                        z += 1
    except IndexError:
        raise ValueError("JPEG scan truncated") from None
    # batched dequantize + IDCT: component ci occupies slots bi%3 == ci
    zz_arr = np.array(allzz, dtype=np.float64).reshape(n_blocks, 3, 64)
    qarr = np.stack(qs)  # (3, 64)
    coefs = np.zeros((n_blocks, 3, 64), dtype=np.float64)
    coefs[:, :, _ZIGZAG] = zz_arr * qarr[None, :, :]
    blocks = c.T @ coefs.reshape(n_blocks, 3, 8, 8) @ c
    planes = [np.empty((bh * 8, bw * 8), dtype=np.float64) for _ in range(3)]
    for ci in range(3):
        planes[ci] = (
            blocks[:, ci]
            .reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
    y = planes[0][:h, :w] + 128.0
    cb = planes[1][:h, :w]
    cr = planes[2][:h, :w]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bch = y + 1.772 * cb
    rgb = np.stack(
        [np.clip(np.round(p), 0, 255).astype(np.uint8) for p in (r, g, bch)],
        axis=-1,
    )
    return w, h, rgb.tobytes()


def _jpeg_ncomp(b: bytes) -> int:
    """Minimal marker walk to SOF0's component count."""
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError("bad JPEG segment alignment")
        marker = b[i + 1]
        if marker in (0xD9, 0xDA):
            break
        seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
        if marker == 0xC0:
            return b[i + 4 + 5]
        i += 2 + seglen
    raise ValueError("JPEG missing SOF0")


def rgb_luma(rgb: bytes, np=None) -> bytes:
    """ITU-R BT.601 luma with the standard integer approximation
    ``(77 R + 150 G + 29 B + 128) >> 8`` — pure integer arithmetic so
    an engine-independent oracle reproduces it bit-exact."""
    if np is None:
        import numpy as np
    a = np.frombuffer(bytes(rgb), dtype=np.uint8).astype(np.int64)
    y = (77 * a[0::3] + 150 * a[1::3] + 29 * a[2::3] + 128) >> 8
    return y.astype(np.uint8).tobytes()


def decode_raster_luma(
    payload: bytes | None,
) -> tuple[int, int, int, bytes] | None:
    """Color-aware raster decode to LUMA: dispatch PNG/JPEG by
    signature AND color layout (PNG IHDR color type; JPEG SOF0
    component count), decode truecolor to RGB then fold to BT.601
    integer luma, or pass grayscale pixels straight through. Returns
    (width, height, n_channels, luma_pixels) — the single entry point
    for perceptual hashing over mixed gray/color corpora."""
    if payload is None:
        return None
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        ctype = b[25]  # IHDR data byte 9: 8 sig + 4 len + 4 tag + 9
        if ctype == 2:
            w, h, rgb = decode_png_rgb(b)
            return w, h, 3, rgb_luma(rgb)
        w, h, pix = decode_png_gray(b)
        return w, h, 1, pix
    if b[:2] == b"\xff\xd8":
        if _jpeg_ncomp(b) == 3:
            w, h, rgb = decode_jpeg_color(b)
            return w, h, 3, rgb_luma(rgb)
        w, h, pix = decode_jpeg_gray(b)
        return w, h, 1, pix
    if b[:6] in (b"GIF87a", b"GIF89a"):
        w, h, pix = decode_gif_gray(b)
        return w, h, 1, pix
    raise ValueError("unsupported raster format (PNG/JPEG/GIF only)")


RGB_PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("n_channels", T.LongType(), True),
        T.StructField("h_hi", T.LongType(), True),
        T.StructField("h_lo", T.LongType(), True),
    ]
)


def rgb_phash_batch(df: DataFrame) -> DataFrame:
    """media (media_id, payload) → perceptual hash over the BT.601
    LUMA of a color-aware decode (decode_raster_luma): truecolor
    PNG/JPEG corpora hash on luminance exactly like the grayscale
    path, so gray and color re-encodes of the same content collide.
    Arrow-batched mapInPandas."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, ncs, his, los = [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                decoded = decode_raster_luma(payload)
                ids.append(mid)
                if decoded is None:
                    ws.append(None); hs.append(None); ncs.append(None)
                    his.append(None); los.append(None)
                    continue
                w, h, nc, pix = decoded
                hi, lo = dhash64(pix, w, h)
                ws.append(w); hs.append(h); ncs.append(nc)
                his.append(hi); los.append(lo)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": pd.array(ws, dtype="Int64"),
                    "height": pd.array(hs, dtype="Int64"),
                    "n_channels": pd.array(ncs, dtype="Int64"),
                    "h_hi": pd.array(his, dtype="Int64"),
                    "h_lo": pd.array(los, dtype="Int64"),
                }
            )

    return df.mapInPandas(fn, RGB_PHASH_SCHEMA)


def _phash_banded(hashes: DataFrame) -> DataFrame:
    """(media_id, h_hi, h_lo) → 4 rows of (doc, ph, band, key): the
    16-bit band explosion shared by the self-join and the incremental
    versus-join (banding is arithmetic, so the persisted store stays
    plain hashes and bands on read — a narrow projection)."""
    mask = F.lit(0xFFFF)
    bandvals = [
        F.shiftrightunsigned(F.col("h_hi"), 16).bitwiseAND(mask),
        F.col("h_hi").bitwiseAND(mask),
        F.shiftrightunsigned(F.col("h_lo"), 16).bitwiseAND(mask),
        F.col("h_lo").bitwiseAND(mask),
    ]
    return hashes.select(
        F.col("media_id").alias("doc"),
        F.struct("h_hi", "h_lo").alias("ph"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), v.alias("key"))
                    for b, v in enumerate(bandvals)
                ]
            )
        ).alias("bk"),
    ).select("doc", "ph", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def incremental_phash_near_duplicates(
    new_hashes: DataFrame,
    seen_hashes: DataFrame,
    *,
    max_distance: int = 3,
    cache_into: list | None = None,
    fresh_into: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Near-dup of a NEW media batch against the persisted perceptual-
    hash store WITHOUT re-decoding history — the image/audio member of
    the incremental family (exact fingerprints, minhash signatures,
    span grams). ``seen_hashes`` is the persisted (media_id, h_hi,
    h_lo) table from earlier ingests (or empty with that schema).

    Returns ``(pairs, updated_store)``: Hamming<=d pairs of new media
    against history AND within the batch, plus the store to persist.
    Per batch only the batch's payloads decode; the store contributes
    a 16-byte row per historical image, banded on read (arithmetic) —
    at 100 TB of media the store is ~0.0001% of the data. Results
    equal a full recompute over the union corpus restricted to pairs
    touching the batch; the store update is replay-idempotent (re-
    ingested ids add no duplicate rows).

    ``fresh_into``: when a list is passed, receives the batch's FRESH
    (media_id, h_hi, h_lo) rows — what a physical parquet store should
    APPEND — derived from the PERSISTED banded batch, so the caller
    never re-runs the decode/hash lineage under ``new_hashes`` a second
    time just to compute the store delta (measured a full duplicate
    phash pass at the 1:10 ingest bench)."""
    nb = _phash_banded(new_hashes).persist()
    if cache_into is not None:
        cache_into.append(nb)
    ham = (
        F.bit_count(F.col("a_ph.h_hi").bitwiseXOR(F.col("b_ph.h_hi")))
        + F.bit_count(F.col("a_ph.h_lo").bitwiseXOR(F.col("b_ph.h_lo")))
    ).cast("long")
    # ingest orientation (the batch_minus_store/SemDeDup rule): the
    # batch is the small side — broadcast it on both joins so the
    # banded store streams through one scan and is never shuffled
    l, r = nb.alias("l"), F.broadcast(nb).alias("r")
    within = l.join(
        r,
        (F.col("l.band") == F.col("r.band"))
        & (F.col("l.key") == F.col("r.key"))
        & (F.col("l.doc") < F.col("r.doc")),
    ).select(
        F.col("l.doc").alias("id_a"),
        F.col("r.doc").alias("id_b"),
        F.col("l.ph").alias("a_ph"),
        F.col("r.ph").alias("b_ph"),
    )
    hb = _phash_banded(seen_hashes).alias("h")
    versus = F.broadcast(nb).alias("n").join(
        hb,
        (F.col("n.band") == F.col("h.band"))
        & (F.col("n.key") == F.col("h.key"))
        # replay guard: a re-ingested id must not pair with itself
        & (F.col("n.doc") != F.col("h.doc")),
    ).select(
        F.least(F.col("n.doc"), F.col("h.doc")).alias("id_a"),
        F.greatest(F.col("n.doc"), F.col("h.doc")).alias("id_b"),
        F.when(F.col("n.doc") < F.col("h.doc"), F.col("n.ph"))
        .otherwise(F.col("h.ph"))
        .alias("a_ph"),
        F.when(F.col("n.doc") < F.col("h.doc"), F.col("h.ph"))
        .otherwise(F.col("n.ph"))
        .alias("b_ph"),
    )
    pairs = (
        within.unionByName(versus)
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_distance)
        .distinct()
    )
    from .dedup import batch_minus_store

    # O(batch) store-freshness check — the store is scanned, never
    # shuffled (batch_minus_store docstring). Re-derive the plain
    # (media_id, h_hi, h_lo) rows from the PERSISTED banded frame
    # (band 0 carries one row per doc) instead of new_hashes, whose
    # lineage re-runs the whole decode+hash pass per consumer.
    batch_plain = nb.filter(F.col("band") == 0).select(
        F.col("doc").alias("media_id"),
        F.col("ph.h_hi").alias("h_hi"),
        F.col("ph.h_lo").alias("h_lo"),
    )
    fresh = batch_minus_store(
        batch_plain,
        seen_hashes.select("media_id"),
        "media_id",
        batch_distinct=True,  # one band-0 row per media_id by construction
        store_unique_keys=True,  # one hash row per media_id by contract
    )
    if fresh_into is not None:
        fresh_into.append(fresh)
    return pairs, seen_hashes.unionByName(fresh)


# channel formulas for the planted RGB rasters (also mirrored in the
# query oracles — keep the constants in sync with queries/llm.py)
RGB_PLANT = ((31, 17, 13), (29, 23, 7), (19, 11, 5))


def _rgb_plant_raster(bid: int, w: int, h: int, nflip: int):
    """Deterministic per-id RGB raster: channel c of pixel (x, y) is
    ``(x*a_c + y*b_c + bid*d_c) % 256`` with (a, b, d) from RGB_PLANT;
    the first ``nflip`` dHash row-sample pixels at x=0 get +125 (mod
    256) on ALL channels — a bounded perturbation that flips at most
    ``nflip`` luma-hash bits. Returns an (h, w, 3) uint8 array."""
    import numpy as np

    chans = []
    for a, bcoef, d in RGB_PLANT:
        chans.append(
            (
                np.add.outer(
                    np.arange(h, dtype=np.int64) * bcoef,
                    np.arange(w, dtype=np.int64) * a,
                )
                + bid * d
            )
            % 256
        )
    rgb = np.stack(chans, axis=-1).astype(np.uint8)
    for j in range(nflip):
        yy = j * h // 8
        rgb[yy, 0, :] = (rgb[yy, 0, :].astype(np.int64) + 125) % 256
    return rgb


def plant_rgb_phash_corpus(
    df: DataFrame,
    id_col: str,
    *,
    codec: str = "jpeg",
    with_copies: bool = True,
) -> DataFrame:
    """Near-duplicate COLOR image corpus as real truecolor payloads
    (``codec``: "png" lossless or "jpeg" baseline 4:4:4 YCbCr): one
    base image per id plus, when ``with_copies``, a perturbed copy for
    every PHASH_COPY_EVERY-th id under id + PHASH_COPY_OFFSET (same
    planted-pair convention as the grayscale corpus)."""
    from pyspark.sql.functions import pandas_udf

    if codec not in ("png", "jpeg"):
        raise ValueError(f"codec {codec!r}: png or jpeg")

    @pandas_udf("binary")
    def _gen(ids: pd.Series) -> pd.Series:
        def make(i: int) -> bytes:
            is_copy = i >= PHASH_COPY_OFFSET
            bid = i - PHASH_COPY_OFFSET if is_copy else i
            w, h = bid % 48 + 16, (bid * 7) % 32 + 16
            nflip = bid % 3 if is_copy else 0
            rgb = _rgb_plant_raster(bid, w, h, nflip).tobytes()
            if codec == "png":
                return encode_png_rgb(w, h, rgb)
            return encode_jpeg_color(w, h, rgb)

        return ids.map(lambda i: make(int(i)))

    ids = df.select(F.col(id_col).cast("long").alias("media_id"))
    corpus = ids
    if with_copies:
        copies = ids.filter(F.col("media_id") % PHASH_COPY_EVERY == 0).select(
            (F.col("media_id") + PHASH_COPY_OFFSET).alias("media_id")
        )
        corpus = ids.unionByName(copies)
    corpus = _spread_ids(corpus, "media_id")
    return corpus.select("media_id", _gen(F.col("media_id")).alias("payload"))


RGB_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("r_sum", T.LongType(), True),
        T.StructField("g_sum", T.LongType(), True),
        T.StructField("b_sum", T.LongType(), True),
        T.StructField("luma_sum", T.LongType(), True),
        T.StructField("dominant", T.StringType(), True),
    ]
)


def rgb_stats_batch(df: DataFrame) -> DataFrame:
    """Per-image channel statistics over TRUE truecolor decode:
    exact integer channel sums, the BT.601 integer-luma sum, and the
    dominant channel (ties break r > g > b). All-integer so a
    lossless-codec corpus is bit-exact reproducible by an arithmetic
    oracle — the end-to-end proof of the RGB PNG decode path.
    Arrow-batched mapInPandas; numpy per payload, no per-pixel
    Python."""
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in RGB_STATS_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rows["media_id"].append(mid)
                if payload is None:
                    for k in RGB_STATS_SCHEMA.fieldNames()[1:]:
                        rows[k].append(None)
                    continue
                w, h, rgb = decode_png_rgb(bytes(payload))
                a = np.frombuffer(rgb, dtype=np.uint8).astype(np.int64)
                r, g, b = a[0::3], a[1::3], a[2::3]
                rs, gs, bs = int(r.sum()), int(g.sum()), int(b.sum())
                luma = int((((77 * r + 150 * g + 29 * b + 128) >> 8)).sum())
                dom = (
                    "r"
                    if rs >= gs and rs >= bs
                    else ("g" if gs >= bs else "b")
                )
                rows["width"].append(w)
                rows["height"].append(h)
                rows["r_sum"].append(rs)
                rows["g_sum"].append(gs)
                rows["b_sum"].append(bs)
                rows["luma_sum"].append(luma)
                rows["dominant"].append(dom)
            yield pd.DataFrame(
                {
                    k: (
                        pd.array(v, dtype="Int64")
                        if k not in ("media_id", "dominant")
                        else v
                    )
                    for k, v in rows.items()
                }
            )

    return df.mapInPandas(fn, RGB_STATS_SCHEMA)


def frame_sample(
    df: DataFrame,
    *,
    every_n: int = 10,
    id_col: str = "media_id",
) -> DataFrame:
    """Deterministic 1-in-N sampling by id hash — the cheap pre-filter
    before expensive decode (run BEFORE mapInPandas so skipped payloads
    are never shipped to Python)."""
    return df.filter((F.col(id_col) % every_n) == 0)


def with_feature(
    df: DataFrame,
    feature_fn: Callable[[pd.Series], pd.Series],
    *,
    out_col: str = "feature",
    out_type: str = "array<float>",
) -> DataFrame:
    """Arrow-batched feature extraction over the payload column via a
    scalar pandas UDF (e.g. an embedding model's preprocess+forward)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(out_type)
    def _udf(payload: pd.Series) -> pd.Series:
        return feature_fn(payload)

    return df.withColumn(out_col, _udf(F.col("payload")))


def _spread_ids(df: DataFrame, id_col: str) -> DataFrame:
    """Hash-repartition a tiny id column with an EXPLICIT partition
    count before payload generation, so the expensive codec work — and
    every decode stage pipelined on top of it — spreads across all
    cores instead of inheriting the source's single row-group task
    (AQE's size-based coalescing would fold an unnumbered repartition
    of a KB-sized id list back to one task; see plant_phash_corpus)."""
    spark = df.sparkSession
    n_parts = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
    )
    return df.repartition(n_parts, F.col(id_col))


# --------------------------------------------------------------------------
# audio: real PCM waveforms + vectorized feature extraction
# --------------------------------------------------------------------------

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("peak_abs", T.LongType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
        T.StructField("sum_squares", T.LongType(), True),
    ]
)


def audio_pcm_samples(bid: int) -> tuple[int, list[int]]:
    """Deterministic per-id waveform (sample_rate, int16 samples):
    a stepping sawtooth whose slope and phase derive from the id —
    value-varied (exercises peak/RMS) and sign-alternating (exercises
    zero-crossing counting), yet arithmetically replayable by an
    engine-independent oracle:

        step = bid % 7 + 3
        s_i  = (i * step + bid * 11) % 2048 - 1024
    """
    sr = 8000 + (bid % 4) * 2000
    n = (bid % 8 + 2) * 250
    step = bid % 7 + 3
    return sr, [(i * step + bid * 11) % 2048 - 1024 for i in range(n)]


def plant_audio_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Audio corpus as REAL playable WAV files: 16-bit mono PCM whose
    every sample is an arithmetic function of the id
    (:func:`audio_pcm_samples`), so a feature-extraction oracle can
    recompute what a genuine decode must hear. Arrow-batched UDF."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _gen(ids: pd.Series) -> pd.Series:
        def make(i: int) -> bytes:
            # numpy evaluation of the audio_pcm_samples formula (same
            # values — the scalar reference stays for tests/oracle)
            sr = 8000 + (i % 4) * 2000
            n = (i % 8 + 2) * 250
            step = i % 7 + 3
            s = (np.arange(n, dtype=np.int64) * step + i * 11) % 2048 - 1024
            return encode_wav(sr, n, pcm=s.astype("<i2").tobytes())

        return ids.map(lambda i: make(int(i)))

    ids = _spread_ids(
        df.select(F.col(id_col).cast("long").alias("media_id")), "media_id"
    )
    return ids.select("media_id", _gen(F.col("media_id")).alias("payload"))


def decode_wav_pcm(payload: bytes | None):
    """(sample_rate, channels, frames: bytes) from a RIFF/WAVE payload —
    the actual data-chunk bytes, clamped to what is present (robust to
    the header-only stub form). None if not a parseable PCM WAV."""
    if payload is None:
        return None
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, sr, ch, bits = 12, None, None, None
    while i + 8 <= len(b):
        tag = b[i : i + 4]
        size = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if tag == b"fmt " and i + 24 <= len(b):
            _, ch, sr, _, _, bits = struct.unpack("<HHIIHH", b[i + 8 : i + 24])
        elif tag == b"data":
            if not (sr and ch and bits == 16):
                return None
            frames = b[i + 8 : i + 8 + min(size, len(b) - i - 8)]
            return sr, ch, frames
        i += 8 + size + (size & 1)
    return None


def audio_feature_batch(df: DataFrame) -> DataFrame:
    """(media_id, payload) → per-clip audio features via REAL PCM
    decode: peak amplitude, zero-crossing count, and the exact integer
    sum of squares (RMS = sqrt(sum_squares / n) derives JVM-side so no
    float leaves Python). numpy-vectorized inside Arrow batches."""
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, srs, ns, peaks, zcs, sqs = [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ids.append(mid)
                decoded = decode_wav_pcm(payload)
                if decoded is None:
                    srs.append(None); ns.append(None); peaks.append(None)
                    zcs.append(None); sqs.append(None)
                    continue
                sr, ch, frames = decoded
                s = np.frombuffer(
                    frames[: len(frames) // 2 * 2], dtype="<i2"
                ).astype(np.int64)
                srs.append(sr)
                ns.append(len(s) // ch)
                peaks.append(int(np.abs(s).max()) if len(s) else 0)
                zcs.append(int(np.count_nonzero(s[:-1] * s[1:] < 0)))
                sqs.append(int((s * s).sum()))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "sample_rate": pd.array(srs, dtype="Int32"),
                    "n_samples": pd.array(ns, dtype="Int64"),
                    "peak_abs": pd.array(peaks, dtype="Int64"),
                    "zero_crossings": pd.array(zcs, dtype="Int64"),
                    "sum_squares": pd.array(sqs, dtype="Int64"),
                }
            )

    return df.mapInPandas(fn, AUDIO_FEATURE_SCHEMA)


SPECTRAL_FRAME = 64

AUDIO_SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("wht_abs_sum", T.LongType(), True),
        T.StructField("wht_weighted_sum", T.LongType(), True),
        T.StructField("wht_dominant", T.LongType(), True),
        T.StructField("wht_rolloff", T.LongType(), True),
        T.StructField("fft_centroid", T.DoubleType(), True),
    ]
)

_WHT_SIGNS = None


def _wht_sign_matrix(np):
    """64x64 Walsh-Hadamard sign matrix S[k,i] = (-1)^popcount(k&i),
    built once per worker. S @ s is the (unnormalized) WHT — a genuine
    fast transform (O(n log n) via butterflies; the matrix form is fine
    at n=64) whose coefficients are EXACT integers, which is what makes
    the sequency-domain features engine-portable."""
    global _WHT_SIGNS
    if _WHT_SIGNS is None:
        k = np.arange(SPECTRAL_FRAME)
        pop = np.array(
            [bin(a & b).count("1") for a in k for b in k], dtype=np.int64
        ).reshape(SPECTRAL_FRAME, SPECTRAL_FRAME)
        _WHT_SIGNS = np.where(pop % 2 == 0, 1, -1).astype(np.int64)
    return _WHT_SIGNS


def audio_spectral_batch(df: DataFrame) -> DataFrame:
    """(media_id, payload) → SPECTRAL features over the first
    SPECTRAL_FRAME decoded PCM samples (VERDICT r06 item 9), two
    transform families side by side:

    - Walsh-Hadamard (sequency domain): exact integer coefficients, so
      the derived features — absolute-magnitude sum, sequency-weighted
      sum (centroid numerator), dominant sequency (argmax, smallest-k
      tie-break), and 85% energy rolloff computed with the all-integer
      test ``100*cum >= 85*total`` — are bit-reproducible by any
      engine. The sequency centroid derives JVM-side as
      weighted_sum/abs_sum, so no float crosses the Arrow boundary.
    - Fourier (numpy rfft): true spectral centroid over the power
      spectrum Σ k·|X_k|² / Σ|X_k|², bins 1..N/2. Float by nature;
      rounded at 6 decimals the ~1e-13 cross-engine DFT error is ~1e-7
      per-value collision risk — the documented tolerance contract.

    numpy inside Arrow batches; clips shorter than the frame are
    zero-padded (the planted corpus is always longer)."""
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        signs = _wht_sign_matrix(np)
        nfr = SPECTRAL_FRAME
        ks = np.arange(1, nfr // 2 + 1, dtype=np.float64)
        for pdf in batches:
            cols = {k: [] for k in AUDIO_SPECTRAL_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                cols["media_id"].append(mid)
                decoded = decode_wav_pcm(payload)
                if decoded is None:
                    for k in AUDIO_SPECTRAL_SCHEMA.fieldNames()[1:]:
                        cols[k].append(None)
                    continue
                sr, ch, frames = decoded
                s = np.frombuffer(
                    frames[: len(frames) // 2 * 2], dtype="<i2"
                ).astype(np.int64)[:nfr]
                if len(s) < nfr:
                    s = np.pad(s, (0, nfr - len(s)))
                w = signs @ s  # exact int64
                absw = np.abs(w[1:])
                e = w[1:] * w[1:]
                tot = int(e.sum())
                cum = np.cumsum(e)
                roll = int(np.argmax(100 * cum >= 85 * tot)) + 1 if tot else 0
                x = np.fft.rfft(s.astype(np.float64))
                p = (x.real * x.real + x.imag * x.imag)[1 : nfr // 2 + 1]
                ptot = float(p.sum())
                cols["sample_rate"].append(sr)
                cols["wht_abs_sum"].append(int(absw.sum()))
                cols["wht_weighted_sum"].append(
                    int((np.arange(1, nfr, dtype=np.int64) * absw).sum())
                )
                cols["wht_dominant"].append(int(np.argmax(absw)) + 1)
                cols["wht_rolloff"].append(roll)
                cols["fft_centroid"].append(
                    float((ks * p).sum() / ptot) if ptot else None
                )
            yield pd.DataFrame(
                {
                    "media_id": cols["media_id"],
                    "sample_rate": pd.array(cols["sample_rate"], dtype="Int32"),
                    "wht_abs_sum": pd.array(cols["wht_abs_sum"], dtype="Int64"),
                    "wht_weighted_sum": pd.array(
                        cols["wht_weighted_sum"], dtype="Int64"
                    ),
                    "wht_dominant": pd.array(cols["wht_dominant"], dtype="Int64"),
                    "wht_rolloff": pd.array(cols["wht_rolloff"], dtype="Int64"),
                    "fft_centroid": pd.array(cols["fft_centroid"], dtype="float64"),
                }
            )

    return df.mapInPandas(fn, AUDIO_SPECTRAL_SCHEMA)


AUDIO_DUP_OFFSET = 1_000_000
AUDIO_DUP_EVERY = 4
AUDIO_DUP_PERT = 5


AUDIO_DUP_N = 250


def _noise_sample(v: int) -> int:
    """Deterministic noise sample in [-1024, 1024): the first 60 bits
    of md5(str(v)) mod 2048 — md5 is the one portable avalanche hash
    both engines share, and REAL audio entropy is what fingerprinting
    needs (the sawtooth family's Walsh spectrum is degenerate: sign
    hashes collide corpus-wide; measured before switching)."""
    import hashlib

    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16) % 2048 - 1024


def plant_audio_dup_corpus(df: DataFrame, id_col: str) -> DataFrame:
    """Near-duplicate AUDIO corpus of noise-like clips: sample i of
    clip ``bid`` is md5-noise of (bid*64 + i); every
    AUDIO_DUP_EVERY-th id gets a copy under id + AUDIO_DUP_OFFSET
    whose first ``id % 3 + 1`` samples shift by AUDIO_DUP_PERT — the
    re-mastered/re-encoded clip scenario. Integer arithmetic end to
    end, so the oracle replays the exact waveforms (and therefore the
    exact fingerprints — a full exactness proof, not just recall)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _gen(ids: pd.Series) -> pd.Series:
        import numpy as np

        def make(i: int) -> bytes:
            is_copy = i >= AUDIO_DUP_OFFSET
            bid = i - AUDIO_DUP_OFFSET if is_copy else i
            sr = 8000 + (bid % 4) * 2000
            s = np.array(
                [_noise_sample(bid * 64 + j) for j in range(AUDIO_DUP_N)],
                dtype=np.int64,
            )
            if is_copy:
                s[: bid % 3 + 1] += AUDIO_DUP_PERT
            return encode_wav(sr, AUDIO_DUP_N, pcm=s.astype("<i2").tobytes())

        return ids.map(lambda i: make(int(i)))

    ids = df.select(F.col(id_col).cast("long").alias("media_id"))
    copies = ids.filter(F.col("media_id") % AUDIO_DUP_EVERY == 0).select(
        (F.col("media_id") + AUDIO_DUP_OFFSET).alias("media_id")
    )
    corpus = _spread_ids(ids.unionByName(copies), "media_id")
    return corpus.select("media_id", _gen(F.col("media_id")).alias("payload"))


AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("h_hi", T.LongType(), True),
        T.StructField("h_lo", T.LongType(), True),
    ]
)


def audio_fingerprint_batch(df: DataFrame) -> DataFrame:
    """64-bit audio fingerprint from REAL PCM decode: bit k is the
    sign (> 0) of Walsh-Hadamard coefficient k over the first
    SPECTRAL_FRAME samples — a sequency-domain sign hash (the
    Haitsma-Kalker / Shazam family shape) whose EXACT integer
    coefficients make the whole signature oracle-reproducible, unlike
    float-spectrum hashes. Two non-negative 32-bit halves feed the
    same banded-Hamming near-dup join images use. Arrow batches,
    numpy matrix fold."""
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        signs = _wht_sign_matrix(np)
        nfr = SPECTRAL_FRAME
        for pdf in batches:
            ids, srs, his, los = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ids.append(mid)
                decoded = decode_wav_pcm(payload)
                if decoded is None:
                    srs.append(None); his.append(None); los.append(None)
                    continue
                sr, ch, frames = decoded
                s = np.frombuffer(
                    frames[: len(frames) // 2 * 2], dtype="<i2"
                ).astype(np.int64)[:nfr]
                if len(s) < nfr:
                    s = np.pad(s, (0, nfr - len(s)))
                w = signs @ s
                bits = (w > 0).astype(np.int64)
                hi = int((bits[:32] << np.arange(32, dtype=np.int64)).sum())
                lo = int((bits[32:] << np.arange(32, dtype=np.int64)).sum())
                srs.append(sr); his.append(hi); los.append(lo)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "sample_rate": pd.array(srs, dtype="Int32"),
                    "h_hi": pd.array(his, dtype="Int64"),
                    "h_lo": pd.array(los, dtype="Int64"),
                }
            )

    return df.mapInPandas(fn, AUDIO_FP_SCHEMA)


def audio_decimate_batch(df: DataFrame, *, factor: int = 2) -> DataFrame:
    """Audio TRANSCODE (binary -> binary, the write-back path): decode
    the PCM, decimate by averaging each ``factor``-sample block
    (truncating division — the semantics Spark's ``div`` and DuckDB's
    ``//`` share), and RE-ENCODE a real WAV at sample_rate/factor.
    Output (media_id, payload) feeds any downstream decode consumer —
    the full decode→transform→encode loop stays executor-side in Arrow
    batches; payload bytes never visit the driver."""
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ids.append(mid)
                decoded = decode_wav_pcm(payload)
                if decoded is None:
                    outs.append(None)
                    continue
                sr, ch, frames = decoded
                s = np.frombuffer(
                    frames[: len(frames) // 2 * 2], dtype="<i2"
                ).astype(np.int64)
                n2 = len(s) // factor
                blocks = s[: n2 * factor].reshape(n2, factor)
                dec = np.trunc(blocks.sum(axis=1) / factor).astype("<i2")
                outs.append(encode_wav(sr // factor, n2, pcm=dec.tobytes()))
            yield pd.DataFrame({"media_id": ids, "payload": outs})

    return df.mapInPandas(
        fn, "media_id long, payload binary"
    )


# --------------------------------------------------------------------------
# video: real ISO-BMFF sample tables + frame sampling
# --------------------------------------------------------------------------

FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.LongType(), True),
        T.StructField("byte_sum", T.LongType(), True),
        T.StructField("byte_mix", T.LongType(), True),
    ]
)


def video_frame_plan(bid: int) -> list[tuple[int, int]]:
    """Deterministic per-id frame layout [(size, seed)] — every frame
    byte is ``(j*29 + k*13 + bid*7) % 256`` for byte j of frame k, so
    an oracle can replay the exact mdat content arithmetically."""
    n_frames = bid % 6 + 4
    return [((bid + k * 7) % 96 + 32, k) for k in range(n_frames)]


def video_frame_bytes(bid: int, k: int, size: int) -> bytes:
    return bytes((j * 29 + k * 13 + bid * 7) % 256 for j in range(size))


def encode_mp4_frames(
    duration_ms: int,
    bid: int,
    *,
    timescale: int = 1000,
    frames: list | None = None,
) -> bytes:
    """ISO-BMFF stream WITH media samples: ftyp + moov carrying a real
    trak/mdia/minf/stbl hierarchy (stsd/stts/stsc/stsz/stco) + an mdat
    holding the frame payloads, chunk offset correctly resolved against
    the final moov size. Any BMFF-aware parser can walk the sample
    table and extract the frames. ``frames`` overrides the default
    id-derived frame plan (the keyframe corpus plants raster frames)."""
    if frames is None:
        frames = [
            video_frame_bytes(bid, k, size) for size, k in video_frame_plan(bid)
        ]
    dur = duration_ms * timescale // 1000
    mvhd = _mp4_box(
        b"mvhd",
        b"\x00\x00\x00\x00"
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, dur)
        + struct.pack(">I", 0x00010000)
        + struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )

    def moov_for(chunk_offset: int) -> bytes:
        stsd = _mp4_box(
            b"stsd",
            struct.pack(">II", 0, 1)
            + _mp4_box(b"mp4v", b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70),
        )
        stts = _mp4_box(
            b"stts",
            struct.pack(">II", 0, 1)
            + struct.pack(">II", len(frames), max(dur // max(len(frames), 1), 1)),
        )
        stsc = _mp4_box(b"stsc", struct.pack(">II", 0, 1) + struct.pack(">III", 1, len(frames), 1))
        stsz = _mp4_box(
            b"stsz",
            struct.pack(">III", 0, 0, len(frames))
            + b"".join(struct.pack(">I", len(f)) for f in frames),
        )
        stco = _mp4_box(b"stco", struct.pack(">II", 0, 1) + struct.pack(">I", chunk_offset))
        stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
        dinf = _mp4_box(
            b"dinf",
            _mp4_box(b"dref", struct.pack(">II", 0, 1) + _mp4_box(b"url ", b"\x00\x00\x00\x01")),
        )
        vmhd = _mp4_box(b"vmhd", b"\x00\x00\x00\x01" + b"\x00" * 8)
        minf = _mp4_box(b"minf", vmhd + dinf + stbl)
        mdhd = _mp4_box(
            b"mdhd",
            b"\x00" * 4 + struct.pack(">II", 0, 0) + struct.pack(">II", timescale, dur) + struct.pack(">HH", 0x55C4, 0),
        )
        hdlr = _mp4_box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12 + b"v\x00")
        mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
        tkhd = _mp4_box(
            b"tkhd",
            b"\x00\x00\x00\x07"
            + struct.pack(">II", 0, 0)
            + struct.pack(">I", 1)
            + b"\x00" * 4
            + struct.pack(">I", dur)
            + b"\x00" * 8
            + struct.pack(">HHHH", 0, 0, 0, 0)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", 0, 0),
        )
        trak = _mp4_box(b"trak", tkhd + mdia)
        return _mp4_box(b"moov", mvhd + trak)

    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    # moov length does not depend on the offset VALUE (fixed 4-byte
    # field) — resolve the mdat payload position in one rebuild
    probe = moov_for(0)
    offset = len(ftyp) + len(probe) + 8  # + mdat box header
    moov = moov_for(offset)
    mdat = _mp4_box(b"mdat", b"".join(frames))
    return ftyp + moov + mdat


def _child_box(b: bytes, start: int, end: int, tag: bytes):
    """(payload_start, payload_end) of the first child box with ``tag``
    inside [start, end), or None."""
    i = start
    while i + 8 <= end:
        size = struct.unpack(">I", b[i : i + 4])[0]
        if size < 8 or i + size > end:
            return None
        if b[i + 4 : i + 8] == tag:
            return i + 8, i + size
        i += size
    return None


def parse_mp4_frames(payload: bytes | None) -> list[bytes] | None:
    """Walk ftyp→moov→trak→mdia→minf→stbl, read stsz sample sizes and
    the stco chunk offset, and slice the frames out of mdat. Returns
    None when the payload lacks a sample table (e.g. the header-only
    stub form)."""
    if payload is None:
        return None
    b = bytes(payload)
    span = _child_box(b, 0, len(b), b"moov")
    if span is None:
        return None
    for hop in (b"trak", b"mdia", b"minf", b"stbl"):
        span = _child_box(b, span[0], span[1], hop)
        if span is None:
            return None
    stsz = _child_box(b, span[0], span[1], b"stsz")
    stco = _child_box(b, span[0], span[1], b"stco")
    if stsz is None or stco is None:
        return None
    s = stsz[0]
    uniform, count = struct.unpack(">II", b[s + 4 : s + 12])
    sizes = (
        [uniform] * count
        if uniform
        else [
            struct.unpack(">I", b[s + 12 + 4 * k : s + 16 + 4 * k])[0]
            for k in range(count)
        ]
    )
    off = struct.unpack(">I", b[stco[0] + 8 : stco[0] + 12])[0]
    frames = []
    for size in sizes:
        if off + size > len(b):
            return None
        frames.append(b[off : off + size])
        off += size
    return frames


def plant_video_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Video corpus as REAL ISO-BMFF files with sample tables and
    deterministic frame content (:func:`video_frame_plan`)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _gen(ids: pd.Series) -> pd.Series:
        return ids.map(
            lambda i: encode_mp4_frames((int(i) % 20 + 1) * 500, int(i))
        )

    ids = _spread_ids(
        df.select(F.col(id_col).cast("long").alias("media_id")), "media_id"
    )
    return ids.select("media_id", _gen(F.col("media_id")).alias("payload"))


VIDEO_DUP_OFFSET = 1_000_000
VIDEO_DUP_EVERY = 2


def plant_video_remux_corpus(df: DataFrame, id_col: str) -> DataFrame:
    """Re-mux duplicate corpus: base MP4s (timescale 1000) plus, for
    every VIDEO_DUP_EVERY-th id, the SAME media samples re-wrapped
    under id + VIDEO_DUP_OFFSET with a broadcast-grade 90 kHz
    timescale and different duration rounding — container bytes differ
    everywhere, mdat content is identical. The dedup scenario where
    one clip circulates through different packagers."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _gen(ids: pd.Series) -> pd.Series:
        def make(i: int) -> bytes:
            is_remux = i >= VIDEO_DUP_OFFSET
            bid = i - VIDEO_DUP_OFFSET if is_remux else i
            dur = (bid % 20 + 1) * 500
            if is_remux:
                return encode_mp4_frames(dur + 3, bid, timescale=90000)
            return encode_mp4_frames(dur, bid)

        return ids.map(lambda i: make(int(i)))

    ids = df.select(F.col(id_col).cast("long").alias("media_id"))
    copies = ids.filter(F.col("media_id") % VIDEO_DUP_EVERY == 0).select(
        (F.col("media_id") + VIDEO_DUP_OFFSET).alias("media_id")
    )
    corpus = _spread_ids(ids.unionByName(copies), "media_id")
    return corpus.select("media_id", _gen(F.col("media_id")).alias("payload"))


VIDEO_KEYFRAME_OFFSET = 2_000_000
VIDEO_KEYFRAME_EVERY = 3


def plant_video_keyframe_corpus(df: DataFrame, id_col: str) -> DataFrame:
    """Cross-modality near-dup corpus: for every
    ``VIDEO_KEYFRAME_EVERY``-th id, a REAL MP4 whose KEYFRAME (sample
    0) is the grayscale raster of image ``bid`` from the pHash corpus
    with ``bid % 3`` perturbed pixels (:func:`_phash_raster` — the
    same flip rule the image-copy plant uses), preceded by a ``>II``
    (width, height) header so a frame decoder knows the raster dims
    (a real codec carries dims intrinsically; the synthetic frame
    payload is raw). Filler frames reuse the standard id-derived frame
    bytes. media_id = bid + VIDEO_KEYFRAME_OFFSET (disjoint from the
    image corpus and its +1e6 copies).

    The scenario: stills extracted from (or re-used as) video frames —
    thumbnail/keyframe reuse across modalities."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _gen(ids: pd.Series) -> pd.Series:
        def make(mid: int) -> bytes:
            bid = mid - VIDEO_KEYFRAME_OFFSET
            w, h = bid % 48 + 16, (bid * 7) % 32 + 16
            key = struct.pack(">II", w, h) + _phash_raster(
                bid, w, h, bid % 3
            )
            filler = [
                video_frame_bytes(bid, k + 1, (bid + k * 7) % 96 + 32)
                for k in range(bid % 3 + 1)
            ]
            return encode_mp4_frames(
                (bid % 20 + 1) * 500, bid, frames=[key] + filler
            )

        return ids.map(lambda i: make(int(i)))

    ids = _spread_ids(
        df.filter(F.col(id_col) % VIDEO_KEYFRAME_EVERY == 0).select(
            (F.col(id_col).cast("long") + VIDEO_KEYFRAME_OFFSET).alias(
                "media_id"
            )
        ),
        "media_id",
    )
    return ids.select("media_id", _gen(F.col("media_id")).alias("payload"))


def video_keyframe_phash_batch(df: DataFrame) -> DataFrame:
    """(media_id, payload) MP4s → pHash of the KEYFRAME (sample 0):
    walk the real sample table, slice frame 0 out of mdat, read the
    ``>II`` dims header, dHash the raster — the video-side half of the
    cross-modality near-dup join (the image side is
    :func:`phash_batch`). Arrow-batched; NULL row when the payload has
    no sample table or the keyframe is not a dimensioned raster."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, his, los = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ids.append(mid)
                frames = parse_mp4_frames(payload)
                ok = False
                if frames:
                    key = frames[0]
                    if len(key) >= 8:
                        w, h = struct.unpack(">II", key[:8])
                        if len(key) == 8 + w * h and w >= 9 and h >= 8:
                            hi, lo = dhash64(key[8:], w, h)
                            ws.append(w); hs.append(h)
                            his.append(hi); los.append(lo)
                            ok = True
                if not ok:
                    ws.append(None); hs.append(None)
                    his.append(None); los.append(None)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": pd.array(ws, dtype="Int64"),
                    "height": pd.array(hs, dtype="Int64"),
                    "h_hi": pd.array(his, dtype="Int64"),
                    "h_lo": pd.array(los, dtype="Int64"),
                }
            )

    return df.mapInPandas(fn, PHASH_SCHEMA)


def cross_phash_hamming_pairs(
    left: DataFrame,
    right: DataFrame,
    *,
    max_distance: int = 3,
    left_id: str = "id_a",
    right_id: str = "id_b",
) -> DataFrame:
    """Banded-Hamming join BETWEEN two hash sets (the cross-modality
    form of :func:`phash_hamming_pairs` — image hashes vs video
    keyframe hashes): split each 64-bit hash into four 16-bit bands;
    by pigeonhole any pair within Hamming distance ``max_distance``
    (<= 3) agrees on at least one band, so an equi-join on
    (band, value) finds EVERY such pair while comparing only within
    buckets — linear candidate generation, never a cross join. A pair
    agreeing on several bands surfaces once per band with the same
    hamming → dropDuplicates on the id pair.

    ``left``/``right``: (media_id, h_hi, h_lo). Output:
    (left_id, right_id, hamming)."""
    if max_distance > 3:
        raise ValueError(
            "4 bands of a 64-bit hash are pigeonhole-complete only for "
            f"max_distance <= 3, got {max_distance}"
        )

    def banded(h: DataFrame, idc: str) -> DataFrame:
        mask = F.lit(0xFFFF)
        bandvals = [
            F.shiftrightunsigned(F.col("h_hi"), 16).bitwiseAND(mask),
            F.col("h_hi").bitwiseAND(mask),
            F.shiftrightunsigned(F.col("h_lo"), 16).bitwiseAND(mask),
            F.col("h_lo").bitwiseAND(mask),
        ]
        return h.filter(
            F.col("h_hi").isNotNull() & F.col("h_lo").isNotNull()
        ).select(
            F.col("media_id").alias(idc),
            F.struct("h_hi", "h_lo").alias(f"__ph_{idc}"),
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(b).alias("band"), v.alias("key"))
                        for b, v in enumerate(bandvals)
                    ]
                )
            ).alias("bk"),
        ).select(
            idc,
            f"__ph_{idc}",
            F.col("bk.band").alias("band"),
            F.col("bk.key").alias("key"),
        )

    la, rb = banded(left, left_id), banded(right, right_id)
    ham = (
        F.bit_count(
            F.col(f"__ph_{left_id}.h_hi").bitwiseXOR(
                F.col(f"__ph_{right_id}.h_hi")
            )
        )
        + F.bit_count(
            F.col(f"__ph_{left_id}.h_lo").bitwiseXOR(
                F.col(f"__ph_{right_id}.h_lo")
            )
        )
    ).cast("long")
    return (
        la.join(rb, ["band", "key"])
        .select(left_id, right_id, ham.alias("hamming"))
        .filter(F.col("hamming") <= max_distance)
        .dropDuplicates([left_id, right_id])
    )


VIDEO_SIG_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("sig", T.LongType(), True),
    ]
)


def video_content_signature_batch(df: DataFrame) -> DataFrame:
    """CONTENT signature per video, independent of the container: walk
    the real sample table, fold every frame's (size, byte-mix
    checksum) in frame order into one 31-bit chain — identical for any
    re-mux of the same media samples, different as soon as one frame
    byte differs. Integer arithmetic end to end (oracle-replayable).
    Arrow batches."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nfs, sigs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = parse_mp4_frames(payload)
                ids.append(mid)
                if frames is None:
                    nfs.append(None)
                    sigs.append(None)
                    continue
                sig = 0
                for fr in frames:
                    acc = 0
                    for byte in fr:
                        acc = (acc * 31 + byte) % 2147483648
                    sig = (sig * 31 + len(fr)) % 2147483648
                    sig = (sig * 31 + acc) % 2147483648
                nfs.append(len(frames))
                sigs.append(sig)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_frames": pd.array(nfs, dtype="Int64"),
                    "sig": pd.array(sigs, dtype="Int64"),
                }
            )

    return df.mapInPandas(fn, VIDEO_SIG_SCHEMA)


def video_frame_stats_batch(df: DataFrame, *, every: int = 2) -> DataFrame:
    """Frame-sample + per-frame feature stats: parse the BMFF sample
    table, keep every ``every``-th frame (temporal subsampling BEFORE
    any per-frame work — the 100 TB pattern: decode cost scales with
    kept frames, not stored frames), and emit per-frame size, byte sum
    and an order-sensitive mix checksum
    (``acc = (acc*31 + byte) mod 2^31``)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, sums, mixes = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = parse_mp4_frames(payload)
                if frames is None:
                    continue
                for k in range(0, len(frames), every):
                    fr = frames[k]
                    acc = 0
                    for byte in fr:
                        acc = (acc * 31 + byte) % 2147483648
                    ids.append(mid)
                    idxs.append(k)
                    sizes.append(len(fr))
                    sums.append(sum(fr))
                    mixes.append(acc)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": pd.array(idxs, dtype="Int32"),
                    "frame_bytes": pd.array(sizes, dtype="Int64"),
                    "byte_sum": pd.array(sums, dtype="Int64"),
                    "byte_mix": pd.array(mixes, dtype="Int64"),
                }
            )

    return df.mapInPandas(fn, FRAME_STATS_SCHEMA)


# --------------------------------------------------------------------------
# image resize (nearest-neighbor over true decoded rasters)
# --------------------------------------------------------------------------

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("pix_sum", T.LongType(), True),
        T.StructField("pix_mix", T.LongType(), True),
    ]
)


def resize_raster(
    pix: bytes, w: int, h: int, out_w: int, out_h: int
) -> bytes:
    """Nearest-neighbor resize of a row-major grayscale raster —
    integer source sampling (``x_src = x*w//out_w``) so an
    engine-independent oracle can reproduce every output pixel."""
    return bytes(
        pix[(y * h // out_h) * w + (x * w // out_w)]
        for y in range(out_h)
        for x in range(out_w)
    )


def plant_raster_corpus(df: DataFrame, id_col: str) -> DataFrame:
    """Unperturbed real-PNG raster corpus (the plant_phash_corpus base
    formula without copies): dims and every pixel arithmetic in the id."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _gen(ids: pd.Series) -> pd.Series:
        def make(i: int) -> bytes:
            w, h = i % 48 + 16, (i * 7) % 32 + 16
            return encode_png_gray(w, h, _phash_raster(i, w, h, 0))

        return ids.map(lambda i: make(int(i)))

    ids = _spread_ids(
        df.select(F.col(id_col).cast("long").alias("media_id")), "media_id"
    )
    return ids.select("media_id", _gen(F.col("media_id")).alias("payload"))


def resize_batch(df: DataFrame, *, out_w: int = 16, out_h: int = 12) -> DataFrame:
    """(media_id, payload) → thumbnail stats via TRUE decode + resize:
    decode_raster (PNG inflate+unfilter or baseline-JPEG Huffman+IDCT),
    nearest-neighbor downsample, then the thumbnail's exact pixel sum
    and order-sensitive mix checksum (``acc = (acc*31 + p) mod 2^31``)
    — pinning the full decode→resize path byte-for-byte."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, sums, mixes = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ids.append(mid)
                decoded = decode_raster(payload)
                if decoded is None:
                    ws.append(None); hs.append(None)
                    sums.append(None); mixes.append(None)
                    continue
                w, h, pix = decoded
                thumb = resize_raster(pix, w, h, out_w, out_h)
                acc = 0
                for p in thumb:
                    acc = (acc * 31 + p) % 2147483648
                ws.append(w); hs.append(h)
                sums.append(sum(thumb)); mixes.append(acc)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "pix_sum": pd.array(sums, dtype="Int64"),
                    "pix_mix": pd.array(mixes, dtype="Int64"),
                }
            )

    return df.mapInPandas(fn, RESIZE_SCHEMA)
