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

Full pixel decode (``codec="jpeg"`` etc.) still raises
``NotImplementedError`` — raster decoding needs an image library.
``encode_png``/``encode_jpeg``/``encode_gif`` generate real payloads
(valid PNG incl. CRCs and zlib IDAT; JPEG/GIF structurally valid with
stub entropy data) so tests and oracle queries can plant media with
known dimensions.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
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


def encode_png(width: int, height: int) -> bytes:
    """A fully valid 8-bit grayscale PNG (correct CRCs, zlib IDAT) with
    a deterministic gradient raster — decodable by any PNG library."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes((x * 31 + y * 17) % 256 for x in range(width))
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


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


def encode_gif(width: int, height: int) -> bytes:
    """Minimal GIF89a: header + logical screen descriptor + trailer."""
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00" + b"\x3b"


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
    sample_rate: int, n_samples: int, *, channels: int = 1, bits: int = 16
) -> bytes:
    """RIFF/WAVE PCM header (spec-conformant fmt and data chunks) with
    stub sample data: the data chunk declares the true size but carries
    at most 64 bytes — enough for any header parser, not for playback
    (same stance as the JPEG entropy stub)."""
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
    data_chunk = b"data" + struct.pack("<I", data_size) + b"\x00" * min(data_size, 64)
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
    ``HEADER_SCHEMA``; ``codec="stub"`` returns ``DECODED_SCHEMA`` with
    length-derived fake dims. Full raster decode raises — it needs an
    image library not present in this container.
    """
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
            f"codec {codec!r} needs an image library not present in this "
            "container; 'headers' (real PNG/JPEG/GIF header parse) and "
            "'stub' are available"
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
