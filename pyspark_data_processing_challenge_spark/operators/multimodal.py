"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star extension (SURVEY.md §7.4). Images/audio/video ride through
the engine as ``binary`` columns with a struct of metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over ``mapInPandas`` so the heavy per-item work happens
executor-side in columnar batches, never row-at-a-time.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
``decode_image_batch`` ships a deterministic stub behind
``codec="stub"`` and raises ``NotImplementedError`` for real codecs —
the Spark-side plumbing (schema, batch iteration, partition-size
control) is real and tested.
"""

from __future__ import annotations

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
    """
    if codec != "stub":
        raise NotImplementedError(
            f"codec {codec!r} needs an image library not present in this "
            "container; only the deterministic 'stub' codec is available"
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
