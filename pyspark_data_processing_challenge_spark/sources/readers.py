"""Batch sources: schema-declared file scans + lineage.

Generalizes the reference's CSV-only reader
(reference: data_process.py:48-89) to csv/parquet/json/orc/text with
the same config-driven shape, and fixes its lineage quirk: the
reference's ``filename`` column holds a URL-encoded basename because
``input_file_name()`` returns a URI (reference: data_process.py:82-83;
SURVEY.md §2.1 S3). Here decoding is explicit and default-on.

Scale notes: the explicit schema avoids an inference pass over the
input (at 100 TB an inference pass is a full extra scan); all readers
are DSv2 file scans, so Catalyst pushes filters/column pruning into
them — keep ``select``/``filter`` early in downstream plans so
``.explain`` shows PushedFilters / narrow ReadSchema.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import build_schema

_FORMATS = {"csv", "parquet", "json", "orc", "text"}

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, conf: Mapping[str, Any]) -> DataFrame:
    """Config-driven scan.

    conf keys: ``path`` (str), ``format`` (default parquet), ``options``
    (dict), ``schema`` (list of {name,type,nullable} — required for csv/
    json unless options.inferSchema), ``lineage_col`` (str | None —
    adds a decoded source-basename column).
    """
    fmt = str(conf.get("format", "parquet")).lower()
    if fmt not in _FORMATS:
        raise ValueError(f"Unsupported source format: {fmt!r}")
    reader = spark.read.format(fmt)
    options = dict(conf.get("options") or {})
    if options:
        reader = reader.options(**{k: str(v) for k, v in options.items()})
    if conf.get("schema"):
        reader = reader.schema(build_schema(conf["schema"]))
    df = reader.load(str(conf["path"]))
    lineage = conf.get("lineage_col")
    if lineage:
        df = add_lineage(df, str(lineage), url_decode=bool(conf.get("url_decode", True)))
    return df


def add_lineage(df: DataFrame, col_name: str = "filename", *, url_decode: bool = True) -> DataFrame:
    """Source-file basename column, evaluated at scan time per task.

    ``input_file_name()`` yields a URI; the reference kept the encoded
    last segment (``%20`` for spaces). ``url_decode=True`` restores raw
    names; pass False for bug-compatible reference behavior.
    """
    base = F.regexp_extract(F.input_file_name(), r"[^/]+$", 0)
    if url_decode:
        base = F.url_decode(base)
    return df.withColumn(col_name, base)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load the driver's synthetic parquet tables from ``sf_dir``."""
    return {name: spark.read.parquet(f"{sf_dir}/{name}.parquet") for name in names}
