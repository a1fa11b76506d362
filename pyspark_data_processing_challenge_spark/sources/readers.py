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


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema_conf,
    *,
    mode: str = "PERMISSIVE",
    corrupt_col: str = "_corrupt_record",
    options: Mapping[str, Any] | None = None,
) -> DataFrame:
    """Schema-declared JSONL scan with an explicit malformed-record
    policy — the ingest decision every semi-structured source forces:

    - ``PERMISSIVE``: bad lines yield nulls + the raw line in
      ``corrupt_col`` (quarantine-able, the default);
    - ``DROPMALFORMED``: bad lines silently dropped;
    - ``FAILFAST``: the first bad line fails the job.

    The corrupt column is appended to the declared schema here (Spark
    only populates it when the schema contains it). Explicit schema ⇒
    no inference scan; the JSON reader is a DSv2 file scan, so pruning
    and pushdown still apply to well-formed columns.
    """
    mode = mode.upper()
    if mode not in {"PERMISSIVE", "DROPMALFORMED", "FAILFAST"}:
        raise ValueError(f"unknown JSON mode: {mode!r}")
    schema = build_schema(schema_conf)
    if mode == "PERMISSIVE":
        from pyspark.sql import types as T

        schema = schema.add(T.StructField(corrupt_col, T.StringType(), True))
    reader = (
        spark.read.format("json")
        .schema(schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    for k, v in (options or {}).items():
        reader = reader.option(k, str(v))
    return reader.load(path)


def quarantine_corrupt(
    df: DataFrame, corrupt_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE read into (clean, quarantine): clean rows with
    the corrupt column dropped, and the raw offending lines for a
    dead-letter sink. The frame is cached first — Spark refuses to
    filter on ONLY the corrupt column of an unmaterialized JSON scan
    (internal-corrupt-record restriction), and the cache also keeps the
    two writes to one parse of the input.
    """
    df = df.cache()
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantined = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return clean, quarantined


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load the driver's synthetic parquet tables from ``sf_dir``."""
    return {name: spark.read.parquet(f"{sf_dir}/{name}.parquet") for name in names}
