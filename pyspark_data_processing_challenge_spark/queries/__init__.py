"""Query catalog: every operator exposed as (spark_fn, oracle_sql) pairs.

Each submodule defines ``QUERIES`` (name → fn(spark, sf_dir) → DataFrame)
and ``ORACLES`` (name → ANSI/DuckDB SQL over the driver's pre-registered
views). The driver hash-compares both at sf0.01 (BASELINE.json's t2
gate); ``bench.py`` times a headline subset at sf0.1.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import cdcq, extended, llm, reference, relational

_MODULES = (reference, relational, llm, extended, cdcq)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {sorted(overlap)}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    unknown = out.keys() - all_queries().keys()
    if unknown:
        raise ValueError(f"oracles without queries: {sorted(unknown)}")
    return out
