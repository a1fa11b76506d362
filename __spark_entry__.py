"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's full transform
chain re-expressed on lineitem — SURVEY.md §7.2) at sf0.001.
``queries()``/``oracle_sql()`` expose the full operator catalog from
``pyspark_data_processing_challenge_spark.queries`` — every entry has a
DuckDB oracle (including MinHash/SimHash/LSH, whose hashes are
engine-portable by construction).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark_data_processing_challenge_spark.queries import (  # noqa: E402
    all_oracles,
    all_queries,
)
from pyspark_data_processing_challenge_spark.queries.reference import (  # noqa: E402
    ref_flagship_pipeline,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return ref_flagship_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + north-star
    extensions. Each callable takes (spark, sf_dir) → DataFrame."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every query (same column names/values)."""
    return all_oracles()
