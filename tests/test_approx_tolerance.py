"""Tolerance checks for the approximate aggregates (no bit-exact oracle
exists for sketches; correctness is a bounded-error contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_data_processing_challenge_spark.queries.extended import (
    approx_distinct_stats,
)
from tests.conftest import SF01_DIR


def test_approx_within_tolerance(spark):
    got = {
        r["l_returnflag"]: r for r in approx_distinct_stats(spark, SF01_DIR).collect()
    }
    li = spark.read.parquet(f"{SF01_DIR}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.percentile("l_extendedprice", 0.5).alias("median"),
        )
        .collect()
    }
    for flag, e in exact.items():
        g = got[flag]
        # HLL++ default rsd = 5%
        assert abs(g["approx_parts"] - e["parts"]) <= 0.1 * e["parts"]
        # percentile_approx default accuracy: generous 5% relative bound
        assert abs(g["approx_median_price"] - e["median"]) <= 0.05 * e["median"]
