"""Bucketing: pre-shuffled storage layout so later equi-joins on the
bucket key co-locate WITHOUT an exchange — the storage-level half of
shuffle elimination at 100 TB (the query-level half is broadcast)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pyspark_data_processing_challenge_spark import plans
from tests.conftest import SF_DIR


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .option("path", str(tmp_path / "orders_b"))
        .saveAsTable("bktest.orders_b")
    )
    (
        customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .option("path", str(tmp_path / "customer_b"))
        .saveAsTable("bktest.customer_b")
    )
    yield "bktest.orders_b", "bktest.customer_b"
    spark.sql("DROP TABLE IF EXISTS bktest.orders_b")
    spark.sql("DROP TABLE IF EXISTS bktest.customer_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ot, ct = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(ot)
            .join(spark.table(ct), F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = plans.executed_plan(joined)
        # sort-merge join reads both sides bucket-aligned: the ONLY
        # exchange left is the final small groupBy, not the join
        assert "SortMergeJoin" in plan
        join_part = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange hashpartitioning" not in join_part
        # and the result is still correct
        total = sum(r["n"] for r in joined.collect())
        assert total == spark.table(ot).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
