"""CDC/merge queries: MERGE-INTO upsert and SCD2 history, emulated on
plain DataFrames (operators/cdc.py) and pinned by SQL oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import cdc
from ._util import t

# deterministic synthetic change set, derived from the data itself:
# orders with key < CHANGED get a price bump + status flip; keys shifted
# by NEW_OFFSET become inserts
CHANGED_BELOW = 100
NEW_OFFSET = 10_000_000
PRICE_BUMP = 1000.0


def _order_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    updates = o.filter(F.col("o_orderkey") < CHANGED_BELOW).select(
        "o_orderkey",
        "o_custkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") + F.lit(PRICE_BUMP)).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    inserts = o.filter(F.col("o_orderkey") < 50).select(
        (F.col("o_orderkey") + F.lit(NEW_OFFSET)).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    return updates.unionByName(inserts)


def cdc_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation: upsert the change set into orders; project
    a stable subset for comparison."""
    target = t(spark, sf_dir, "orders")
    merged = cdc.merge_upsert(target, _order_changes(spark, sf_dir), ["o_orderkey"])
    return merged.select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


SCD2_V1, SCD2_V2 = 10, 20
SCD2_OPEN = 999_999


def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2: customer acctbal history after two change batches — keys
    < 50 change at version 10, keys < 20 change again at version 20.
    Every key's versions chain (valid_from, valid_to], open rows carry
    the sentinel."""
    c = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", F.lit(0).alias("valid_from")
    )
    ch1 = c.filter(F.col("c_custkey") < 50).select(
        "c_custkey",
        (F.col("c_acctbal") + F.lit(500.0)).alias("c_acctbal"),
        F.lit(SCD2_V1).alias("version"),
    )
    ch2 = c.filter(F.col("c_custkey") < 20).select(
        "c_custkey",
        (F.col("c_acctbal") + F.lit(700.0)).alias("c_acctbal"),
        F.lit(SCD2_V2).alias("version"),
    )
    dim = c.withColumn("valid_to", F.lit(None).cast("int"))
    hist = cdc.scd2_apply(
        dim,
        ch1.unionByName(ch2),
        key="c_custkey",
        version_col="version",
        open_sentinel=SCD2_OPEN,
    )
    return hist.select("c_custkey", "c_acctbal", "valid_from", "valid_to")


QUERIES = {
    "cdc_merge_orders": cdc_merge_orders,
    "scd2_customer_history": scd2_customer_history,
}

ORACLES = {
    "cdc_merge_orders": f"""
        WITH updates AS (
          SELECT o_orderkey, 'X' AS o_orderstatus,
                 o_totalprice + {PRICE_BUMP} AS o_totalprice
          FROM orders WHERE o_orderkey < {CHANGED_BELOW}
        ), inserts AS (
          SELECT o_orderkey + {NEW_OFFSET} AS o_orderkey,
                 'N' AS o_orderstatus, o_totalprice
          FROM orders WHERE o_orderkey < 50
        ), source AS (
          SELECT * FROM updates UNION ALL SELECT * FROM inserts
        )
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM source)
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM source
    """,
    "scd2_customer_history": f"""
        WITH versions AS (
          SELECT c_custkey, c_acctbal, 0 AS valid_from FROM customer
          UNION ALL
          SELECT c_custkey, c_acctbal + 500.0, {SCD2_V1} FROM customer
          WHERE c_custkey < 50
          UNION ALL
          SELECT c_custkey, c_acctbal + 700.0, {SCD2_V2} FROM customer
          WHERE c_custkey < 20
        )
        SELECT c_custkey, c_acctbal, valid_from,
          coalesce(lead(valid_from) OVER (PARTITION BY c_custkey
                                          ORDER BY valid_from),
                   {SCD2_OPEN}) AS valid_to
        FROM versions
    """,
}
