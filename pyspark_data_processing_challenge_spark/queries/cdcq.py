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


DELETED_LO, DELETED_HI = 100, 200


def _order_changes_with_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The upsert change set plus an op column and a delete batch
    (keys in [DELETED_LO, DELETED_HI))."""
    o = t(spark, sf_dir, "orders")
    base = _order_changes(spark, sf_dir)
    tagged = base.withColumn(
        "op",
        F.when(F.col("o_orderkey") >= NEW_OFFSET, F.lit("I")).otherwise(F.lit("U")),
    )
    deletes = (
        o.filter(
            (F.col("o_orderkey") >= DELETED_LO) & (F.col("o_orderkey") < DELETED_HI)
        )
        .select(*base.columns)
        .withColumn("op", F.lit("D"))
    )
    return tagged.unionByName(deletes)


def cdc_merge_delete_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MERGE semantics including the delete arm: updates, inserts
    AND deletes applied in one pass (operators/cdc.merge_apply)."""
    target = t(spark, sf_dir, "orders")
    merged = cdc.merge_apply(
        target, _order_changes_with_ops(spark, sf_dir), ["o_orderkey"]
    )
    return merged.select("o_orderkey", "o_orderstatus", "o_totalprice")


LOG_U1_MOD, LOG_U2_MOD, LOG_DEL_MOD = 7, 13, 11
LOG_U1_BUMP, LOG_U2_BUMP = 100.0, 250.0


def cdc_changelog_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log compaction: a four-version CDC changelog over orders (insert
    everything at v0, price-bump updates at v1 for keys % 7 = 0 and v2
    for keys % 13 = 0, deletes at v3 for keys % 11 = 0) folds back into
    the current snapshot with ``cdc.changelog_compact`` — one map-side-
    combinable ``max_by`` aggregation, last writer wins, latest-op-D
    keys gone. The oracle states the fixed point directly (what each
    key's final row must be), so the hash check proves the replay
    converges to the right table, not merely that it is internally
    consistent."""
    out = cdc.changelog_compact(_order_log(spark, sf_dir), ["o_orderkey"])
    return out.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("version").cast("long").alias("last_version"),
    )


def _order_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four-version synthetic changelog over orders (shared by the
    batch compaction query and the streaming CDC-apply twin)."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v0 = o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.lit(0).alias("version"),
        F.lit("I").alias("op"),
    )
    v1 = o.filter(F.col("o_orderkey") % LOG_U1_MOD == 0).select(
        "o_orderkey",
        F.lit("U1").alias("o_orderstatus"),
        (F.col("o_totalprice") + F.lit(LOG_U1_BUMP)).alias("o_totalprice"),
        F.lit(1).alias("version"),
        F.lit("U").alias("op"),
    )
    v2 = o.filter(F.col("o_orderkey") % LOG_U2_MOD == 0).select(
        "o_orderkey",
        F.lit("U2").alias("o_orderstatus"),
        (F.col("o_totalprice") + F.lit(LOG_U2_BUMP)).alias("o_totalprice"),
        F.lit(2).alias("version"),
        F.lit("U").alias("op"),
    )
    v3 = o.filter(F.col("o_orderkey") % LOG_DEL_MOD == 0).select(
        "o_orderkey",
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit(3).alias("version"),
        F.lit("D").alias("op"),
    )
    return v0.unionByName(v1).unionByName(v2).unionByName(v3)


_CHANGELOG_SQL = f"""
SELECT o_orderkey,
  CASE WHEN o_orderkey % {LOG_U2_MOD} = 0 THEN 'U2'
       WHEN o_orderkey % {LOG_U1_MOD} = 0 THEN 'U1'
       ELSE o_orderstatus END AS o_orderstatus,
  CASE WHEN o_orderkey % {LOG_U2_MOD} = 0 THEN o_totalprice + {LOG_U2_BUMP}
       WHEN o_orderkey % {LOG_U1_MOD} = 0 THEN o_totalprice + {LOG_U1_BUMP}
       ELSE o_totalprice END AS o_totalprice,
  (CASE WHEN o_orderkey % {LOG_U2_MOD} = 0 THEN 2
        WHEN o_orderkey % {LOG_U1_MOD} = 0 THEN 1
        ELSE 0 END)::BIGINT AS last_version
FROM orders WHERE o_orderkey % {LOG_DEL_MOD} <> 0
"""


def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot CDC: diff the original orders against the
    merged-with-deletes version and emit one (key, op) row per change —
    I for inserts, U for updates, D for deletes; unchanged keys silent.
    Round-trips the merge: the diff recovers exactly the change set."""
    old = t(spark, sf_dir, "orders")
    new = cdc.merge_apply(
        old, _order_changes_with_ops(spark, sf_dir), ["o_orderkey"]
    )
    return cdc.snapshot_diff(
        old, new, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
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


IVM_MOD = 8


def ivm_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: a per-day revenue materialization
    kept current by merging DELTA partials instead of re-scanning the
    base table. The store holds partial aggregates for 7/8 of orders;
    the new batch (o_orderkey % 8 == 0 — every day overlaps) aggregates
    alone and re-aggregates WITH the store partials. Because the agg is
    distributive over exact DECIMAL sums, merged == full recompute —
    pinned per cell by the full-outer compare the output's
    ``ivm_lossless`` flag carries. This is the 100 TB reporting
    pattern: a dashboard's daily rollup absorbs each ingest batch at
    O(batch + affected days), never O(history)."""
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderdate").alias("day"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("dv"),
        "o_orderkey",
    )

    def part(df: DataFrame) -> DataFrame:
        return df.groupBy("day").agg(
            F.count(F.lit(1)).alias("n"), F.sum("dv").alias("rev")
        )

    store = part(o.filter(F.col("o_orderkey") % IVM_MOD != 0))
    delta = part(o.filter(F.col("o_orderkey") % IVM_MOD == 0))
    merged = (
        store.unionByName(delta)
        .groupBy("day")
        .agg(F.sum("n").cast("long").alias("n_orders"), F.sum("rev").alias("rev"))
    )
    direct = part(o).select(
        "day",
        F.col("n").cast("long").alias("dn"),
        F.col("rev").alias("drev"),
    )
    lossless = merged.join(direct, "day", "full_outer").agg(
        F.bool_and(
            F.coalesce(
                (F.col("n_orders") == F.col("dn"))
                & (F.col("rev") == F.col("drev")),
                F.lit(False),
            )
        ).alias("ivm_lossless")
    )
    return merged.crossJoin(F.broadcast(lossless)).select(
        "day",
        "n_orders",
        F.col("rev").cast("double").alias("revenue"),
        "ivm_lossless",
    )


_IVM_SQL = """
SELECT o_orderdate AS day, count(*)::BIGINT AS n_orders,
       sum(o_totalprice::DECIMAL(12,2))::DOUBLE AS revenue,
       true AS ivm_lossless
FROM orders GROUP BY 1
"""




MERKLE_BUCKETS = 64


def snapshot_merkle_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERKLE-STYLE snapshot reconciliation — the anti-entropy
    primitive that finds WHICH partitions of a 100 TB replica drifted
    without comparing rows: every row folds to a 60-bit token (md5 of
    a canonical projection; decimal/date casts pin the string forms
    cross-engine), each of {buckets} buckets keeps the XOR of its
    tokens plus a count, and only buckets whose (xor, count) disagree
    between the two snapshots need row-level repair. XOR is
    order-independent and mergeable, so bucket digests compose from
    per-partition partials — one scan per snapshot, one tiny digest
    join, repair cost proportional to the DRIFT, not the data.

    Snapshot B is A with planted drift: rows deleted where
    o_orderkey % 991 = 0 and prices bumped where o_orderkey % 997 = 0.
    """
    canon = lambda: F.concat_ws(  # noqa: E731
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string"),
        F.col("o_orderdate").cast("date").cast("string"),
    )
    tok = F.conv(F.substring(F.md5(canon()), 1, 15), 16, 10).cast("long")
    o = t(spark, sf_dir, "orders")
    snap_a = o
    snap_b = o.filter(F.col("o_orderkey") % 991 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 997 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )

    def digest(df: DataFrame, xn: str, cn: str) -> DataFrame:
        return (
            df.select(
                (F.col("o_custkey") % MERKLE_BUCKETS).alias("bucket"),
                tok.alias("__tok"),
            )
            .groupBy("bucket")
            .agg(
                F.expr("bit_xor(__tok)").alias(xn),
                F.count(F.lit(1)).alias(cn),
            )
        )

    da = digest(snap_a, "xor_a", "n_a")
    db = digest(snap_b, "xor_b", "n_b")
    return (
        da.join(db, "bucket", "full_outer")
        .filter(
            (~F.col("xor_a").eqNullSafe(F.col("xor_b")))
            | (~F.col("n_a").eqNullSafe(F.col("n_b")))
        )
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            "n_a",
            "n_b",
            "xor_a",
            "xor_b",
        )
    )


_MERKLE_HEX = (
    "list_reduce(list_prepend(0::BIGINT, "
    "list_transform(string_split(substring(md5({expr}), 1, 15), ''), "
    "c -> (strpos('0123456789abcdef', c) - 1)::BIGINT)), "
    "(a, b) -> a * 16 + b)"
)

_MERKLE_CANON = (
    "o_orderkey::VARCHAR || '|' || o_custkey::VARCHAR || '|' || "
    "o_orderstatus || '|' || (o_totalprice::DECIMAL(12,2))::VARCHAR || "
    "'|' || (o_orderdate::DATE)::VARCHAR"
)

_MERKLE_SQL = f"""
WITH a AS (
  SELECT o_custkey % {MERKLE_BUCKETS} AS bucket,
         {_MERKLE_HEX.format(expr=_MERKLE_CANON)} AS tok
  FROM orders
),
bsrc AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % 997 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderdate
  FROM orders WHERE o_orderkey % 991 <> 0
),
b AS (
  SELECT o_custkey % {MERKLE_BUCKETS} AS bucket,
         {_MERKLE_HEX.format(expr=_MERKLE_CANON)} AS tok
  FROM bsrc
),
da AS (SELECT bucket, bit_xor(tok)::BIGINT AS xor_a, count(*)::BIGINT AS n_a
       FROM a GROUP BY bucket),
db AS (SELECT bucket, bit_xor(tok)::BIGINT AS xor_b, count(*)::BIGINT AS n_b
       FROM b GROUP BY bucket)
SELECT bucket::BIGINT AS bucket, n_a, n_b, xor_a, xor_b
FROM da FULL OUTER JOIN db USING (bucket)
WHERE xor_a IS DISTINCT FROM xor_b OR n_a IS DISTINCT FROM n_b
"""


QUERIES = {
    "snapshot_merkle_diff": snapshot_merkle_diff,
    "cdc_changelog_compact": cdc_changelog_compact,
    "cdc_merge_orders": cdc_merge_orders,
    "ivm_daily_revenue": ivm_daily_revenue,
    "scd2_customer_history": scd2_customer_history,
    "cdc_merge_delete_orders": cdc_merge_delete_orders,
    "snapshot_diff_orders": snapshot_diff_orders,
}

ORACLES = {
    "snapshot_merkle_diff": _MERKLE_SQL,
    "cdc_changelog_compact": _CHANGELOG_SQL,
    "ivm_daily_revenue": _IVM_SQL,
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
    "cdc_merge_delete_orders": f"""
        WITH source_keys AS (
          SELECT o_orderkey FROM orders WHERE o_orderkey < {CHANGED_BELOW}
          UNION ALL
          SELECT o_orderkey + {NEW_OFFSET} FROM orders WHERE o_orderkey < 50
          UNION ALL
          SELECT o_orderkey FROM orders
          WHERE o_orderkey >= {DELETED_LO} AND o_orderkey < {DELETED_HI}
        ), upserts AS (
          SELECT o_orderkey, 'X' AS o_orderstatus,
                 o_totalprice + {PRICE_BUMP} AS o_totalprice
          FROM orders WHERE o_orderkey < {CHANGED_BELOW}
          UNION ALL
          SELECT o_orderkey + {NEW_OFFSET}, 'N', o_totalprice
          FROM orders WHERE o_orderkey < 50
        )
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM source_keys)
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM upserts
    """,
    "snapshot_diff_orders": f"""
        SELECT o_orderkey, 'U' AS op FROM orders
        WHERE o_orderkey < {CHANGED_BELOW}
        UNION ALL
        SELECT o_orderkey + {NEW_OFFSET}, 'I' FROM orders WHERE o_orderkey < 50
        UNION ALL
        SELECT o_orderkey, 'D' FROM orders
        WHERE o_orderkey >= {DELETED_LO} AND o_orderkey < {DELETED_HI}
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
