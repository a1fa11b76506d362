"""Relational-analytics queries: aggregation, joins, windows, set ops,
pivot/rollup, time windows, sessionization, as-of join.

The reference has NONE of these (SURVEY.md §2.5) — they complete the
engine's query surface. Plans are written for scale: dimension joins
broadcast, aggregations single-pass with map-side combine, window ops
shuffle once on their partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import temporal
from ._util import round_to, sql_round, t


def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style: one hash aggregate over lineitem (partial agg
    map-side, then one shuffle on the tiny group key)."""
    li = t(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") <= F.lit("1998-09-02").cast("date")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            round_to(F.sum("l_quantity"), 2).alias("sum_qty"),
            round_to(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            round_to(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))),
                2,
            ).alias("sum_disc_price"),
            round_to(F.avg("l_quantity"), 4).alias("avg_qty"),
            round_to(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer ⋈ nation revenue rollup. nation is tiny →
    explicit broadcast; customer⋈orders shuffles on the join key once."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            round_to(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )



def join_revenue_by_nation_shj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHUFFLE-HASH-JOIN twin of join_revenue_by_nation (shared
    oracle — the two physical strategies must agree bit-for-bit): the
    customer side carries a shuffle_hash hint, trading the sort-merge
    join's two sorts for a build-side hash table. The right strategy
    at scale when one side is much smaller than the other but too big
    to broadcast, and the plan surface (SMJ vs SHJ vs BHJ) the
    optimizer chooses among — pinned by tests/test_plan_shapes.py."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").hint("shuffle_hash")
    n = t(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            round_to(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def sql_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same revenue rollup expressed through the SQL API surface
    (temp views + spark.sql) — Catalyst compiles both to the same plan;
    the oracle is shared with join_revenue_by_nation."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    t(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    return spark.sql(
        """
        SELECT /*+ BROADCAST(v_nation) */ n_name,
          CASE WHEN abs(sum(o_totalprice)) >= 1e15 THEN sum(o_totalprice)
               ELSE floor(sum(o_totalprice) * 100.0 + 0.5) / 100.0
          END AS revenue,
          count(*) AS n_orders
        FROM v_orders
        JOIN v_customer ON o_custkey = c_custkey
        JOIN v_nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


def sql_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17's shape on the slim schema: per brand, the count and
    revenue of line items whose quantity is below HALF the part's own
    average quantity — a CORRELATED SCALAR SUBQUERY that Catalyst
    decorrelates into an aggregate + join (RewriteCorrelatedScalarSubquery),
    the optimizer capability this entry exists to exercise and pin.

    Portability: l_quantity is integer-valued, so per-part avg = exact
    int sum / count (one correctly-rounded division, identical both
    engines) and 0.5· is an exact dyadic scaling; revenue sums as
    exact BIGINT half-up cents (the money rule — never a raw double
    sum in a hashed output)."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    t(spark, sf_dir, "part").createOrReplaceTempView("v_part")
    return spark.sql(
        """
        SELECT p_brand,
          count(*) AS n_small,
          sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
            AS revenue_cents
        FROM v_lineitem JOIN v_part ON p_partkey = l_partkey
        WHERE p_size < 10
          AND l_quantity < (
            SELECT 0.5 * avg(l2.l_quantity) FROM v_lineitem l2
            WHERE l2.l_partkey = v_lineitem.l_partkey
          )
        GROUP BY p_brand
        """
    )


_SMALL_QTY_SQL = """
SELECT p_brand,
  count(*) AS n_small,
  sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))::BIGINT
    AS revenue_cents
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_size < 10
  AND l_quantity < (
    SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = lineitem.l_partkey
  )
GROUP BY p_brand
"""


def sql_lone_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's shape on the slim schema (no receipt/commit dates —
    'late' = shipped more than 90 days after the order date): per
    supplier, the count of finished multi-supplier orders where THEY
    were the only late shipper. The EXISTS / NOT EXISTS pair is the
    point: Catalyst decorrelates them into a left-semi and a left-anti
    join against the same lineitem scan — the hardest standard
    decorrelation pattern, pinned here through the SQL surface. The
    inner lateness predicate gets its order date from a subquery-local
    join (equality-only correlation, the decorrelation-safe form)."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    t(spark, sf_dir, "supplier").createOrReplaceTempView("v_supplier")
    return spark.sql(
        """
        SELECT s_name, count(*) AS numwait
        FROM v_supplier
        JOIN v_lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN v_orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL '90' DAY
          AND EXISTS (
            SELECT 1 FROM v_lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM v_lineitem l3
            JOIN v_orders o3 ON o3.o_orderkey = l3.l_orderkey
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o3.o_orderdate + INTERVAL '90' DAY
          )
        GROUP BY s_name
        """
    )


_LONE_LATE_SQL = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL '90' DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL '90' DAY
  )
GROUP BY s_name
"""


def sql_big_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18's shape: customers holding orders whose total quantity
    exceeds 250 (~the top percentile) — an IN subquery over a
    GROUP BY + HAVING aggregate, which Catalyst rewrites to a
    left-semi join against the aggregated frame (the third standard
    decorrelation pattern after Q17's scalar and Q21's EXISTS pair).
    Quantities are integer-valued doubles, so every sum is exact in
    any order; output counts and quantity totals are exact BIGINTs."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT c_name,
          count(*) AS n_big_orders,
          CAST(sum(oq.total_qty) AS BIGINT) AS total_qty
        FROM v_customer
        JOIN v_orders ON o_custkey = c_custkey
        JOIN (
          SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
          FROM v_lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
        ) oq ON oq.l_orderkey = o_orderkey
        GROUP BY c_name
        """
    )


_BIG_ORDER_SQL = """
SELECT c_name,
  count(*)::BIGINT AS n_big_orders,
  CAST(sum(oq.total_qty) AS BIGINT) AS total_qty
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN (
  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
) oq ON oq.l_orderkey = o_orderkey
GROUP BY c_name
"""


def sql_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22's shape: per nation, customers whose balance is above
    the GLOBAL average yet placed no order since 2001-01-01 — an
    uncorrelated scalar subquery (the global mean) plus a correlated
    NOT EXISTS that decorrelates to a left-anti join with a pushed
    date filter on the orders side. Money discipline: balances convert
    to exact half-up BIGINT cents BEFORE averaging (a raw double avg
    is order-dependent); the mean is then one exact-int/int division,
    identical in both engines."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT c_nationkey,
          count(*) AS n_custs,
          sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS total_cents
        FROM v_customer
        WHERE CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) > (
            SELECT avg(CAST(floor(c2.c_acctbal * 100.0 + 0.5) AS BIGINT))
            FROM v_customer c2
          )
          AND NOT EXISTS (
            SELECT 1 FROM v_orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
          )
        GROUP BY c_nationkey
        """
    )


_DORMANT_RICH_SQL = """
SELECT c_nationkey,
  count(*)::BIGINT AS n_custs,
  sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT))::BIGINT AS total_cents
FROM customer
WHERE CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) > (
    SELECT avg(CAST(floor(c2.c_acctbal * 100.0 + 0.5) AS BIGINT))
    FROM customer c2
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
  )
GROUP BY c_nationkey
"""


def window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (deterministic tie-break)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rn").cast("long").alias("rn"))
    )


def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer ordered by order date (frame spec)."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate"), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        round_to(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


def sort_top20_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: Spark plans TakeOrderedAndProject — no full sort."""
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(20)
    )


def semi_join_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having >=1 urgent order (left semi — no row explosion)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def anti_join_quiet_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no URGENT orders (left anti against a filtered
    build side — non-empty at every scale factor, unlike no-orders-at-
    all, which is vacuous on this data)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def set_ops_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT surface: building-segment customers that do have
    open ('O') orders, minus those that also have 'F' orders."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    with_open = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    with_f = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return building.intersect(with_open).exceptAll(with_f.distinct()).select("custkey")


def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event counts pivoted by type (explicit value list so the
    plan is a single aggregate — no distinct-scan to discover columns)."""
    e = t(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    return (
        e.withColumn("day", F.to_date("ts"))
        .groupBy("day")
        .pivot("event_type", types)
        .count()
        .na.fill(0, subset=types)
    )


def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals over (returnflag, linestatus)."""
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        round_to(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed aggregation (batch twin of the streaming
    query in streaming/events.py — same results, same oracle)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_to(F.sum("value"), 4).alias("sum_value"),
        )
    )



def events_hourly_tvf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """window() TVF twin of events_hourly (SHARED oracle — the two
    grouping surfaces must agree bit-for-bit): the tumbling window
    comes from the ``window(ts, '1 hour')`` table-valued grouping
    Structured Streaming uses, so the exact batch/stream window
    semantics are proven equal to the date_trunc form. Output projects
    the window start as the hour."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_to(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour"), "event_type", "n", "sum_value"
        )
    )


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization per user."""
    e = t(spark, sf_dir, "events")
    out = temporal.sessionize(
        e, key="user_id", ts_col="ts", gap_minutes=30.0, order_tiebreak=("event_id",)
    )
    return (
        out.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


DEBOUNCE_GAP_S = 86_400.0  # collapse repeats within 24h of the kept event


def events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Throttle / debounce dedup (operators/temporal.throttle): per
    (user, event_type), keep an event only when >= 24h passed since the
    last KEPT one — bursts collapse onto their first event. Distinct
    from sessionization (which labels; this filters) and from a lag()
    screen (gap measures to the last SURVIVOR, a recursive statistic):
    the kept set computes as one per-key sorted fold in exact
    epoch-microsecond integers, so the oracle replays it bit-for-bit.
    One groupBy shuffle total."""
    e = t(spark, sf_dir, "events")
    out = temporal.throttle(
        e,
        ["user_id", "event_type"],
        ts_col="ts",
        id_col="event_id",
        gap_seconds=DEBOUNCE_GAP_S,
    )
    return out.select("user_id", "event_type", "event_id")


def asof_join_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event, the user's latest prior-or-equal click
    (classic as-of enrichment). Right side pre-deduped per (user, ts)
    for determinism.
    """
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    out = temporal.asof_join(
        purchases,
        clicks,
        on=("user_id",),
        left_ts="ts",
        right_ts="ts",
        right_cols=("click_id",),
        suffix="",
    )
    return out.select("user_id", "purchase_id", F.col("click_id").alias("click_id"))


_EVENTS_NORM = '''
  events_norm AS (
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
    FROM events
  )
'''

# Fold shape constraint (DuckDB 1.0.0): a multi-row list_reduce whose
# lambda RETURNS acc UNCHANGED on some branch (or rebuilds it from a
# slice) corrupts accumulators across vector chunks under threads>1 —
# measured on this query and minimized to a 4000-row repro. The lambda
# below always CONSTRUCTS (acc || CASE..[]..END, appends only, last
# kept pair read via negative index), which is chunk-safe.
_DEBOUNCE_SQL = f"""
WITH {_EVENTS_NORM.strip()},
g AS (
  SELECT user_id, event_type,
         list([epoch_us(ts), event_id] ORDER BY ts, event_id) AS evs
  FROM events_norm GROUP BY 1, 2
),
f AS (
  SELECT user_id, event_type,
    list_reduce(
      list_prepend([(-1)::BIGINT, (-1)::BIGINT], evs),
      (acc, x) -> acc || (
        CASE WHEN acc[-2] < 0
              OR x[1] - acc[-2] >= {int(DEBOUNCE_GAP_S * 1_000_000)}
        THEN [x[1], x[2]] ELSE []::BIGINT[] END)) AS acc
  FROM g
)
SELECT user_id, event_type,
       unnest(list_filter(acc[3:], (v, i) -> i % 2 = 0)) AS event_id
FROM f
"""


_REVENUE_SQL = f"""
    SELECT n_name,
      {sql_round("sum(o_totalprice)", 2)} AS revenue,
      count(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
"""

QUERIES = {
    "agg_pricing_summary": agg_pricing_summary,
    "join_revenue_by_nation": join_revenue_by_nation,
    "join_revenue_by_nation_shj": join_revenue_by_nation_shj,
    "sql_revenue_by_nation": sql_revenue_by_nation,
    "sql_small_qty_revenue": sql_small_qty_revenue,
    "sql_big_order_customers": sql_big_order_customers,
    "sql_dormant_rich_customers": sql_dormant_rich_customers,
    "sql_lone_late_supplier": sql_lone_late_supplier,
    "window_topk_orders": window_topk_orders,
    "window_running_total": window_running_total,
    "sort_top20_orders": sort_top20_orders,
    "semi_join_urgent_customers": semi_join_urgent_customers,
    "anti_join_quiet_customers": anti_join_quiet_customers,
    "set_ops_segments": set_ops_segments,
    "pivot_event_counts": pivot_event_counts,
    "rollup_lineitem": rollup_lineitem,
    "events_hourly": events_hourly,
    "events_hourly_tvf": events_hourly_tvf,
    "sessionize_events": sessionize_events,
    "events_debounce": events_debounce,
    "asof_join_purchases": asof_join_purchases,
}

ORACLES = {
    "agg_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
          {sql_round("sum(l_quantity)", 2)} AS sum_qty,
          {sql_round("sum(l_extendedprice)", 2)} AS sum_base_price,
          {sql_round("sum(l_extendedprice * (1.0 - l_discount))", 2)} AS sum_disc_price,
          {sql_round("avg(l_quantity)", 4)} AS avg_qty,
          {sql_round("avg(l_discount)", 4)} AS avg_disc,
          count(*) AS count_order
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "join_revenue_by_nation": _REVENUE_SQL,
    # SHJ twin shares the oracle: both physical strategies must agree
    "join_revenue_by_nation_shj": _REVENUE_SQL,
    # same oracle — the SQL-API query computes the identical rollup
    "sql_revenue_by_nation": _REVENUE_SQL,
    "sql_small_qty_revenue": _SMALL_QTY_SQL,
    "sql_big_order_customers": _BIG_ORDER_SQL,
    "sql_dormant_rich_customers": _DORMANT_RICH_SQL,
    "sql_lone_late_supplier": _LONE_LATE_SQL,
    "window_topk_orders": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders
        ) WHERE rn <= 3
    """,
    "window_running_total": f"""
        SELECT o_custkey, o_orderkey,
          {sql_round("sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", 2)}
            AS running_total
        FROM orders
    """,
    "sort_top20_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    "semi_join_urgent_customers": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
    "anti_join_quiet_customers": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
    """,
    "set_ops_segments": """
        SELECT custkey FROM (
          SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
          INTERSECT
          SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        )
        EXCEPT ALL
        SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "pivot_event_counts": f"""
        WITH {_EVENTS_NORM}
        SELECT CAST(ts AS DATE) AS day,
          count(*) FILTER (WHERE event_type = 'click') AS click,
          count(*) FILTER (WHERE event_type = 'view') AS "view",
          count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
          count(*) FILTER (WHERE event_type = 'signup') AS signup,
          count(*) FILTER (WHERE event_type = 'error') AS error
        FROM events_norm GROUP BY 1
    """,
    "rollup_lineitem": f"""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
          {sql_round("sum(l_quantity)", 2)} AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "events_hourly": f"""
        WITH {_EVENTS_NORM}
        SELECT date_trunc('hour', ts) AS hour, event_type,
          count(*) AS n, {sql_round("sum(value)", 4)} AS sum_value
        FROM events_norm GROUP BY 1, 2
    """,
    # window() TVF twin shares the oracle: both grouping surfaces agree
    "events_hourly_tvf": f"""
        WITH {_EVENTS_NORM}
        SELECT date_trunc('hour', ts) AS hour, event_type,
          count(*) AS n, {sql_round("sum(value)", 4)} AS sum_value
        FROM events_norm GROUP BY 1, 2
    """,
    "events_debounce": _DEBOUNCE_SQL,
    "sessionize_events": f"""
        WITH {_EVENTS_NORM},
        flagged AS (
          SELECT user_id, ts, event_id,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
                 THEN 1 ELSE 0 END AS new_session
          FROM events_norm
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
          SELECT user_id, ts,
            sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_id
          FROM flagged
        )
        SELECT user_id, session_id, count(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM sessions GROUP BY 1, 2
    """,
    "asof_join_purchases": f"""
        WITH {_EVENTS_NORM},
        purchases AS (
          SELECT user_id, ts, event_id AS purchase_id FROM events_norm
          WHERE event_type = 'purchase'
        ), clicks AS (
          SELECT user_id, ts, max(event_id) AS click_id FROM events_norm
          WHERE event_type = 'click' GROUP BY user_id, ts
        )
        SELECT p.user_id AS user_id, p.purchase_id AS purchase_id,
               c.click_id AS click_id
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
}
