"""Round-6 catalog additions: product/ops analytics and modeling
primitives a 100 TB training-data platform needs beyond curation.

Behavioral analytics: weekly cohort retention, Markov event
transitions, exact rolling 7-day distinct users (bounded-fanout
explode — the scale-safe alternative to a sliding COUNT DISTINCT
window, which Spark cannot express and a self-join would quadratic),
trailing z-score anomaly flags. Modeling: closed-form per-group
linear regression from decimal-exact sufficient statistics, one
PageRank power-iteration step over the customer→supplier nation trade
graph. Retrieval: sliding-window RAG chunking. Calendar: gap-filled
daily revenue via dimension generation (sequence/explode — no driver
loop).

The reference repo (data_process.py:1-369) has none of these; they are
north-star surface per the build brief. Same contract as every other
catalog module: each query has a DuckDB oracle with identical column
names and engine-portable arithmetic — double sums are either exact
(BIGINT / DECIMAL-cast money columns) or rounded via round_to/
sql_round at a scale the catalog's 5-round bench history shows is
stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import textfns
from ._util import round_to, spread, sql_round, sql_tokens, t

# ---------------------------------------------------------------------------
# weekly cohort retention
# ---------------------------------------------------------------------------


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort-retention triangle: users bucketed by the Monday
    week of their first event; for each (cohort week, week offset) the
    number of distinct users still active.

    Scale shape: the min-over-user window is user-partitioned (never
    global), the (user, cohort, week) projection is deduplicated BEFORE
    the final aggregate so the wide shuffle carries one row per
    user-week, not one per event.
    """
    e = t(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id")
    act = (
        e.withColumn(
            "cohort_week", F.date_trunc("week", F.min("ts").over(w)).cast("date")
        )
        .select(
            "user_id",
            "cohort_week",
            F.date_trunc("week", F.col("ts")).cast("date").alias("week_start"),
        )
        .distinct()
    )
    return (
        act.groupBy(
            "cohort_week",
            (F.datediff("week_start", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        # act is distinct per (user, cohort, week) so a plain count is
        # the distinct-user count — no count(distinct) shuffle needed
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


_COHORT_SQL = """
WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
f AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM e GROUP BY user_id
),
act AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(date_trunc('week', e.ts) AS DATE) AS week_start
  FROM e JOIN f USING (user_id)
)
SELECT cohort_week,
       (date_diff('day', cohort_week, week_start) / 7)::BIGINT AS week_offset,
       count(*)::BIGINT AS n_users
FROM act GROUP BY cohort_week, week_offset
"""


# ---------------------------------------------------------------------------
# Markov event-transition matrix
# ---------------------------------------------------------------------------


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts and probabilities between
    consecutive event types per user (ties broken by event_id, which is
    unique — deterministic across engines).

    Scale shape: lead() is user-partitioned; the per-source totals are
    a tiny (|types|²-bounded) aggregate broadcast back — no
    low-cardinality repartition of the big side by src_type.
    """
    e = t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.withColumn("dst_type", F.lead("event_type").over(w)).where(
        F.col("dst_type").isNotNull()
    )
    counts = pairs.groupBy(
        F.col("event_type").alias("src_type"), "dst_type"
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    totals = counts.groupBy("src_type").agg(F.sum("n_transitions").alias("__total"))
    return counts.join(F.broadcast(totals), "src_type").select(
        "src_type",
        "dst_type",
        "n_transitions",
        round_to(
            F.col("n_transitions").cast("double") / F.col("__total").cast("double"), 6
        ).alias("p_transition"),
    )


_TRANSITIONS_SQL = f"""
WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type FROM events
),
p AS (
  SELECT event_type AS src_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS dst_type
  FROM e
),
c AS (
  SELECT src_type, dst_type, count(*)::BIGINT AS n_transitions
  FROM p WHERE dst_type IS NOT NULL GROUP BY src_type, dst_type
),
tot AS (SELECT src_type, sum(n_transitions)::BIGINT AS total FROM c GROUP BY src_type)
SELECT c.src_type, c.dst_type, c.n_transitions,
       {sql_round("c.n_transitions::DOUBLE / tot.total::DOUBLE", 6)} AS p_transition
FROM c JOIN tot USING (src_type)
"""


# ---------------------------------------------------------------------------
# closed-form per-group linear regression
# ---------------------------------------------------------------------------


def regr_price_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS fit of l_extendedprice ~ l_quantity per part brand, from
    sufficient statistics (n, Σx, Σy, Σxx, Σyy, Σxy).

    Engine-portability: the money columns are 2-decimal doubles, so
    they are cast to DECIMAL before summing — every sufficient
    statistic is EXACT in both engines regardless of partition/merge
    order; slope/intercept/r² are then scalar double arithmetic on
    those exact sums (deterministic), unlike the engines' built-in
    regr_slope/corr whose internal accumulation orders differ.

    Scale shape: part is a dim side (broadcast); one map-side-combined
    aggregate over lineitem; 25 output groups.
    """
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("decimal(12,2)").alias("x"),
        F.col("l_extendedprice").cast("decimal(12,2)").alias("y"),
    )
    pt = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    stats = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("x").cast("double").alias("sx"),
            F.sum("y").cast("double").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
            F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        )
    )
    n = F.col("n_rows").cast("double")
    cov_n = n * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x_n = n * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y_n = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov_n / var_x_n
    return stats.select(
        "p_brand",
        "n_rows",
        round_to(slope, 6).alias("slope"),
        round_to((F.col("sy") - slope * F.col("sx")) / n, 6).alias("intercept"),
        round_to(cov_n * cov_n / (var_x_n * var_y_n), 6).alias("r2"),
    )


_REGR_SQL = f"""
WITH s AS (
  SELECT p.p_brand,
         count(*)::BIGINT AS n_rows,
         sum(CAST(l.l_quantity AS DECIMAL(12,2)))::DOUBLE AS sx,
         sum(CAST(l.l_extendedprice AS DECIMAL(12,2)))::DOUBLE AS sy,
         sum(CAST(l.l_quantity AS DECIMAL(12,2))
             * CAST(l.l_quantity AS DECIMAL(12,2)))::DOUBLE AS sxx,
         sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
             * CAST(l.l_extendedprice AS DECIMAL(12,2)))::DOUBLE AS syy,
         sum(CAST(l.l_quantity AS DECIMAL(12,2))
             * CAST(l.l_extendedprice AS DECIMAL(12,2)))::DOUBLE AS sxy
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand
)
SELECT p_brand, n_rows,
  {sql_round("(n_rows::DOUBLE * sxy - sx * sy) / (n_rows::DOUBLE * sxx - sx * sx)", 6)}
    AS slope,
  {sql_round(
      "(sy - ((n_rows::DOUBLE * sxy - sx * sy) / (n_rows::DOUBLE * sxx - sx * sx)) * sx)"
      " / n_rows::DOUBLE",
      6,
  )} AS intercept,
  {sql_round(
      "(n_rows::DOUBLE * sxy - sx * sy) * (n_rows::DOUBLE * sxy - sx * sy)"
      " / ((n_rows::DOUBLE * sxx - sx * sx) * (n_rows::DOUBLE * syy - sy * sy))",
      6,
  )} AS r2
FROM s
"""


# ---------------------------------------------------------------------------
# trailing z-score anomaly detection
# ---------------------------------------------------------------------------


def events_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-count anomalies per event type: z-score of each
    day's count against the TRAILING 7 days (excluding the current
    day, so a spike can't mask itself), flagged at |z| > 2.

    Mean/variance come from exact BIGINT window sums (Σ, Σ²) with the
    scalar double math mirrored in the oracle — no engine stddev
    (accumulation-order-dependent). Windows are series-partitioned;
    series count scales out, days per series are bounded.
    """
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    st = daily.select(
        "event_type",
        "day",
        "n_events",
        F.count(F.lit(1)).over(w).alias("wn"),
        F.sum("n_events").over(w).alias("ws"),
        F.sum(F.col("n_events") * F.col("n_events")).over(w).alias("wss"),
    )
    # try_divide: ANSI mode evaluates projection subexpressions even in
    # unselected CASE branches, so wn∈{0,1} rows would otherwise throw
    n = F.col("wn").cast("double")
    ws_d = F.col("ws").cast("double")
    mean = F.try_divide(ws_d, n)
    var = F.try_divide(
        F.col("wss").cast("double") - F.try_divide(ws_d * ws_d, n), n - F.lit(1.0)
    )
    z = F.try_divide(F.col("n_events").cast("double") - mean, F.sqrt(var))
    z_ok = (F.col("wn") >= 2) & (var > 0)
    return st.select(
        "event_type",
        "day",
        "n_events",
        F.when(z_ok, round_to(z, 6)).alias("z_score"),
        F.when(z_ok & (F.abs(z) > 2), 1).otherwise(0).cast("int").alias("is_anomaly"),
    )


_ZSCORE_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         count(*)::BIGINT AS n_events
  FROM events GROUP BY event_type, day
),
st AS (
  SELECT event_type, day, n_events,
         count(*) OVER w AS wn,
         sum(n_events) OVER w AS ws,
         sum(n_events * n_events) OVER w AS wss
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
),
calc AS (
  SELECT event_type, day, n_events, wn,
         (wss::DOUBLE - ws::DOUBLE * ws::DOUBLE / wn::DOUBLE)
           / (wn::DOUBLE - 1.0) AS var,
         (n_events::DOUBLE - ws::DOUBLE / wn::DOUBLE) AS dev
  FROM st
)
SELECT event_type, day, n_events,
       CASE WHEN wn >= 2 AND var > 0
            THEN {sql_round("dev / sqrt(var)", 6)} END AS z_score,
       (CASE WHEN wn >= 2 AND var > 0 AND abs(dev / sqrt(var)) > 2
             THEN 1 ELSE 0 END)::INTEGER AS is_anomaly
FROM calc
"""


# ---------------------------------------------------------------------------
# RAG sliding-window chunking
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


def docs_rag_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping retrieval chunks of 64
    tokens at stride 48 (16-token overlap). Every token is covered;
    the final chunk may be short; an empty document yields one empty
    chunk (so no doc silently vanishes from the index). Chunks are
    identified by md5 so downstream embedding/dedup stages can key on
    content, not position.

    Scale shape: pure JVM (split + sequence + posexplode + slice) —
    the ~(1 + 1/3)× row fanout happens after the scan with no shuffle
    at all; chunk rows flow straight into whatever keyed stage
    consumes them.
    """
    d = t(spark, sf_dir, "documents").select(
        "doc_id", textfns.tokens(F.col("text")).alias("tk")
    )
    # ceil((len-W)⁺ / S) via integer division — the id of the last chunk
    last_idx = F.expr(
        f"(greatest(size(tk) - {CHUNK_TOKENS}, 0) + {CHUNK_STRIDE - 1})"
        f" div {CHUNK_STRIDE}"
    )
    exploded = d.select(
        "doc_id",
        "tk",
        F.explode(F.sequence(F.lit(0).cast("long"), last_idx)).alias("i"),
    )
    chunk = F.slice(
        F.col("tk"), (F.col("i") * CHUNK_STRIDE + 1).cast("int"), CHUNK_TOKENS
    )
    return exploded.select(
        "doc_id",
        F.col("i").cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


_CHUNKS_SQL = f"""
WITH tk AS (
  SELECT doc_id, {sql_tokens("text")} AS tk FROM documents
),
idx AS (
  SELECT doc_id, tk, i
  FROM tk, unnest(range(0,
    (greatest(length(tk) - {CHUNK_TOKENS}, 0) + {CHUNK_STRIDE - 1})
      // {CHUNK_STRIDE} + 1)) AS u(i)
)
SELECT doc_id, i::BIGINT AS chunk_id,
       length(tk[(i * {CHUNK_STRIDE} + 1):(i * {CHUNK_STRIDE} + {CHUNK_TOKENS})])::BIGINT
         AS n_tokens,
       md5(array_to_string(tk[(i * {CHUNK_STRIDE} + 1):(i * {CHUNK_STRIDE} + {CHUNK_TOKENS})], ' '))
         AS chunk_md5
FROM idx
"""


# ---------------------------------------------------------------------------
# calendar gap-fill
# ---------------------------------------------------------------------------


def orders_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily revenue per order priority: every day of the
    global order-date calendar appears for every priority, zero-filled
    where no orders landed — the resample/asfreq step every
    time-series pipeline needs before rolling math.

    Scale shape: the calendar is GENERATED (sequence over the min/max
    single-row aggregate crossed with the 5-row priority dim, both
    broadcast) — not collected to the driver, not a self-join; the
    only big-side work is one aggregate of orders.
    """
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority", F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        round_to(F.sum("o_totalprice"), 2).alias("rev"),
        F.count(F.lit(1)).alias("cnt"),
    )
    cal = (
        o.agg(
            F.min(F.col("o_orderdate").cast("date")).alias("d0"),
            F.max(F.col("o_orderdate").cast("date")).alias("d1"),
        )
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    prios = o.select("o_orderpriority").distinct()
    grid = cal.crossJoin(F.broadcast(prios))
    return (
        grid.join(daily, ["o_orderpriority", "day"], "left")
        .select(
            "o_orderpriority",
            "day",
            F.coalesce(F.col("rev"), F.lit(0.0)).alias("revenue"),
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("n_orders"),
        )
    )


_GAP_FILL_SQL = f"""
WITH b AS (
  SELECT CAST(min(o_orderdate) AS DATE) AS d0, CAST(max(o_orderdate) AS DATE) AS d1
  FROM orders
),
cal AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM b
),
pr AS (SELECT DISTINCT o_orderpriority FROM orders),
daily AS (
  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
         {sql_round("sum(o_totalprice)", 2)} AS rev, count(*)::BIGINT AS cnt
  FROM orders GROUP BY o_orderpriority, day
)
SELECT pr.o_orderpriority, cal.day,
       coalesce(d.rev, 0.0) AS revenue,
       coalesce(d.cnt, 0)::BIGINT AS n_orders
FROM cal CROSS JOIN pr
LEFT JOIN daily d ON d.o_orderpriority = pr.o_orderpriority AND d.day = cal.day
"""


# ---------------------------------------------------------------------------
# exact rolling 7-day distinct users
# ---------------------------------------------------------------------------


def rolling_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct active users per day — EXACTLY, without
    a sliding COUNT DISTINCT window (inexpressible in Spark) and
    without a day×day range self-join (quadratic in the calendar).

    The bounded-fanout formulation: dedup to (user, day) first, then
    each active day contributes its user to the next 7 calendar days
    (sequence+explode, capped at the corpus max day via a broadcast
    single-row aggregate), then one distinct-count per day. Fanout is
    a constant 7× on the ALREADY-deduplicated rows — the standard
    scale trick for small sliding windows over distinct counts.
    """
    e = (
        t(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    mx = e.agg(F.max("d").alias("md"))
    fan = e.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.least(F.date_add("d", 6), F.col("md")))
        ).alias("day"),
    )
    return fan.groupBy("day").agg(
        F.countDistinct("user_id").alias("n_users_7d")
    )


def rolling_7d_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SKETCH twin of rolling_7d_distinct_users: one HLL sketch per
    day (lgConfigK pinned, the sketch_merge_distinct stance), then each
    day's trailing-7-day estimate is a register-wise UNION of seven
    day sketches over a day-range window — the window runs on the
    POST-AGGREGATION day table (#days rows, not raw events), which is
    where a 100 TB deployment keeps per-partition sketch columns. The
    contract output (exact count + within-10% boolean per day, exact
    values shared with the bounded-fanout twin's oracle) hash-verifies
    even though raw HLL estimates are library-specific."""
    lg_k = 12
    e = t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    per_day = e.groupBy("d").agg(
        F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sk")
    )
    w = (
        Window.orderBy(F.datediff(F.col("d"), F.lit("1990-01-01").cast("date")))
        .rangeBetween(-6, 0)
    )
    est = per_day.select(
        F.col("d").alias("day"),
        F.hll_sketch_estimate(
            F.hll_union_agg("sk", F.lit(False)).over(w)
        ).alias("est"),
    )
    exact = rolling_7d_distinct_users(spark, sf_dir)
    # exact fans to EVERY trailing day incl. days with no events of
    # their own; the sketch table only has active days — inner join
    # compares where both are defined
    return exact.join(est, "day").select(
        "day",
        "n_users_7d",
        (
            F.abs(F.col("est") - F.col("n_users_7d"))
            <= F.lit(0.1) * F.col("n_users_7d").cast("double")
        ).alias("est_within_10pct"),
    )


_ROLLING_DISTINCT_CTE = """
WITH e AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events
),
mx AS (SELECT max(d) AS md FROM e),
fan AS (
  SELECT user_id, d + i::INTEGER AS day
  FROM e, mx, unnest(range(0, 7)) AS u(i)
  WHERE d + i::INTEGER <= md
)
"""

_ROLLING_SKETCH_SQL = (
    _ROLLING_DISTINCT_CTE
    + """
SELECT f.day, count(DISTINCT f.user_id)::BIGINT AS n_users_7d,
       true AS est_within_10pct
FROM fan f JOIN (SELECT DISTINCT d FROM e) act ON f.day = act.d
GROUP BY f.day
"""
)

_ROLLING_DISTINCT_SQL = _ROLLING_DISTINCT_CTE + """
SELECT day, count(DISTINCT user_id)::BIGINT AS n_users_7d
FROM fan GROUP BY day
"""


# ---------------------------------------------------------------------------
# PageRank power-iteration step over the nation trade graph
# ---------------------------------------------------------------------------

PR_DAMPING = 0.85


def nation_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One PageRank power-iteration step over the customer-nation →
    supplier-nation trade graph, edge-weighted by discounted revenue.

    Edge weights are DECIMAL-exact sums (merge-order-independent);
    the rank step is scalar double math on those exact aggregates:
    p₁(v) = (0.15 + 0.85·Σ_{u→v} w(u,v)/out(u)) / N, uniform p₀.
    Iterating is this same step re-applied (the two-step k-means
    pattern, queries/extra.py) — one step keeps the oracle one SQL
    statement while exercising the full edge-build join tree (the
    TPC-H Q5 shape: lineitem⋈orders⋈customer⋈supplier⋈nation²).

    Scale shape: the only big-data work is the edge aggregation
    (map-side combined to ≤N² rows); nation dims are broadcast; the
    rank arithmetic runs on N rows.
    """
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1.0) - F.col("l_discount")).cast("decimal(4,2)")
        ).alias("rev"),
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("c_nationkey").alias("src_key"),
            F.col("s_nationkey").alias("dst_key"),
        )
        .agg(F.sum("rev").alias("w"))
    )
    out_w = edges.groupBy("src_key").agg(F.sum("w").alias("out_total"))
    contrib = (
        edges.join(F.broadcast(out_w), "src_key")
        .groupBy("dst_key")
        .agg(
            F.sum(
                F.col("w").cast("double") / F.col("out_total").cast("double")
            ).alias("share_in")
        )
    )
    n_nations = n.agg(F.count(F.lit(1)).alias("n_nodes"))
    return (
        n.join(F.broadcast(contrib), n.n_nationkey == contrib.dst_key, "left")
        .crossJoin(F.broadcast(n_nations))
        .select(
            "n_name",
            round_to(
                (
                    F.lit(1.0 - PR_DAMPING)
                    + F.lit(PR_DAMPING) * F.coalesce(F.col("share_in"), F.lit(0.0))
                )
                / F.col("n_nodes").cast("double"),
                6,
            ).alias("pagerank"),
        )
    )


_PAGERANK_SQL = f"""
WITH edges AS (
  SELECT c.c_nationkey AS src_key, s.s_nationkey AS dst_key,
         sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
             * CAST(1.0 - l.l_discount AS DECIMAL(4,2))) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY src_key, dst_key
),
outw AS (SELECT src_key, sum(w) AS out_total FROM edges GROUP BY src_key),
contrib AS (
  SELECT e.dst_key, sum(e.w::DOUBLE / o.out_total::DOUBLE) AS share_in
  FROM edges e JOIN outw o USING (src_key) GROUP BY e.dst_key
),
nn AS (SELECT count(*)::BIGINT AS n_nodes FROM nation)
SELECT n.n_name,
       {sql_round(
           f"(({1.0 - PR_DAMPING}) + {PR_DAMPING} * coalesce(c.share_in, 0.0))"
           " / nn.n_nodes::DOUBLE",
           6,
       )} AS pagerank
FROM nation n
LEFT JOIN contrib c ON n.n_nationkey = c.dst_key
CROSS JOIN nn
"""


# ---------------------------------------------------------------------------
# peak concurrency (sweep-line via bounded minute fanout)
# ---------------------------------------------------------------------------


def max_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily peak concurrency: for each day, the minute with the most
    simultaneously-active 30-minute-gap sessions (earliest minute wins
    ties — deterministic).

    The scale-shaped sweep-line: instead of a global +1/−1 running sum
    (one totally-ordered window — the classic single-partition killer),
    each session fans out to the minutes it spans (bounded by session
    length, which the 30-minute gap rule keeps human-scale), then one
    per-minute count and a day-partitioned rank pick the peak.
    """
    from .relational import sessionize_events as _sessions

    s = _sessions(spark, sf_dir)
    mins = s.select(
        F.explode(
            F.sequence(
                F.date_trunc("minute", F.col("session_start")),
                F.date_trunc("minute", F.col("session_end")),
                F.expr("interval 1 minute"),
            )
        ).alias("minute")
    )
    per_min = mins.groupBy("minute").agg(F.count(F.lit(1)).alias("n_active"))
    w = Window.partitionBy(F.col("minute").cast("date")).orderBy(
        F.desc("n_active"), F.asc("minute")
    )
    return (
        per_min.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("minute").cast("date").alias("day"),
            F.col("minute").alias("peak_minute"),
            F.col("n_active").alias("max_concurrent"),
        )
    )


def _max_concurrent_sql() -> str:
    from .relational import ORACLES as _REL_ORACLES

    # reuse the sessionize oracle as a subquery: same session
    # definition, so the two queries can never drift apart
    sessions_sql = _REL_ORACLES["sessionize_events"].strip().rstrip(";")
    return f"""
WITH sess AS ({sessions_sql}),
mins AS (
  SELECT unnest(generate_series(date_trunc('minute', session_start),
                                date_trunc('minute', session_end),
                                INTERVAL 1 MINUTE)) AS minute
  FROM sess
),
per_min AS (SELECT minute, count(*)::BIGINT AS n_active FROM mins GROUP BY minute),
ranked AS (
  SELECT CAST(minute AS DATE) AS day, minute AS peak_minute, n_active,
         row_number() OVER (PARTITION BY CAST(minute AS DATE)
                            ORDER BY n_active DESC, minute) AS rn
  FROM per_min
)
SELECT day, peak_minute, n_active AS max_concurrent FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# chunk-granularity dedup over the RAG index
# ---------------------------------------------------------------------------


def rag_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate report over the chunk index: md5-identical 64-token
    chunks appearing in more than one document (or repeatedly in one).
    This is dedup at retrieval granularity — the unit an index stores —
    catching shared headers/footers that doc-level fingerprints miss.

    Scale shape: the chunk fanout is shuffle-free (docs_rag_chunks);
    the report is one map-side-combined aggregate keyed on the 128-bit
    md5 — uniformly distributed, no skew.
    """
    chunks = docs_rag_chunks(spark, sf_dir)
    return (
        chunks.groupBy("chunk_md5")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .where(F.col("n_occurrences") >= 2)
    )


_CHUNK_DEDUP_SQL = f"""
WITH chunks AS ({_CHUNKS_SQL}),
g AS (
  SELECT chunk_md5, count(DISTINCT doc_id)::BIGINT AS n_docs,
         count(*)::BIGINT AS n_occurrences
  FROM chunks GROUP BY chunk_md5
)
SELECT chunk_md5, n_docs, n_occurrences FROM g WHERE n_occurrences >= 2
"""


def _trade_edges(spark: SparkSession, sf_dir: str):
    """(src_key, dst_key, w) + (src_key, out_total) for the nation
    trade graph — the shared edge build of the pagerank queries."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1.0) - F.col("l_discount")).cast("decimal(4,2)")
        ).alias("rev"),
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("c_nationkey").alias("src_key"),
            F.col("s_nationkey").alias("dst_key"),
        )
        .agg(F.sum("rev").alias("w"))
    )
    out_w = edges.groupBy("src_key").agg(F.sum("w").alias("out_total"))
    return edges, out_w


def nation_trade_pagerank2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO PageRank power iterations over the nation trade graph — the
    iterate-by-composition pattern (kmeans_two_step): the expensive
    edge aggregation is built once and persisted; each step is a
    broadcast join of the current N-row rank vector against the edges.
    Step-1 ranks are rounded before feeding step 2, pinning the
    iteration deterministic in both engines.
    """
    edges, out_w = _trade_edges(spark, sf_dir)
    edges = edges.join(F.broadcast(out_w), "src_key").persist()
    try:
        n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
        nn = n.agg(F.count(F.lit(1)).alias("n_nodes"))
        share = F.col("w").cast("double") / F.col("out_total").cast("double")

        c1 = edges.groupBy("dst_key").agg(F.sum(share).alias("s1"))
        p1 = (
            n.join(F.broadcast(c1), n.n_nationkey == c1.dst_key, "left")
            .crossJoin(F.broadcast(nn))
            .select(
                "n_nationkey",
                "n_name",
                "n_nodes",
                round_to(
                    (
                        F.lit(1.0 - PR_DAMPING)
                        + F.lit(PR_DAMPING) * F.coalesce(F.col("s1"), F.lit(0.0))
                    )
                    / F.col("n_nodes").cast("double"),
                    6,
                ).alias("pagerank_1"),
            )
        )
        c2 = (
            edges.join(
                F.broadcast(p1.select(F.col("n_nationkey").alias("src_key"), "pagerank_1")),
                "src_key",
            )
            .groupBy("dst_key")
            .agg(F.sum(F.col("pagerank_1") * share).alias("s2"))
        )
        return (
            p1.join(F.broadcast(c2), p1.n_nationkey == c2.dst_key, "left")
            .select(
                "n_name",
                "pagerank_1",
                round_to(
                    F.lit(1.0 - PR_DAMPING) / F.col("n_nodes").cast("double")
                    + F.lit(PR_DAMPING) * F.coalesce(F.col("s2"), F.lit(0.0)),
                    6,
                ).alias("pagerank_2"),
            )
        )
    finally:
        edges.unpersist(blocking=False)


_PAGERANK2_SQL = f"""
WITH edges AS (
  SELECT c.c_nationkey AS src_key, s.s_nationkey AS dst_key,
         sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
             * CAST(1.0 - l.l_discount AS DECIMAL(4,2))) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY src_key, dst_key
),
outw AS (SELECT src_key, sum(w) AS out_total FROM edges GROUP BY src_key),
nn AS (SELECT count(*)::BIGINT AS n_nodes FROM nation),
c1 AS (
  SELECT e.dst_key, sum(e.w::DOUBLE / o.out_total::DOUBLE) AS s1
  FROM edges e JOIN outw o USING (src_key) GROUP BY e.dst_key
),
p1 AS (
  SELECT n.n_nationkey, n.n_name, nn.n_nodes,
         {sql_round(
             f"(({1.0 - PR_DAMPING}) + {PR_DAMPING} * coalesce(c1.s1, 0.0))"
             " / nn.n_nodes::DOUBLE",
             6,
         )} AS pagerank_1
  FROM nation n LEFT JOIN c1 ON n.n_nationkey = c1.dst_key CROSS JOIN nn
),
c2 AS (
  SELECT e.dst_key,
         sum(p.pagerank_1 * (e.w::DOUBLE / o.out_total::DOUBLE)) AS s2
  FROM edges e
  JOIN outw o USING (src_key)
  JOIN p1 p ON p.n_nationkey = e.src_key
  GROUP BY e.dst_key
)
SELECT p.n_name, p.pagerank_1,
       {sql_round(
           f"({1.0 - PR_DAMPING}) / p.n_nodes::DOUBLE"
           f" + {PR_DAMPING} * coalesce(c2.s2, 0.0)",
           6,
       )} AS pagerank_2
FROM p1 p LEFT JOIN c2 ON p.n_nationkey = c2.dst_key
"""


# ---------------------------------------------------------------------------
# RFM segmentation on the distributed exact-ntile machinery
# ---------------------------------------------------------------------------

RFM_BUCKETS = 5


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-Frequency-Monetary customer segmentation: per customer,
    days since last order, order count, and total spend, each scored
    1–5 by exact quintile (5 = best) with the three-digit segment code.

    The quintiles come from operators/selection.ntile_assign — the
    distributed exact order-statistics path (percentile bracket + band
    top-k + broadcast cut points), NOT a global ntile window, so the
    scoring scales to any customer count. The oracle uses plain
    ``ntile(5) OVER (ORDER BY …)`` over the identical (value, custkey)
    total order; the shared hash proves the two strategies identical
    (the agg_quartiles_orders pattern, second deployment).
    """
    from ..operators import selection

    o = t(spark, sf_dir, "orders")
    ref = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("refd"))
    base = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            round_to(F.sum("o_totalprice"), 2).alias("monetary"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "o_custkey",
            F.datediff("refd", "last_order").alias("recency_days"),
            "frequency",
            "monetary",
            (-F.datediff("refd", "last_order")).alias("__neg_recency"),
        )
    )
    base = base.persist()
    try:
        scored = base
        for metric, score_name in (
            ("__neg_recency", "r_score"),
            ("frequency", "f_score"),
            ("monetary", "m_score"),
        ):
            scored = selection.ntile_assign(
                scored, metric, "o_custkey", RFM_BUCKETS
            ).withColumn(score_name, F.lit(RFM_BUCKETS + 1) - F.col("bucket")).drop(
                "bucket"
            )
        return scored.select(
            "o_custkey",
            "recency_days",
            "frequency",
            "monetary",
            "r_score",
            "f_score",
            "m_score",
            F.concat(
                F.col("r_score").cast("string"),
                F.col("f_score").cast("string"),
                F.col("m_score").cast("string"),
            ).alias("segment"),
        )
    finally:
        base.unpersist(blocking=False)


_RFM_SQL = f"""
WITH ref AS (SELECT max(CAST(o_orderdate AS DATE)) AS refd FROM orders),
base AS (
  SELECT o_custkey,
         date_diff('day', max(CAST(o_orderdate AS DATE)), (SELECT refd FROM ref))
           ::INTEGER AS recency_days,
         count(*)::BIGINT AS frequency,
         {sql_round("sum(o_totalprice)", 2)} AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT *,
    ({RFM_BUCKETS + 1} - ntile({RFM_BUCKETS}) OVER (ORDER BY recency_days ASC, o_custkey))::BIGINT AS r_score,
    ({RFM_BUCKETS + 1} - ntile({RFM_BUCKETS}) OVER (ORDER BY frequency DESC, o_custkey))::BIGINT AS f_score,
    ({RFM_BUCKETS + 1} - ntile({RFM_BUCKETS}) OVER (ORDER BY monetary DESC, o_custkey))::BIGINT AS m_score
  FROM base
)
SELECT o_custkey, recency_days, frequency, monetary, r_score, f_score, m_score,
       r_score::VARCHAR || f_score::VARCHAR || m_score::VARCHAR AS segment
FROM scored
"""


# ---------------------------------------------------------------------------
# conversion-lag histogram (as-of join + bucketing)
# ---------------------------------------------------------------------------


def conversion_lag_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion distribution: for every purchase, the lag
    since the user's latest prior-or-equal click (one-shuffle as-of
    join, operators/temporal.asof_join), bucketed into funnel-latency
    bands with each band's share of all purchases.

    Lag compares exact epoch-microsecond BIGINTs (unix_micros vs
    DuckDB epoch_us) — no float time arithmetic near a bucket edge.
    """
    from ..operators import temporal

    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.count(F.lit(1)).alias("__dup"))
        .select("user_id", "ts", F.col("ts").alias("click_ts"))
    )
    joined = temporal.asof_join(
        purchases,
        clicks,
        on=("user_id",),
        left_ts="ts",
        right_ts="ts",
        right_cols=("click_ts",),
        suffix="",
    )
    lag_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("click_ts"))
    bucket = (
        F.when(F.col("click_ts").isNull(), "no_click")
        .when(lag_us < 60_000_000, "<1m")
        .when(lag_us < 300_000_000, "1-5m")
        .when(lag_us < 900_000_000, "5-15m")
        .when(lag_us < 3_600_000_000, "15-60m")
        .otherwise(">=60m")
    )
    total = purchases.agg(F.count(F.lit(1)).alias("__total"))
    return (
        joined.groupBy(bucket.alias("lag_bucket"))
        .agg(F.count(F.lit(1)).alias("n_purchases"))
        .crossJoin(F.broadcast(total))
        .select(
            "lag_bucket",
            "n_purchases",
            round_to(
                F.col("n_purchases").cast("double") / F.col("__total").cast("double"),
                6,
            ).alias("share"),
        )
    )


_CONVERSION_SQL = f"""
WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
),
p AS (SELECT user_id, ts FROM e WHERE event_type = 'purchase'),
c AS (
  SELECT user_id, ts AS click_ts FROM e WHERE event_type = 'click'
  GROUP BY user_id, ts
),
j AS (
  SELECT p.user_id, p.ts, c.click_ts
  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.click_ts
),
b AS (
  SELECT CASE
    WHEN click_ts IS NULL THEN 'no_click'
    WHEN epoch_us(ts) - epoch_us(click_ts) < 60000000 THEN '<1m'
    WHEN epoch_us(ts) - epoch_us(click_ts) < 300000000 THEN '1-5m'
    WHEN epoch_us(ts) - epoch_us(click_ts) < 900000000 THEN '5-15m'
    WHEN epoch_us(ts) - epoch_us(click_ts) < 3600000000 THEN '15-60m'
    ELSE '>=60m' END AS lag_bucket
  FROM j
),
tot AS (SELECT count(*)::BIGINT AS total FROM p)
SELECT lag_bucket, count(*)::BIGINT AS n_purchases,
       {sql_round("count(*)::DOUBLE / tot.total::DOUBLE", 6)} AS share
FROM b, tot GROUP BY lag_bucket, tot.total
"""


# ---------------------------------------------------------------------------
# key-skew profiler
# ---------------------------------------------------------------------------

SKEW_COLS = ("l_suppkey", "l_partkey", "l_returnflag")


def lineitem_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioning-decision diagnosis over lineitem's join/agg keys:
    distinct-key count, hottest key, and skew ratio per candidate
    column (operators/skew.key_skew_profile) — the report that says
    which keys need salting or AQE skew splitting before a 100 TB run.
    """
    from ..operators import skew

    li = t(spark, sf_dir, "lineitem")
    return skew.key_skew_profile(li, list(SKEW_COLS))


def _skew_sql() -> str:
    branches = "\n  UNION ALL\n".join(
        f"  SELECT '{c}' AS key_col, coalesce({c}::VARCHAR, 'NULL') AS key_val"
        f" FROM lineitem"
        for c in SKEW_COLS
    )
    return f"""
WITH pairs AS (
{branches}
),
counts AS (
  SELECT key_col, key_val, count(*)::BIGINT AS cnt
  FROM pairs GROUP BY key_col, key_val
)
SELECT key_col, sum(cnt)::BIGINT AS n_rows, count(*)::BIGINT AS n_keys,
       max(cnt) AS max_count,
       arg_max(key_val, lpad(cnt::VARCHAR, 18, '0') || '|' || key_val) AS top_key,
       {sql_round("max(cnt)::DOUBLE / (sum(cnt)::DOUBLE / count(*)::DOUBLE)", 4)}
         AS skew_ratio
FROM counts GROUP BY key_col
"""


# ---------------------------------------------------------------------------
# market-basket pair affinity (association mining)
# ---------------------------------------------------------------------------

AFFINITY_TOP = 50


def part_pair_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-itemset mining, pair tier: the top-50 part pairs
    co-occurring in an order, with support counts and lift
    (P(a,b)/(P(a)·P(b))).

    Scale shape: pair generation fans out WITHIN each basket only —
    each order's (distinct, sorted) parts collect once and ordered
    pairs enumerate as an array expression, so one shuffle replaces a
    self-join's two-sided exchange (fanout still bounded by basket
    size squared; measured ~30% on the copurchase edge build). Item
    marginals come back as two broadcast joins, and the order total
    arrives as a broadcast single-row aggregate (the repo convention,
    see rolling_7d_distinct_users) — no eager driver-side action in
    the query body. Lift arithmetic runs on exact BIGINT counts;
    ordering ties break on the (part_a, part_b) key, so the top-50
    cut is deterministic.
    """
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n_orders = li.agg(
        F.countDistinct("l_orderkey").cast("double").alias("__n_orders")
    )
    basket = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    pairs = (
        basket.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ps"),
                        lambda x, i: F.transform(
                            F.slice(F.col("ps"), i + 2, F.size(F.col("ps"))),
                            lambda y: F.struct(
                                x.alias("part_a"), y.alias("part_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders_both"))
    )
    items = li.groupBy(F.col("l_partkey").alias("part_a")).agg(
        F.count(F.lit(1)).alias("__na")
    )
    items_b = items.select(
        F.col("part_a").alias("part_b"), F.col("__na").alias("__nb")
    )
    lift = (
        F.col("n_orders_both").cast("double")
        * F.col("__n_orders")
        / (F.col("__na").cast("double") * F.col("__nb").cast("double"))
    )
    return (
        pairs.join(F.broadcast(items), "part_a")
        .join(F.broadcast(items_b), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_orders_both",
            round_to(lift, 6).alias("lift"),
        )
        .orderBy(F.desc("n_orders_both"), "part_a", "part_b")
        .limit(AFFINITY_TOP)
    )


_AFFINITY_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS n_orders FROM li),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         count(*)::BIGINT AS n_orders_both
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
  GROUP BY part_a, part_b
),
items AS (SELECT l_partkey, count(*)::BIGINT AS ni FROM li GROUP BY l_partkey)
SELECT p.part_a, p.part_b, p.n_orders_both,
       {sql_round(
           "p.n_orders_both::DOUBLE * n.n_orders::DOUBLE"
           " / (ia.ni::DOUBLE * ib.ni::DOUBLE)",
           6,
       )} AS lift
FROM pairs p
JOIN items ia ON p.part_a = ia.l_partkey
JOIN items ib ON p.part_b = ib.l_partkey
CROSS JOIN n
ORDER BY p.n_orders_both DESC, p.part_a, p.part_b
LIMIT {AFFINITY_TOP}
"""


# ---------------------------------------------------------------------------
# event-path mining
# ---------------------------------------------------------------------------

PATHS_TOP = 20


def top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: the 20 most common 3-step event-type sequences
    (consecutive per user, ordered by ts with the unique event_id
    tie-break), with counts and share of all 3-step windows.

    Scale shape: two user-partitioned leads, one map-side-combined
    aggregate over the |types|³-bounded path space, broadcast total.
    """
    e = t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    triples = (
        e.withColumn("s2", F.lead("event_type", 1).over(w))
        .withColumn("s3", F.lead("event_type", 2).over(w))
        .where(F.col("s3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "s2", "s3").alias("path")
        )
    )
    counts = triples.groupBy("path").agg(F.count(F.lit(1)).alias("n_paths"))
    total = triples.agg(F.count(F.lit(1)).alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "path",
            "n_paths",
            round_to(
                F.col("n_paths").cast("double") / F.col("__total").cast("double"), 6
            ).alias("share"),
        )
        .orderBy(F.desc("n_paths"), "path")
        .limit(PATHS_TOP)
    )


_PATHS_SQL = f"""
WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type FROM events
),
tr AS (
  SELECT event_type || '>' ||
         lead(event_type, 1) OVER w || '>' ||
         lead(event_type, 2) OVER w AS path
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
v AS (SELECT path FROM tr WHERE path IS NOT NULL),
tot AS (SELECT count(*)::BIGINT AS total FROM v),
c AS (SELECT path, count(*)::BIGINT AS n_paths FROM v GROUP BY path)
SELECT c.path, c.n_paths,
       {sql_round("c.n_paths::DOUBLE / tot.total::DOUBLE", 6)} AS share
FROM c CROSS JOIN tot
ORDER BY c.n_paths DESC, c.path
LIMIT {PATHS_TOP}
"""


# ---------------------------------------------------------------------------
# month-over-month / year-over-year growth
# ---------------------------------------------------------------------------


def revenue_mom_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with month-over-month and year-over-year growth
    rates. Prior periods attach by CALENDAR arithmetic (self-join on
    month−1/month−12), not lag() over row order — correct across gaps
    in the month sequence and free of any global window. The monthly
    aggregate itself is the only big-data work; the growth joins run on
    #months rows.
    """
    o = t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    ).agg(round_to(F.sum("o_totalprice"), 2).alias("revenue"))
    prev_m = monthly.select(
        F.add_months(F.col("month"), 1).alias("month"),
        F.col("revenue").alias("__prev_m"),
    )
    prev_y = monthly.select(
        F.add_months(F.col("month"), 12).alias("month"),
        F.col("revenue").alias("__prev_y"),
    )
    pct = lambda cur, prev: round_to(  # noqa: E731
        (cur.cast("double") - prev.cast("double")) / prev.cast("double"), 6
    )
    return (
        monthly.join(prev_m, "month", "left")
        .join(prev_y, "month", "left")
        .select(
            "month",
            "revenue",
            pct(F.col("revenue"), F.col("__prev_m")).alias("mom_pct"),
            pct(F.col("revenue"), F.col("__prev_y")).alias("yoy_pct"),
        )
    )


_MOM_YOY_SQL = f"""
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         {sql_round("sum(o_totalprice)", 2)} AS revenue
  FROM orders GROUP BY month
)
SELECT m.month, m.revenue,
       {sql_round("(m.revenue - pm.revenue) / pm.revenue", 6)} AS mom_pct,
       {sql_round("(m.revenue - py.revenue) / py.revenue", 6)} AS yoy_pct
FROM monthly m
LEFT JOIN monthly pm ON pm.month + INTERVAL 1 MONTH = m.month
LEFT JOIN monthly py ON py.month + INTERVAL 12 MONTH = m.month
"""


def revenue_cusum_shifts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's CUSUM change-point statistic over daily revenue — the
    monitoring primitive that flags level shifts a plain threshold
    misses. Uses the RECURSION-FREE prefix form: with
    d_i = m·rev_i − total (mean-centering scaled by the day count m so
    no division happens), C_i = Σ_{j<=i} d_j, the classic
    S⁺_i = max(0, S⁺_{i−1} + d_i) equals C_i − min_{j<=i} C_j and
    S⁻ mirrors with the running max — so the sequential recursion
    becomes two window functions over EXACT DECIMAL arithmetic; no
    float exists until the final display division. Shift flags compare
    m·S against 4·Σ|d| (four mean absolute deviations), all-integer.

    Scale shape: the windows run over the DAY-aggregated series —
    bounded by the calendar (~2.4k rows; 36.5k for a century), never
    the fact table. The heavy work is the one daily aggregate; the two
    scalar aggregates broadcast as single rows. Everything runs in
    BIGINT cents (a DECIMAL path drifted in the last display digit
    across engines — DECIMAL-to-double conversion rules differ; int64
    does not): |C| stays under 2^63 while cents·days² < 9.2e18, i.e.
    up to ~\\$1.6B/day over a decade — re-aggregate monthly beyond.
    """
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        ).alias("revc")
    )
    stats = daily.agg(
        F.count(F.lit(1)).alias("__m"), F.sum("revc").alias("__total")
    )
    d = daily.crossJoin(F.broadcast(stats)).select(
        "day",
        "revc",
        (F.col("revc") * F.col("__m") - F.col("__total")).alias("__d"),
        "__m",
    )
    absd = d.agg(F.sum(F.abs("__d")).alias("__sumabs"))
    from pyspark.sql import Window

    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    staged = d.select(
        "day", "revc", "__m", F.sum("__d").over(w).alias("__c")
    )
    spos = F.col("__c") - F.min("__c").over(w)
    sneg = F.max("__c").over(w) - F.col("__c")
    staged2 = staged.select(
        "day", "revc", "__m", spos.alias("__spos"), sneg.alias("__sneg")
    ).crossJoin(F.broadcast(absd))
    md = F.col("__m").cast("double")
    dollars = lambda c: c.cast("double") / md / F.lit(100.0)  # noqa: E731
    flag = lambda c: (  # identical int64-derived doubles both engines
        c.cast("double") * md > F.lit(4.0) * F.col("__sumabs").cast("double")
    )  # noqa: E731
    return staged2.select(
        "day",
        round_to(F.col("revc").cast("double") / F.lit(100.0), 2).alias("rev"),
        round_to(dollars(F.col("__spos")), 4).alias("cusum_pos"),
        round_to(dollars(F.col("__sneg")), 4).alias("cusum_neg"),
        flag(F.col("__spos")).alias("shift_pos"),
        flag(F.col("__sneg")).alias("shift_neg"),
    )


_CUSUM_SQL = f"""
WITH daily AS (
  SELECT o_orderdate AS day,
         sum((o_totalprice::DECIMAL(12,2) * 100)::BIGINT)::BIGINT AS revc
  FROM orders GROUP BY day
),
s AS (SELECT count(*)::BIGINT AS m, sum(revc)::BIGINT AS total FROM daily),
d AS (SELECT day, revc, revc * s.m - s.total AS dd, s.m AS m FROM daily, s),
c AS (
  SELECT day, revc, m,
         sum(dd) OVER (ORDER BY day)::BIGINT AS c,
         sum(abs(dd)) OVER ()::BIGINT AS sumabs
  FROM d
),
x AS (
  SELECT day, revc, m, sumabs,
         c - min(c) OVER (ORDER BY day) AS spos,
         max(c) OVER (ORDER BY day) - c AS sneg
  FROM c
)
SELECT day, {sql_round("revc::DOUBLE / 100.0", 2)} AS rev,
       {sql_round("spos::DOUBLE / m::DOUBLE / 100.0", 4)} AS cusum_pos,
       {sql_round("sneg::DOUBLE / m::DOUBLE / 100.0", 4)} AS cusum_neg,
       spos::DOUBLE * m::DOUBLE > 4.0 * sumabs::DOUBLE AS shift_pos,
       sneg::DOUBLE * m::DOUBLE > 4.0 * sumabs::DOUBLE AS shift_neg
FROM x
"""


ACF_MAX_LAG = 14


def revenue_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily revenue at lags 1..{max_lag}
    — the seasonality screen behind every forecasting pipeline (a
    weekly cycle shows as a lag-7 peak). r_k = Σ d_i·d_{{i+k}} / Σ d_i²
    over mean-centered values d_i = m·rev_i − total, which are EXACT
    BIGINT cents-scaled integers (the scaling cancels in the ratio);
    products run in double over a DAY-SORTED fold so the IEEE op
    sequence is engine-identical (|d| < 2^53 ⇒ the int→double
    conversion is exact).

    Scale shape: the daily aggregate is the only fact-table work; the
    centered series collects into ONE calendar-bounded array row
    (~2.4k days) and all {max_lag} lag folds are row-local array math
    — no self-join, no window, one shuffle.
    """
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        ).alias("revc")
    )
    stats = daily.agg(
        F.count(F.lit(1)).alias("__m"), F.sum("revc").alias("__total")
    )
    d = daily.crossJoin(F.broadcast(stats)).select(
        "day",
        (F.col("revc") * F.col("__m") - F.col("__total"))
        .cast("double")
        .alias("__d"),
    )
    series = d.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "__d"))),
            lambda x: x["__d"],
        ).alias("__s")
    )
    den = F.aggregate(
        F.col("__s"), F.lit(0.0), lambda acc, v: acc + v * v
    )
    lagged = series.select(
        F.col("__s"),
        den.alias("__den"),
        F.explode(
            F.sequence(F.lit(1), F.lit(ACF_MAX_LAG))
        ).alias("lag"),
    )
    # r_k: fold pairs (s[i], s[i+k]) — zip the array with its k-shifted
    # self; slice lengths stay positive for any realistic calendar
    num = F.aggregate(
        F.zip_with(
            F.slice(F.col("__s"), 1, F.size("__s") - F.col("lag")),
            F.slice(
                F.col("__s"),
                F.col("lag") + 1,
                F.size("__s") - F.col("lag"),
            ),
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return lagged.select(
        F.col("lag").cast("long").alias("lag"),
        round_to(num / F.col("__den"), 6).alias("acf"),
    )


# exactly representable in binary — (1 - a) introduces no literal drift
HOLT_ALPHA, HOLT_BETA = 0.5, 0.25


def revenue_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing over daily revenue —
    the forecasting primitive behind capacity planning (CUSUM detects
    shifts, ACF screens seasonality; Holt extrapolates): level l and
    trend b update per day as l' = α·y + (1−α)(l+b),
    b' = β(l'−l) + (1−β)b, initialized l=y₁, b=0. The recursive
    statistic becomes ONE left fold over the day-sorted series (the
    CUSUM/ACF shape) carrying (l, b, Σ|one-step error|) as the
    accumulator — inherently sequential math stays row-local array
    code, never a self-join or window chain. α, β and (1−α), (1−β) are
    exactly-representable binary literals, values are doubles from
    exact BIGINT cents, and the fold order is pinned by the sort — the
    IEEE sequence is engine-identical, so the oracle hash-checks a
    recursive forecast.

    Scale shape: the daily aggregate is the only fact-table work; the
    ~2.4k-day series folds in one calendar-bounded row. Output: final
    level/trend, the next-day forecast, and the in-sample one-step MAE
    (the honesty number every forecast should ship with)."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        ).alias("revc")
    )
    series = daily.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "revc"))),
            lambda x: x["revc"].cast("double") / F.lit(100.0),
        ).alias("__s")
    )
    a, b_ = HOLT_ALPHA, HOLT_BETA
    zero = F.struct(
        F.element_at("__s", 1).alias("l"),
        F.lit(0.0).alias("b"),
        F.lit(0.0).alias("sae"),
    )

    def step(acc, y):
        fc = acc["l"] + acc["b"]  # one-step forecast before seeing y
        new_l = F.lit(a) * y + F.lit(1 - a) * fc
        return F.struct(
            new_l.alias("l"),
            (F.lit(b_) * (new_l - acc["l"]) + F.lit(1 - b_) * acc["b"]).alias(
                "b"
            ),
            (acc["sae"] + F.abs(y - fc)).alias("sae"),
        )

    folded = series.select(
        F.size("__s").alias("__n"),
        F.aggregate(
            F.slice(F.col("__s"), 2, F.size("__s") - 1), zero, step
        ).alias("__h"),
    )
    return folded.select(
        F.col("__n").cast("long").alias("n_days"),
        round_to(F.col("__h.l"), 6).alias("level"),
        round_to(F.col("__h.b"), 6).alias("trend"),
        round_to(F.col("__h.l") + F.col("__h.b"), 6).alias("forecast_next"),
        round_to(
            F.col("__h.sae") / (F.col("__n") - 1).cast("double"), 6
        ).alias("mae"),
    )


HW_GAMMA = 0.25


def revenue_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal smoothing over daily revenue —
    the third member of the exponential-smoothing family (SES → Holt →
    Holt-Winters), adding a 7-slot day-of-week seasonal state to Holt's
    level+trend: l' = α(y − s_dow) + (1−α)(l+b), b' = β(l'−l) + (1−β)b,
    s_dow' = γ(y − l − b) + (1−γ)s_dow. Seasonal slots key on the
    CALENDAR day-of-week (epoch-day mod 7 — exact integer arithmetic in
    both engines), not series position, so calendar gaps in the daily
    series can't rotate the season. Initialization l=y₁, b=0, s=0⃗ (the
    seasonal profile is learned through γ, documented variant).

    Like Holt/CUSUM/ACF, the recursion is ONE left fold over the
    day-sorted series — the accumulator carries (l, b, Σ|err|, s₀..s₆)
    and each element is a (y, dow) pair; coefficients 0.5/0.25 are
    exactly-representable binary literals, so the IEEE sequence is
    engine-identical and the oracle hash-checks a seasonal forecast.
    Scale shape: the daily aggregate is the only fact-table work; the
    fold is one calendar-bounded row."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        ).alias("revc")
    )
    series = daily.agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "day",
                        "revc",
                        (
                            F.datediff(F.col("day"), F.lit("1970-01-01")) % 7
                        ).alias("dow"),
                    )
                )
            ),
            lambda x: F.array(
                x["revc"].cast("double") / F.lit(100.0),
                x["dow"].cast("double"),
            ),
        ).alias("__s"),
        ((F.datediff(F.max("day"), F.lit("1970-01-01")) + 1) % 7).alias(
            "__dow_next"
        ),
    )
    a, b_, g = HOLT_ALPHA, HOLT_BETA, HW_GAMMA
    zero = F.struct(
        F.element_at(F.element_at("__s", 1), 1).alias("l"),
        F.lit(0.0).alias("b"),
        F.lit(0.0).alias("sae"),
        F.array_repeat(F.lit(0.0), 7).alias("s"),
    )

    def step(acc, x):
        y = F.element_at(x, 1)
        slot = F.element_at(x, 2).cast("int")  # 0-based dow
        snead = F.element_at(acc["s"], slot + 1)
        fc = acc["l"] + acc["b"] + snead
        new_l = F.lit(a) * (y - snead) + F.lit(1 - a) * (acc["l"] + acc["b"])
        return F.struct(
            new_l.alias("l"),
            (F.lit(b_) * (new_l - acc["l"]) + F.lit(1 - b_) * acc["b"]).alias(
                "b"
            ),
            (acc["sae"] + F.abs(y - fc)).alias("sae"),
            F.transform(
                acc["s"],
                lambda v, i: F.when(
                    i == slot,
                    F.lit(g) * (y - acc["l"] - acc["b"])
                    + F.lit(1 - g) * snead,
                ).otherwise(v),
            ).alias("s"),
        )

    folded = series.select(
        F.size("__s").alias("__n"),
        F.col("__dow_next"),
        F.aggregate(
            F.slice(F.col("__s"), 2, F.size("__s") - 1), zero, step
        ).alias("__h"),
    )
    return folded.select(
        F.col("__n").cast("long").alias("n_days"),
        round_to(F.col("__h.l"), 6).alias("level"),
        round_to(F.col("__h.b"), 6).alias("trend"),
        round_to(
            F.element_at(F.col("__h.s"), F.col("__dow_next") + 1), 6
        ).alias("season_next"),
        round_to(
            F.col("__h.l")
            + F.col("__h.b")
            + F.element_at(F.col("__h.s"), F.col("__dow_next") + 1),
            6,
        ).alias("forecast_next"),
        round_to(
            F.col("__h.sae") / (F.col("__n") - 1).cast("double"), 6
        ).alias("mae"),
    )


# DuckDB twin of the fold: acc = [l, b, sae, s0..s6] (10 doubles),
# element x = [y, dow]. Repeated subexpressions (new_l, s_dow) are
# textual macros — the oracle replays the identical IEEE sequence.
_HW_SNEAD = "acc[4 + (x[2])::INT]"  # s-slot k (0-based dow) is acc[4+k]
_HW_NEWL = (
    f"({HOLT_ALPHA} * (x[1] - {_HW_SNEAD}) "
    f"+ {1 - HOLT_ALPHA} * (acc[1] + acc[2]))"
)

_HW_SQL = f"""
WITH daily AS (
  SELECT o_orderdate AS day,
         sum((o_totalprice::DECIMAL(12,2) * 100)::BIGINT)::BIGINT AS revc
  FROM orders GROUP BY day
),
s AS (
  SELECT
    list_transform(
      list(
        [revc::DOUBLE / 100.0,
         (datediff('day', DATE '1970-01-01', day::DATE) % 7)::DOUBLE]
        ORDER BY day),
      v -> v) AS ys,
    ((datediff('day', DATE '1970-01-01', max(day)::DATE) + 1) % 7) AS dow_next
  FROM daily
),
f AS (
  SELECT len(ys) AS n, dow_next,
    list_reduce(
      list_prepend([ys[1][1], 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
                   ys[2:]),
      (acc, x) -> [
        {_HW_NEWL},
        {HOLT_BETA} * ({_HW_NEWL} - acc[1]) + {1 - HOLT_BETA} * acc[2],
        acc[3] + abs(x[1] - (acc[1] + acc[2] + {_HW_SNEAD}))
      ] || list_transform(acc[4:], (v, i) ->
        CASE WHEN i = (x[2])::INT + 1
             THEN {HW_GAMMA} * (x[1] - acc[1] - acc[2])
                  + {1 - HW_GAMMA} * {_HW_SNEAD}
             ELSE v END)
    ) AS h
  FROM s
)
SELECT n::BIGINT AS n_days,
       {sql_round("h[1]", 6)} AS level,
       {sql_round("h[2]", 6)} AS trend,
       {sql_round("h[4 + dow_next]", 6)} AS season_next,
       {sql_round("h[1] + h[2] + h[4 + dow_next]", 6)} AS forecast_next,
       {sql_round("h[3] / (n - 1)::DOUBLE", 6)} AS mae
FROM f
"""


_HOLT_SQL = f"""
WITH daily AS (
  SELECT o_orderdate AS day,
         sum((o_totalprice::DECIMAL(12,2) * 100)::BIGINT)::BIGINT AS revc
  FROM orders GROUP BY day
),
s AS (SELECT list(revc::DOUBLE / 100.0 ORDER BY day) AS ys FROM daily),
f AS (
  SELECT len(ys) AS n,
    list_reduce(
      list_prepend([ys[1], 0.0, 0.0],
                   list_transform(ys[2:], y -> [y])),
      (acc, x) -> [
        {HOLT_ALPHA} * x[1] + {1 - HOLT_ALPHA} * (acc[1] + acc[2]),
        {HOLT_BETA} * (({HOLT_ALPHA} * x[1] + {1 - HOLT_ALPHA} * (acc[1] + acc[2])) - acc[1])
          + {1 - HOLT_BETA} * acc[2],
        acc[3] + abs(x[1] - (acc[1] + acc[2]))
      ]
    ) AS h
  FROM s
)
SELECT n::BIGINT AS n_days,
       {sql_round("h[1]", 6)} AS level,
       {sql_round("h[2]", 6)} AS trend,
       {sql_round("h[1] + h[2]", 6)} AS forecast_next,
       {sql_round("h[3] / (n - 1)::DOUBLE", 6)} AS mae
FROM f
"""


_ACF_SQL = f"""
WITH daily AS (
  SELECT o_orderdate AS day,
         sum((o_totalprice::DECIMAL(12,2) * 100)::BIGINT)::BIGINT AS revc
  FROM orders GROUP BY day
),
s AS (SELECT count(*)::BIGINT AS m, sum(revc)::BIGINT AS total FROM daily),
d AS (
  SELECT day, (revc * s.m - s.total)::DOUBLE AS dd FROM daily, s
),
series AS (
  SELECT list(dd ORDER BY day) AS sv FROM d
),
base AS (
  SELECT sv,
    list_reduce(list_prepend(0.0::DOUBLE,
      list_transform(sv, v -> v * v)), (a, b) -> a + b) AS den,
    unnest(range(1, {ACF_MAX_LAG + 1})) AS lag
  FROM series
)
SELECT lag::BIGINT AS lag,
  {sql_round(
      "list_reduce(list_prepend(0.0::DOUBLE, "
      "list_transform(range(1, len(sv) - lag + 1), "
      "i -> sv[i] * sv[i + lag])), (a, b) -> a + b) / den", 6)} AS acf
FROM base
"""



def priority_mix_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence screen for order-priority mix by year —
    the drift test that answers "did the categorical mix shift?"
    (market mix, label distribution, A/B ramp checks). Per year:
    chi2 contribution Sum_p (o - e)^2 / e with expected counts from
    the year x priority margins; the global statistic is the sum of
    the rows, dof = (n_years - 1)(n_priorities - 1).

    Portability: every count is exact BIGINT; expected counts and the
    statistic are doubles derived from those int64s (exact conversion)
    folded in priority order per year — identical IEEE sequence in the
    oracle. Scale shape: one map-side-combined count aggregate, two
    tiny margin aggregates joined back broadcast, one per-year fold.
    """
    o = t(spark, sf_dir, "orders")
    cell = o.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.col("o_orderpriority").alias("pri"),
    ).agg(F.count(F.lit(1)).alias("o_cnt"))
    rowm = cell.groupBy("yr").agg(F.sum("o_cnt").alias("row_n"))
    colm = cell.groupBy("pri").agg(F.sum("o_cnt").alias("col_n"))
    tot = cell.agg(F.sum("o_cnt").alias("grand_n"))
    joined = (
        cell.join(F.broadcast(colm), "pri")
        .join(rowm, "yr")
        .crossJoin(F.broadcast(tot))
    )
    per_year = joined.groupBy("yr", "row_n", "grand_n").agg(
        F.sort_array(
            F.collect_list(F.struct("pri", "o_cnt", "col_n"))
        ).alias("__cells")
    )
    gn = F.col("grand_n").cast("double")
    rn = F.col("row_n").cast("double")
    chi2 = F.aggregate(
        F.col("__cells"),
        F.lit(0.0),
        lambda acc, s: acc
        + (
            (s["o_cnt"].cast("double") - rn * s["col_n"].cast("double") / gn)
            * (s["o_cnt"].cast("double") - rn * s["col_n"].cast("double") / gn)
        )
        / (rn * s["col_n"].cast("double") / gn),
    )
    return per_year.select(
        F.col("yr").cast("long").alias("yr"),
        F.col("row_n").cast("long").alias("n_orders"),
        round_to(chi2, 6).alias("chi2_contrib"),
    )


_CHI2_SQL = f"""
WITH cell AS (
  SELECT year(o_orderdate) AS yr, o_orderpriority AS pri,
         count(*)::BIGINT AS o_cnt
  FROM orders GROUP BY yr, pri
),
rowm AS (SELECT yr, sum(o_cnt)::BIGINT AS row_n FROM cell GROUP BY yr),
colm AS (SELECT pri, sum(o_cnt)::BIGINT AS col_n FROM cell GROUP BY pri),
tot AS (SELECT sum(o_cnt)::BIGINT AS grand_n FROM cell),
per AS (
  SELECT c.yr, r.row_n, t.grand_n,
         list(struct_pack(pri := c.pri, o_cnt := c.o_cnt, col_n := m.col_n)
              ORDER BY c.pri, c.o_cnt, m.col_n) AS cells
  FROM cell c JOIN colm m USING (pri) JOIN rowm r USING (yr), tot t
  GROUP BY c.yr, r.row_n, t.grand_n
)
SELECT yr::BIGINT AS yr, row_n AS n_orders,
  {sql_round(
      "list_reduce(list_prepend(0.0::DOUBLE, list_transform(cells, "
      "s -> (s.o_cnt::DOUBLE - row_n::DOUBLE * s.col_n::DOUBLE / grand_n::DOUBLE)"
      " * (s.o_cnt::DOUBLE - row_n::DOUBLE * s.col_n::DOUBLE / grand_n::DOUBLE)"
      " / (row_n::DOUBLE * s.col_n::DOUBLE / grand_n::DOUBLE))), "
      "(a, b) -> a + b)", 6)} AS chi2_contrib
FROM per
"""



BOOT_REPLICAS = 32
# Poisson(1) CDF thresholds for the inverse-CDF draw (capped at 5;
# truncated mass 6e-5 — the SAME literals in both engines, so the cap
# is part of the deterministic contract, not an approximation error)
BOOT_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
)


def poisson_bootstrap_means(
    values: DataFrame, *, id_col: str, cents_col: str, replicas: int
) -> DataFrame:
    """Replica means of the Poisson bootstrap over an exact BIGINT-cents
    column: each (row, replica) draws a deterministic Poisson(1)
    multiplicity (inverse-CDF on an md5 of "b:id"), replicas aggregate
    weighted sums map-side. Returns one row per replica, column ``m``
    (the replica's mean in currency units). Factored out of
    :func:`bootstrap_mean_ci` so the statistical contract — CI width
    shrinks ~1/sqrt(n) with sample size, replica count only refines the
    SAME width estimate — is property-testable at other (n, B) points
    (tests/test_properties.py) while the catalog query stays
    hash-pinned."""
    rep = values.select(
        id_col,
        cents_col,
        F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("b"),
    )
    # replica index FIRST: as a suffix, consecutive b values only
    # append one digit to the hash input, leaving replicas with
    # near-identical draws per row (measured: replicas 0-9 collapsed);
    # as a prefix every replica's input diverges immediately. md5 (JVM
    # codegen) instead of the HOF char-fold: the fold cost 4 us/row
    # over 4.8M (rows x replicas) rows — 20 s of pure hashing.
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("b").cast("string"),
                        F.lit(":"),
                        F.col(id_col).cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4503599627370496.0)  # 16^13
    )
    w = F.lit(5)
    for k in range(len(BOOT_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(BOOT_CDF[k]), F.lit(k)).otherwise(w)
    return (
        rep.select(
            "b", (F.col(cents_col) * w).alias("__wx"), w.alias("__w")
        )
        .groupBy("b")
        .agg(F.sum("__wx").alias("sx"), F.sum("__w").alias("sw"))
        .select(
            (F.col("sx").cast("double") / F.col("sw").cast("double") / 100.0)
            .alias("m")
        )
    )


def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON BOOTSTRAP confidence interval for mean order value —
    the distributed bootstrap (Chamandy et al., Google 2012): classic
    resampling-with-replacement needs global coordination, but for
    large n the replica multiplicity of each row is ~Poisson(1), which
    is a ROW-LOCAL draw — here a deterministic inverse-CDF lookup on
    the portable char-hash of (orderkey, replica), so every engine
    replays the exact same resamples. {B} replicas explode row-local,
    weighted sums stay exact BIGINT cents, and the CI is an order-
    statistic cut of the sorted replica means (indices 2 and {B}-1 of
    {B}: the ~5th/95th percentiles, no interpolation). One scan, one
    32-way aggregate, one 32-row fold."""
    # spread: the single-row-group test scan would serialize 32x the
    # rows of per-row hashing on one core (see CLAUDE.md)
    o = spread(t(spark, sf_dir, "orders")).select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    means = poisson_bootstrap_means(
        o, id_col="o_orderkey", cents_col="cents", replicas=BOOT_REPLICAS
    )
    overall = t(spark, sf_dir, "orders").agg(
        (
            F.sum((F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
            .cast("double")
            / F.count(F.lit(1)).cast("double")
            / 100.0
        ).alias("point")
    )
    arr = means.agg(F.sort_array(F.collect_list("m")).alias("ms"))
    return arr.crossJoin(F.broadcast(overall)).select(
        F.lit(BOOT_REPLICAS).cast("long").alias("n_replicas"),
        round_to(F.col("point"), 4).alias("mean"),
        round_to(F.element_at("ms", 2), 4).alias("ci_lo"),
        round_to(F.element_at("ms", BOOT_REPLICAS - 1), 4).alias("ci_hi"),
    )


def _bootstrap_sql() -> str:
    cases = "5"
    for k in range(len(BOOT_CDF) - 1, -1, -1):
        cases = f"CASE WHEN u < {BOOT_CDF[k]!r} THEN {k} ELSE {cases} END"
    chash = (
        "list_reduce(list_prepend(0::BIGINT, "
        "list_transform(string_split(substring("
        "md5(b::VARCHAR || ':' || o_orderkey::VARCHAR), 1, 13), ''), "
        "c -> (strpos('0123456789abcdef', c) - 1)::BIGINT)), "
        "(a, x) -> a * 16 + x)"
    )
    return f"""
WITH o AS (
  SELECT o_orderkey, (o_totalprice::DECIMAL(12,2) * 100)::BIGINT AS cents
  FROM orders
),
rep AS (
  SELECT o_orderkey, cents, unnest(range(0, {BOOT_REPLICAS})) AS b FROM o
),
uw AS (
  SELECT cents, b, ({chash})::DOUBLE / 4503599627370496.0 AS u FROM rep
),
wt AS (SELECT cents, b, ({cases}) AS w FROM uw),
means AS (
  SELECT b, sum(cents * w)::DOUBLE / sum(w)::DOUBLE / 100.0 AS m
  FROM wt GROUP BY b
),
arr AS (SELECT list(m ORDER BY m) AS ms FROM means),
overall AS (
  SELECT sum(cents)::DOUBLE / count(*)::DOUBLE / 100.0 AS point FROM o
)
SELECT {BOOT_REPLICAS}::BIGINT AS n_replicas,
       {sql_round("overall.point", 4)} AS mean,
       {sql_round("ms[2]", 4)} AS ci_lo,
       {sql_round("ms[" + str(BOOT_REPLICAS - 1) + "]", 4)} AS ci_hi
FROM arr, overall
"""



def events_dow_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour activity heatmap — the load-profile query
    behind capacity planning and anomaly baselines: event count and
    distinct users per (ISO weekday, hour) cell, plus each cell's
    share of its weekday (identically-derived doubles). One map-side-
    combined aggregate over the scan; 168 output cells at any scale."""
    e = t(spark, sf_dir, "events")
    cell = e.groupBy(
        F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    day = cell.groupBy("dow").agg(F.sum("n_events").alias("__day_n"))
    return cell.join(day, "dow").select(
        F.col("dow").cast("long").alias("dow"),
        F.col("hour").cast("long").alias("hour"),
        "n_events",
        "n_users",
        round_to(
            F.col("n_events").cast("double") / F.col("__day_n").cast("double"),
            6,
        ).alias("day_share"),
    )


_DOW_HOUR_SQL = f"""
WITH cell AS (
  SELECT dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS dow,
         hour(CAST(ts AS TIMESTAMP)) AS hour,
         count(*)::BIGINT AS n_events,
         count(DISTINCT user_id)::BIGINT AS n_users
  FROM events GROUP BY 1, 2
),
day AS (SELECT dow, sum(n_events)::BIGINT AS day_n FROM cell GROUP BY dow)
SELECT c.dow::BIGINT AS dow, c.hour::BIGINT AS hour, c.n_events, c.n_users,
       {sql_round("c.n_events::DOUBLE / d.day_n::DOUBLE", 6)} AS day_share
FROM cell c JOIN day d USING (dow)
"""


# ---------------------------------------------------------------------------
# hierarchical ratio-to-parent rollup
# ---------------------------------------------------------------------------


def region_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per customer nation with each nation's share of its
    region — the ratio-to-parent report every hierarchy rollup needs.
    Region totals are re-aggregated from the nation level and broadcast
    back (never a second scan of the fact table); shares divide two
    identically-rounded totals, so the oracle reproduces them exactly.
    """
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nation_rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round_to(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    region_tot = nation_rev.groupBy("r_name").agg(
        F.sum("revenue").alias("__rtot")
    )
    return nation_rev.join(F.broadcast(region_tot), "r_name").select(
        "r_name",
        "n_name",
        "revenue",
        round_to(F.col("revenue") / F.col("__rtot"), 6).alias("region_share"),
    )


_REGION_SHARE_SQL = f"""
WITH nation_rev AS (
  SELECT r.r_name, n.n_name, {sql_round("sum(o.o_totalprice)", 2)} AS revenue
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
),
region_tot AS (SELECT r_name, sum(revenue) AS rtot FROM nation_rev GROUP BY r_name)
SELECT nr.r_name, nr.n_name, nr.revenue,
       {sql_round("nr.revenue / rt.rtot", 6)} AS region_share
FROM nation_rev nr JOIN region_tot rt USING (r_name)
"""


# ---------------------------------------------------------------------------
# Benford first-digit data-quality check
# ---------------------------------------------------------------------------

_BENFORD_EXPECTED = {d: __import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10)}


def benford_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen over o_totalprice: observed first-digit
    shares vs the log10(1 + 1/d) expectation — the fraud/synthetic-data
    smell test an ingest DQ suite runs on money columns.

    The first digit comes from the DECIMAL(12,2) string rendering
    (identical in both engines), NOT floor(x/10^floor(log10 x)) — libm
    log10 is not guaranteed correctly rounded at power-of-ten edges.
    Expected shares are Python-computed literals injected into BOTH
    engines, so the comparison is bit-identical by construction.
    """
    o = t(spark, sf_dir, "orders")
    digit = F.substring(
        F.col("o_totalprice").cast("decimal(12,2)").cast("string"), 1, 1
    ).cast("int")
    counts = o.groupBy(digit.alias("digit")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    total = o.agg(F.count(F.lit(1)).alias("__total"))
    expected = F.element_at(
        F.create_map(
            *[
                x
                for d, p in sorted(_BENFORD_EXPECTED.items())
                for x in (F.lit(d), F.lit(p))
            ]
        ),
        F.col("digit"),
    )
    obs = F.col("n_orders").cast("double") / F.col("__total").cast("double")
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n_orders",
            round_to(obs, 6).alias("observed_share"),
            round_to(expected, 6).alias("expected_share"),
            round_to(F.abs(obs - expected), 6).alias("abs_deviation"),
        )
    )


def _benford_sql() -> str:
    case = " ".join(
        f"WHEN {d} THEN {p!r}" for d, p in sorted(_BENFORD_EXPECTED.items())
    )
    return f"""
WITH d AS (
  SELECT substring(CAST(o_totalprice AS DECIMAL(12,2))::VARCHAR, 1, 1)::INTEGER
           AS digit
  FROM orders
),
tot AS (SELECT count(*)::BIGINT AS total FROM d),
c AS (SELECT digit, count(*)::BIGINT AS n_orders FROM d GROUP BY digit)
SELECT c.digit, c.n_orders,
       {sql_round("c.n_orders::DOUBLE / tot.total::DOUBLE", 6)} AS observed_share,
       {sql_round("CASE c.digit " + case + " END", 6)} AS expected_share,
       {sql_round(
           "abs(c.n_orders::DOUBLE / tot.total::DOUBLE"
           " - (CASE c.digit " + case + " END))",
           6,
       )} AS abs_deviation
FROM c CROSS JOIN tot
"""


def _copurchase_edges(
    spark: SparkSession, sf_dir: str, *, support: int
) -> DataFrame:
    """Co-purchase edges (u < v part pairs in >= ``support`` common
    orders) WITHOUT a self-join: collect each order's (distinct,
    sorted) parts once and enumerate ordered pairs as an array
    expression — one shuffle replaces the join's two-sided exchange
    (measured ~30% on the edge build; identical pair multiset). The
    support threshold keeps edge count linear in baskets."""
    basket = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
    )
    pairs = basket.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ps"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ps"), i + 2, F.size(F.col("ps"))),
                        lambda y: F.struct(x.alias("u"), y.alias("v")),
                    ),
                )
            )
        ).alias("p")
    )
    return (
        pairs.select("p.u", "p.v")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= support)
        .select("u", "v")
    )


KCORE_K, KCORE_ROUNDS = 2, 4


def copurchase_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-core decomposition of the co-purchase graph
    (operators/graph.kcore): peel nodes below degree KCORE_K for
    KCORE_ROUNDS rounds, keeping edges between survivors — the degeneracy step that
    isolates the graph's dense backbone (community cores, recommender
    seeds) from the degree-1 fringe. Each round is one degree aggregate
    + two survivor semi-joins with the round's edge set
    localCheckpointed; output is every surviving node with its in-core
    degree and a converged flag proving the fixpoint was reached (on
    this graph the 2-core settles in 3 rounds; the 4th certifies it).
    The oracle replays the identical peel as materialized nested CTEs,
    so the hash pins every round's survivor set transitively."""
    from ..operators import graph

    e = _copurchase_edges(spark, sf_dir, support=2)
    return graph.kcore(e, k=KCORE_K, rounds=KCORE_ROUNDS)


def _kcore_sql() -> str:
    k, rounds = KCORE_K, KCORE_ROUNDS
    q = """
WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS MATERIALIZED (
  SELECT x.l_partkey AS u, y.l_partkey AS v
  FROM b x JOIN b y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
)"""
    prev = "e0"
    for r in range(1, rounds + 1):
        q += f""",
d{r} AS MATERIALIZED (
  SELECT n, count(*)::BIGINT AS deg
  FROM (SELECT u AS n FROM {prev} UNION ALL SELECT v AS n FROM {prev})
  GROUP BY 1),
k{r} AS MATERIALIZED (SELECT n FROM d{r} WHERE deg >= {k}),
e{r} AS MATERIALIZED (
  SELECT u, v FROM {prev}
  WHERE u IN (SELECT n FROM k{r}) AND v IN (SELECT n FROM k{r}))"""
        prev = f"e{r}"
    return q + f""",
final AS (
  SELECT n, count(*)::BIGINT AS deg
  FROM (SELECT u AS n FROM {prev} UNION ALL SELECT v AS n FROM {prev})
  GROUP BY 1)
SELECT n::BIGINT AS node, deg,
       coalesce((SELECT bool_and(deg >= {k}) FROM final), true) AS converged
FROM final
"""


LPA_ROUNDS = 3


def copurchase_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the co-purchase graph via deterministic
    synchronous label propagation (operators/graph.label_propagation —
    LPA_ROUNDS rounds, most-frequent-neighbor label, smallest-label
    ties): the modularity-free community pass that groups parts bought
    together, at a cost of rounds × (join + count + argmax) key
    shuffles. Where connected components answers "reachable at all",
    LPA splits dense regions into locally coherent groups. The oracle
    replays the identical synchronous rounds as materialized CTEs with
    a window argmax, pinning every round's label table transitively."""
    from ..operators import graph

    e = _copurchase_edges(spark, sf_dir, support=2)
    out = graph.label_propagation(e, rounds=LPA_ROUNDS)
    return out.select(
        F.col("node").cast("long").alias("node"),
        F.col("label").cast("long").alias("label"),
    )


def _lpa_sql() -> str:
    q = """
WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS MATERIALIZED (
  SELECT x.l_partkey AS u, y.l_partkey AS v
  FROM b x JOIN b y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
e AS MATERIALIZED (
  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
),
l0 AS MATERIALIZED (
  SELECT DISTINCT u AS node, u AS label FROM e
)"""
    for r in range(1, LPA_ROUNDS + 1):
        q += f""",
l{r} AS MATERIALIZED (
  SELECT u AS node, label FROM (
    SELECT e.u, l.label,
           row_number() OVER (PARTITION BY e.u
                              ORDER BY count(*) DESC, l.label) AS rn
    FROM e JOIN l{r - 1} l ON e.v = l.node
    GROUP BY e.u, l.label
  ) WHERE rn = 1
)"""
    return q + f"""
SELECT node::BIGINT AS node, label::BIGINT AS label FROM l{LPA_ROUNDS}
"""


def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the co-purchase graph: parts are linked when
    they appear in >= 2 common orders (the basket-bounded self-join
    from part_pair_affinity, support-thresholded so edge count stays
    linear in baskets). Counting uses DEGREE-ORIENTED wedge generation
    (operators/graph.triangle_stats): every edge points at its
    higher-(degree, id) endpoint, wedges spawn only at each pair's
    lowest apex — Σ outdeg² = O(m^1.5) work regardless of hub skew —
    and one join against the oriented edge set closes them. The oracle
    recounts with the orientation-free triple join (counts are
    orientation-invariant), so a green hash validates the oriented
    algorithm end-to-end."""
    from ..operators import graph

    e = _copurchase_edges(spark, sf_dir, support=2)
    out = graph.triangle_stats(e)
    return out.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        round_to(F.col("transitivity_raw"), 6).alias("transitivity"),
    )


_TRIANGLES_SQL = f"""
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT x.l_partkey AS u, y.l_partkey AS v
  FROM b x JOIN b y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
deg AS (
  SELECT n, count(*)::BIGINT AS deg
  FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
  GROUP BY 1
),
tri AS (
  SELECT count(*)::BIGINT AS t
  FROM e e1 JOIN e e2 ON e1.v = e2.u
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT (SELECT count(*) FROM deg)::BIGINT AS n_nodes,
       (SELECT count(*) FROM e)::BIGINT AS n_edges,
       (SELECT sum(deg * (deg - 1)) // 2 FROM deg)::BIGINT AS n_wedges,
       tri.t AS n_triangles,
       CASE WHEN (SELECT sum(deg * (deg - 1)) // 2 FROM deg) = 0 THEN 0.0
            ELSE {sql_round(
                "(3.0 * tri.t::DOUBLE) / ((SELECT sum(deg * (deg - 1)) // 2 FROM deg))::DOUBLE",
                6,
            )}
       END AS transitivity
FROM tri
"""


AA_MAX_DEG = 64  # apex hub cap — see docstring
AA_MIN_COMMON = 2
AA_TOPN = 20


def copurchase_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the co-purchase graph: Adamic-Adar and
    resource-allocation scores for part pairs that share >=
    AA_MIN_COMMON common neighbors but are NOT yet co-purchased — the
    classic "customers who bought these also bought" candidate ranker
    (Adamic & Adar 2003; Zhou et al. 2009 RA). Score = Σ over common
    neighbors z of 1/log2(deg z) (AA) and 1/deg z (RA): rare shared
    neighbors count more than promiscuous hubs.

    Scale shape: wedge generation at apex z costs Σ deg(z)², so
    apexes above AA_MAX_DEG are pruned — the standard LP hub cap
    (hubs contribute ~1/log2(big) ≈ nothing to the score while
    dominating the cost); with the cap, work is O(m·AA_MAX_DEG).
    Already-linked pairs leave via an anti-join on the edge set, and
    the output is a deterministic top-N by (aa desc, keys) — a
    TakeOrdered, never a corpus-sized sort (absolute score
    thresholds on degree-normalized scores empty as the graph grows).
    Float discipline: per-pair scores are LEFT FOLDS over the SORTED
    common-neighbor degree list (sort_array + F.aggregate), so the
    oracle's list_sort + list_reduce replays them bit-for-bit; apex
    degree >= 2 by construction (it has the two wedge endpoints), so
    log2(deg) >= 1 and neither fold divides by zero.

    The edge list feeds FIVE plan branches (adj twice, deg via adj
    twice, the anti-join once) — without materialization each branch
    re-runs the basket enumeration (measured 4.5 s -> 1.9 s at
    sf0.01); localCheckpoint the pair-bounded frame once, the
    iterative-operator convention."""
    e = _copurchase_edges(spark, sf_dir, support=2).localCheckpoint()
    adj = e.select(F.col("u").alias("z"), F.col("v").alias("nb")).unionByName(
        e.select(F.col("v").alias("z"), F.col("u").alias("nb"))
    )
    deg = adj.groupBy("z").agg(F.count(F.lit(1)).cast("long").alias("d"))
    apex = adj.join(deg, "z").where(F.col("d") <= AA_MAX_DEG)
    left = apex.select("z", F.col("nb").alias("pa"), "d")
    right = apex.select(F.col("z").alias("__z"), F.col("nb").alias("pb"))
    wedges = left.join(
        right,
        (F.col("z") == F.col("__z")) & (F.col("pa") < F.col("pb")),
    )
    cand = (
        wedges.groupBy("pa", "pb")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sort_array(F.collect_list("d")).alias("__ds"),
        )
        .where(F.col("n_common") >= AA_MIN_COMMON)
        .join(
            e,
            (F.col("pa") == F.col("u")) & (F.col("pb") == F.col("v")),
            "left_anti",
        )
    )
    scored = cand.select(
        "pa",
        "pb",
        "n_common",
        F.aggregate(
            F.col("__ds"),
            F.lit(0.0),
            lambda acc, x: acc + F.lit(1.0) / F.log2(x.cast("double")),
        ).alias("__aa"),
        F.aggregate(
            F.col("__ds"),
            F.lit(0.0),
            lambda acc, x: acc + F.lit(1.0) / x.cast("double"),
        ).alias("__ra"),
    )
    return (
        scored.orderBy(F.col("__aa").desc(), "pa", "pb")
        .limit(AA_TOPN)
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            "n_common",
            round_to(F.col("__aa"), 6).alias("aa_score"),
            round_to(F.col("__ra"), 6).alias("ra_score"),
        )
    )


_LINKPRED_SQL = f"""
WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS MATERIALIZED (
  SELECT x.l_partkey AS u, y.l_partkey AS v
  FROM b x JOIN b y
    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
adj AS (SELECT u AS z, v AS nb FROM e UNION ALL SELECT v AS z, u AS nb FROM e),
deg AS (SELECT z, count(*)::BIGINT AS d FROM adj GROUP BY z),
apex AS (
  SELECT a.z, a.nb, dg.d FROM adj a JOIN deg dg USING (z)
  WHERE dg.d <= {AA_MAX_DEG}
),
wedges AS (
  SELECT x.nb AS pa, y.nb AS pb, x.d
  FROM apex x JOIN apex y ON x.z = y.z AND x.nb < y.nb
),
cand AS (
  SELECT pa, pb, count(*)::BIGINT AS n_common, list_sort(list(d)) AS ds
  FROM wedges GROUP BY pa, pb HAVING count(*) >= {AA_MIN_COMMON}
),
fresh AS (
  SELECT c.* FROM cand c LEFT JOIN e ON e.u = c.pa AND e.v = c.pb
  WHERE e.u IS NULL
),
scored AS (
  SELECT pa, pb, n_common,
    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      list_transform(ds, x -> CAST(1 AS DOUBLE) / log2(x))),
      (a, b) -> a + b) AS aa,
    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      list_transform(ds, x -> CAST(1 AS DOUBLE) / CAST(x AS DOUBLE))),
      (a, b) -> a + b) AS ra
  FROM fresh
)
SELECT pa AS part_a, pb AS part_b, n_common,
  {sql_round("aa", 6)} AS aa_score, {sql_round("ra", 6)} AS ra_score
FROM scored ORDER BY aa DESC, pa, pb LIMIT {AA_TOPN}
"""


LL_MAX_LAG = 7


def events_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between the daily click and purchase
    series: Pearson r of clicks(day) vs purchases(day + lag) for lag ∈
    [−7, +7] — the screen that answers "do clicks LEAD purchases, and
    by how many days" before anyone fits an attribution model. Two
    daily aggregates, a 15-way lag explode on the click side, one
    equi-join on the shifted day, and per-lag sufficient statistics
    (Σx, Σy, Σxy, Σx², Σy², n) as EXACT BIGINTs — r is then a pinned
    closed-form double, so the oracle hashes all 15 correlations.
    Bounded by days × lags, never event rows."""
    e = t(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            F.col("ts").cast("date").alias("day"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = daily.filter(F.col("event_type") == "click").select(
        F.col("day").alias("da"), F.col("n").alias("x")
    )
    b = daily.filter(F.col("event_type") == "purchase").select(
        F.col("day").alias("db"), F.col("n").alias("y")
    )
    lagged = a.withColumn(
        "lag", F.explode(F.sequence(F.lit(-LL_MAX_LAG), F.lit(LL_MAX_LAG)))
    ).withColumn("target", F.date_add(F.col("da"), F.col("lag")))
    j = lagged.join(b, lagged.target == b.db)
    s = j.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        F.col("lag").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n_days"),
        round_to(num / F.sqrt(denx * deny), 6).alias("r"),
    )


WILSON_Z = 1.96


def conversion_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score intervals for per-nation customer conversion (share
    of customers with at least one order) — the binomial CI that stays
    honest at small n and extreme rates, where the naive Wald interval
    collapses or escapes [0,1]. One semi-join marks converters, one
    aggregate per nation, and lo/hi are closed-form doubles from exact
    (k, n) BIGINTs with the z=1.96 literal shared across engines —
    identical IEEE trees, so the oracle hashes the intervals. This is
    the per-segment readout a growth dashboard should ship instead of
    bare rates."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = t(spark, sf_dir, "orders").select("o_custkey")
    n_ = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    conv = c.join(
        o.withColumnRenamed("o_custkey", "c_custkey").distinct(),
        "c_custkey",
        "semi",
    ).select("c_custkey", F.lit(1).alias("__k"))
    g = (
        c.join(conv.select("c_custkey", "__k"), "c_custkey", "left")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("__k"), F.lit(0))).alias("k"),
        )
        .join(F.broadcast(n_), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    z = F.lit(WILSON_Z)
    nn = F.col("n").cast("double")
    p = F.col("k").cast("double") / nn
    z2n = z * z / nn
    center = p + z2n / F.lit(2.0)
    half = z * F.sqrt(
        p * (F.lit(1.0) - p) / nn + z * z / (F.lit(4.0) * nn * nn)
    )
    denom = F.lit(1.0) + z2n
    return g.select(
        "n_name",
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        round_to(p, 6).alias("rate"),
        round_to((center - half) / denom, 6).alias("wilson_lo"),
        round_to((center + half) / denom, 6).alias("wilson_hi"),
    )


_WILSON_SQL = f"""
WITH conv AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders),
g AS (
  SELECT c_nationkey, count(*)::BIGINT AS n,
         sum(CASE WHEN conv.c_custkey IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
           AS k
  FROM customer LEFT JOIN conv USING (c_custkey)
  GROUP BY c_nationkey
)
SELECT n_name, n, k,
       {sql_round("k::DOUBLE / n::DOUBLE", 6)} AS rate,
       {sql_round(
           "((k::DOUBLE / n::DOUBLE + ({z} * {z} / n::DOUBLE) / 2.0)"
           " - {z} * sqrt((k::DOUBLE / n::DOUBLE)"
           " * (1.0 - k::DOUBLE / n::DOUBLE) / n::DOUBLE"
           " + {z} * {z} / (4.0 * n::DOUBLE * n::DOUBLE)))"
           " / (1.0 + {z} * {z} / n::DOUBLE)".format(z=WILSON_Z), 6)}
         AS wilson_lo,
       {sql_round(
           "((k::DOUBLE / n::DOUBLE + ({z} * {z} / n::DOUBLE) / 2.0)"
           " + {z} * sqrt((k::DOUBLE / n::DOUBLE)"
           " * (1.0 - k::DOUBLE / n::DOUBLE) / n::DOUBLE"
           " + {z} * {z} / (4.0 * n::DOUBLE * n::DOUBLE)))"
           " / (1.0 + {z} * {z} / n::DOUBLE)".format(z=WILSON_Z), 6)}
         AS wilson_hi
FROM g JOIN nation ON c_nationkey = n_nationkey
"""


KM_CENSOR_DAYS = 7


def users_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve over user lifetimes — the censoring-
    aware retention estimator (naive retention curves understate the
    tail because still-active users haven't churned YET): lifetime =
    days between a user's first and last event; users active within
    {c} days of the data horizon are right-censored (they count in the
    at-risk denominator but never as churn events). S(t) =
    Π_{{t_i ≤ t}} (1 − d_i/n_i) with deaths-before-censorings tie
    convention.

    Scale shape: one per-user aggregate, one duration-group aggregate,
    an at-risk reverse-cumulative window over DISTINCT durations
    (bounded by the calendar span, not user count), and the product
    folds once in duration order (sorted-fold rule) — each factor
    1 − d/n is a single division of exact BIGINTs, so the oracle
    hashes a survival curve."""
    e = t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    pu = e.groupBy("user_id").agg(
        F.min("day").alias("fd"), F.max("day").alias("ld")
    )
    hz = e.agg(F.max("day").alias("hz"))
    u = pu.crossJoin(F.broadcast(hz)).select(
        F.datediff("ld", "fd").cast("long").alias("t"),
        (F.datediff("hz", "ld") < KM_CENSOR_DAYS).alias("cens"),
    )
    g = u.groupBy("t").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum((~F.col("cens")).cast("long")).alias("d"),
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    c = g.withColumn(
        "__bef", F.coalesce(F.sum("m").over(w), F.lit(0).cast("long"))
    )
    tot = g.agg(F.sum("m").alias("__tot"))
    cc = c.crossJoin(F.broadcast(tot)).select(
        "t", "d", (F.col("__tot") - F.col("__bef")).alias("n_risk")
    )
    arr = cc.agg(
        F.array_sort(F.collect_list(F.struct("t", "d", "n_risk"))).alias(
            "__a"
        )
    )
    zero = F.struct(
        F.lit(1.0).alias("s"),
        F.array()
        .cast("array<struct<t:long,n_risk:long,d:long,s:double>>")
        .alias("out"),
    )

    def step(acc, x):
        s_new = acc["s"] * (
            F.lit(1.0)
            - x["d"].cast("double") / x["n_risk"].cast("double")
        )
        return F.struct(
            s_new.alias("s"),
            F.array_append(
                acc["out"],
                F.struct(
                    x["t"].alias("t"),
                    x["n_risk"].alias("n_risk"),
                    x["d"].alias("d"),
                    s_new.alias("s"),
                ),
            ).alias("out"),
        )

    rows = arr.select(
        F.explode(F.aggregate("__a", zero, step)["out"]).alias("r")
    )
    return rows.select(
        F.col("r.t").alias("duration_days"),
        F.col("r.n_risk").alias("n_risk"),
        F.col("r.d").alias("n_churned"),
        round_to(F.col("r.s"), 6).alias("survival"),
    )


_KM_SQL = f"""
WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP)::DATE AS day FROM events
),
pu AS (SELECT user_id, min(day) AS fd, max(day) AS ld FROM e GROUP BY 1),
hz AS (SELECT max(day) AS h FROM e),
u AS (
  SELECT datediff('day', fd, ld)::BIGINT AS t,
         (datediff('day', ld, h) < {KM_CENSOR_DAYS}) AS cens
  FROM pu, hz
),
g AS (
  SELECT t, count(*)::BIGINT AS m, sum((NOT cens)::INT)::BIGINT AS d
  FROM u GROUP BY t
),
c AS (
  SELECT t, d,
    (sum(m) OVER ())::BIGINT
      - coalesce(sum(m) OVER (ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
      AS n_risk
  FROM g
),
a AS (
  SELECT list([t::DOUBLE, d::DOUBLE, n_risk::DOUBLE] ORDER BY t) AS pts
  FROM c
),
f AS (
  SELECT list_reduce(
    list_prepend([1.0::DOUBLE], pts),
    (acc, x) -> acc || [x[1], x[3], x[2],
                        acc[-1] * (1.0 - x[2] / x[3])]
  ) AS acc
  FROM a
),
rows AS (
  SELECT unnest(list_transform(
    range(0, ((len(acc) - 1) // 4)::INT),
    k -> [acc[2 + 4 * k], acc[3 + 4 * k], acc[4 + 4 * k], acc[5 + 4 * k]]
  )) AS r
  FROM f
)
SELECT r[1]::BIGINT AS duration_days, r[2]::BIGINT AS n_risk,
       r[3]::BIGINT AS n_churned, {sql_round("r[4]", 6)} AS survival
FROM rows
"""


_LL_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS TIMESTAMP)::DATE AS day, event_type,
         count(*)::BIGINT AS n
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY 1, 2
),
a AS (SELECT day AS da, n AS x FROM daily WHERE event_type = 'click'),
b AS (SELECT day AS db, n AS y FROM daily WHERE event_type = 'purchase'),
lags AS (SELECT range::INT AS lag FROM range({-LL_MAX_LAG}, {LL_MAX_LAG + 1})),
j AS (
  SELECT l.lag, a.x, b.y
  FROM a CROSS JOIN lags l
  JOIN b ON b.db = a.da + to_days(l.lag)
),
s AS (
  SELECT lag, count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x * y)::BIGINT AS sxy,
         sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy
  FROM j GROUP BY lag
)
SELECT lag::BIGINT AS lag, n AS n_days,
       {sql_round(
           "(n::DOUBLE * sxy - sx * sy)::DOUBLE"
           " / sqrt((n::DOUBLE * sxx - sx * sx)::DOUBLE"
           " * (n::DOUBLE * syy - sy * sy)::DOUBLE)", 6)} AS r
FROM s
"""


def ab_mannwhitney_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test per event type between
    the two experiment arms — the NONPARAMETRIC partner of
    :func:`ab_test_events`'s Welch t (rank-based, so heavy tails and
    outliers can't fake a lift). Tie-aware throughout: average ranks
    via value-group counts, and the tie-corrected normal approximation
    z = (U_A − n_A n_B/2) / sqrt(n_A n_B/12 · ((n+1) − Σ(t³−t)/(n(n−1)))).

    Exactness discipline: ranks never materialize per row — value
    groups carry (n_v, na_v), the rank-sum folds as the INTEGER
    2·R_A = Σ na_v·(2·cum_before + n_v + 1), and every reported double
    derives from exact BIGINTs in a pinned expression tree, so the
    oracle hashes a rank test bit-for-bit. Scale shape: one value-group
    aggregate (map-side combined); the cumulative window partitions by
    type over DISTINCT VALUES (bounded by the value domain, not row
    count); one per-type rollup. NULL values are excluded on BOTH
    sides (a NULL has no rank; and Spark's window default NULLS FIRST
    vs DuckDB's NULLS LAST would otherwise shift every cumulative rank
    offset the moment a fixture gains a NULL value)."""
    e = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "value",
            ((F.col("user_id") % 2) == 0).alias("__ia"),
        )
    )
    g = e.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).alias("n_v"),
        F.sum(F.col("__ia").cast("long")).alias("na_v"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = g.withColumn(
        "__cum", F.coalesce(F.sum("n_v").over(w), F.lit(0).cast("long"))
    )
    s = c.groupBy("event_type").agg(
        F.sum(
            F.col("na_v") * (2 * F.col("__cum") + F.col("n_v") + 1)
        ).alias("__ra2"),
        F.sum("n_v").alias("__n"),
        F.sum("na_v").alias("__na"),
        F.sum(
            F.col("n_v") * F.col("n_v") * F.col("n_v") - F.col("n_v")
        ).alias("__t"),
    )
    na, n = F.col("__na"), F.col("__n")
    nb = n - na
    u2 = F.col("__ra2") - na * (na + 1)  # exact 2·U_A as BIGINT
    num = (u2 - na * nb).cast("double") / F.lit(2.0)
    var_term = (n + 1).cast("double") - F.col("__t").cast("double") / (
        n * (n - 1)
    ).cast("double")
    z = num / F.sqrt(
        (na * nb).cast("double") * var_term / F.lit(12.0)
    )
    return s.select(
        "event_type",
        na.alias("n_a"),
        nb.cast("long").alias("n_b"),
        round_to(u2.cast("double") / F.lit(2.0), 6).alias("u_a"),
        round_to(z, 6).alias("z"),
    )


_MWU_SQL = f"""
WITH e AS (
  SELECT event_type, value, (user_id % 2 = 0) AS ia FROM events
  WHERE value IS NOT NULL
),
g AS (
  SELECT event_type, value, count(*)::BIGINT AS n_v,
         sum(ia::INT)::BIGINT AS na_v
  FROM e GROUP BY 1, 2
),
c AS (
  SELECT *, coalesce(sum(n_v) OVER (
    PARTITION BY event_type ORDER BY value
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum
  FROM g
),
s AS (
  SELECT event_type,
         sum(na_v * (2 * cum + n_v + 1))::BIGINT AS ra2,
         sum(n_v)::BIGINT AS n, sum(na_v)::BIGINT AS na,
         sum(n_v * n_v * n_v - n_v)::BIGINT AS t
  FROM c GROUP BY 1
)
SELECT event_type, na AS n_a, (n - na)::BIGINT AS n_b,
       {sql_round("(ra2 - na * (na + 1))::DOUBLE / 2.0", 6)} AS u_a,
       {sql_round(
           "((ra2 - na * (na + 1) - na * (n - na))::DOUBLE / 2.0)"
           " / sqrt((na * (n - na))::DOUBLE"
           " * ((n + 1)::DOUBLE - t::DOUBLE / (n * (n - 1))::DOUBLE)"
           " / 12.0)", 6)} AS z
FROM s
"""


def ab_test_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t-test per event type between two experiment arms
    (user_id parity — the deterministic stand-in for an assignment
    service): ONE conditional aggregate produces exact DECIMAL
    sufficient statistics (Σv, Σv² — merge-order independent, the
    regr_price_by_brand convention; events.value is 2-decimal so the
    DECIMAL(18,6) cast is lossless), then mean / variance / t are
    closed-form scalar doubles with the identical expression tree in
    the oracle. The 100 TB shape: the scan reduces to #types × 6
    numbers; no per-arm rescans, no variance-of-variance passes."""
    e = t(spark, sf_dir, "events")
    dv = F.col("value").cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    zsq = F.lit(0).cast("decimal(37,12)")
    is_a = (F.col("user_id") % 2) == 0
    g = e.select("event_type", dv.alias("dv"), is_a.alias("ia")).groupBy(
        "event_type"
    )
    agg = g.agg(
        F.sum(F.when(F.col("ia"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~F.col("ia"), 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("ia"), F.col("dv")).otherwise(zero)).alias("s_a"),
        F.sum(F.when(~F.col("ia"), F.col("dv")).otherwise(zero)).alias("s_b"),
        F.sum(
            F.when(F.col("ia"), F.col("dv") * F.col("dv")).otherwise(zsq)
        ).alias("q_a"),
        F.sum(
            F.when(~F.col("ia"), F.col("dv") * F.col("dv")).otherwise(zsq)
        ).alias("q_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ma = F.col("s_a").cast("double") / na
    mb = F.col("s_b").cast("double") / nb
    va = (F.col("q_a").cast("double") - na * ma * ma) / (na - F.lit(1.0))
    vb = (F.col("q_b").cast("double") - nb * mb * mb) / (nb - F.lit(1.0))
    tstat = (ma - mb) / F.sqrt(va / na + vb / nb)
    return agg.select(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        round_to(ma, 6).alias("mean_a"),
        round_to(mb, 6).alias("mean_b"),
        round_to(tstat, 6).alias("welch_t"),
    )


_AB_TEST_SQL = f"""
WITH e AS (
  SELECT event_type, value::DECIMAL(18,6) AS dv,
         (user_id % 2 = 0) AS ia
  FROM events
),
agg AS (
  SELECT event_type,
    sum(CASE WHEN ia THEN 1 ELSE 0 END)::BIGINT AS n_a,
    sum(CASE WHEN NOT ia THEN 1 ELSE 0 END)::BIGINT AS n_b,
    sum(CASE WHEN ia THEN dv ELSE 0::DECIMAL(18,6) END) AS s_a,
    sum(CASE WHEN NOT ia THEN dv ELSE 0::DECIMAL(18,6) END) AS s_b,
    sum(CASE WHEN ia THEN dv * dv ELSE 0::DECIMAL(37,12) END) AS q_a,
    sum(CASE WHEN NOT ia THEN dv * dv ELSE 0::DECIMAL(37,12) END) AS q_b
  FROM e GROUP BY event_type
),
m AS (
  SELECT event_type, n_a, n_b,
    s_a::DOUBLE / n_a::DOUBLE AS ma, s_b::DOUBLE / n_b::DOUBLE AS mb,
    (q_a::DOUBLE - n_a::DOUBLE * (s_a::DOUBLE / n_a::DOUBLE)
       * (s_a::DOUBLE / n_a::DOUBLE)) / (n_a::DOUBLE - 1.0) AS va,
    (q_b::DOUBLE - n_b::DOUBLE * (s_b::DOUBLE / n_b::DOUBLE)
       * (s_b::DOUBLE / n_b::DOUBLE)) / (n_b::DOUBLE - 1.0) AS vb
  FROM agg
)
SELECT event_type, n_a, n_b,
  {sql_round("ma", 6)} AS mean_a,
  {sql_round("mb", 6)} AS mean_b,
  {sql_round(
      "(ma - mb) / sqrt(va / n_a::DOUBLE + vb / n_b::DOUBLE)", 6
  )} AS welch_t
FROM m
"""


def event_segment_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and the acting customer's
    market segment — the feature-dependence screen (is this categorical
    feature informative about that one?). Contingency cells come from
    one (type, segment) aggregate after a broadcast dim join; marginals
    re-aggregate the CELLS (never a second fact scan); and every
    entropy/MI sum folds over the (x, y)-sorted cell list so the IEEE
    summation order — and the hash — is engine-identical (the
    char_entropy convention; log2 is the one transcendental the
    catalog's oracle contract already relies on)."""
    e = t(spark, sf_dir, "events").select("user_id", "event_type")
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    j = e.join(F.broadcast(c), "user_id")
    cells = j.groupBy(
        F.col("event_type").alias("x"), F.col("segment").alias("y")
    ).agg(F.count(F.lit(1)).alias("nxy"))
    mx = cells.groupBy("x").agg(F.sum("nxy").alias("nx"))
    my = cells.groupBy("y").agg(F.sum("nxy").alias("ny"))
    tot = cells.agg(F.sum("nxy").alias("n"))
    full = (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
    )
    nn = F.col("n").cast("double")
    term = (F.col("nxy").cast("double") / nn) * F.log2(
        (F.col("nxy") * F.col("n")).cast("double")
        / (F.col("nx") * F.col("ny")).cast("double")
    )
    gathered = full.select(
        "x", "y", "n", term.alias("term"), F.col("nxy")
    ).agg(
        F.array_sort(
            F.collect_list(F.struct("x", "y", "term"))
        ).alias("terms"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.max("n").cast("long").alias("n_total"),
    )
    mi = F.aggregate(
        F.col("terms"), F.lit(0.0), lambda acc, s: acc + s["term"]
    )

    def marg_entropy(m: DataFrame, key: str) -> DataFrame:
        hterm = -(F.col("cnt").cast("double") / F.col("n").cast("double")) * F.log2(
            F.col("cnt").cast("double") / F.col("n").cast("double")
        )
        staged = m.crossJoin(F.broadcast(tot)).select(
            F.col(key).alias("k"), hterm.alias("ht")
        )
        return staged.agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("k", "ht"))),
                F.lit(0.0),
                lambda acc, s: acc + s["ht"],
            ).alias(f"h_{key}")
        )

    hx = marg_entropy(mx.select("x", F.col("nx").alias("cnt")), "x")
    hy = marg_entropy(my.select("y", F.col("ny").alias("cnt")), "y")
    return (
        gathered.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            "n_total",
            "n_cells",
            round_to(mi, 6).alias("mi_bits"),
            round_to(F.col("h_x"), 6).alias("h_event_type"),
            round_to(F.col("h_y"), 6).alias("h_segment"),
        )
    )


_MI_SQL = f"""
WITH j AS (
  SELECT e.event_type AS x, c.c_mktsegment AS y
  FROM events e JOIN customer c ON e.user_id = c.c_custkey
),
cells AS (SELECT x, y, count(*)::BIGINT AS nxy FROM j GROUP BY 1, 2),
mx AS (SELECT x, sum(nxy)::BIGINT AS nx FROM cells GROUP BY 1),
my AS (SELECT y, sum(nxy)::BIGINT AS ny FROM cells GROUP BY 1),
tot AS (SELECT sum(nxy)::BIGINT AS n FROM cells),
terms AS (
  SELECT c.x, c.y,
         (c.nxy::DOUBLE / t.n::DOUBLE)
           * log2((c.nxy * t.n)::DOUBLE / (m1.nx * m2.ny)::DOUBLE) AS term
  FROM cells c JOIN mx m1 USING (x) JOIN my m2 USING (y) CROSS JOIN tot t
),
mi AS (
  SELECT count(*)::BIGINT AS n_cells,
         list_reduce(list_prepend(0.0::DOUBLE, list(term ORDER BY x, y)),
                     (a, b) -> a + b) AS mi_raw
  FROM terms
),
hx AS (
  SELECT list_reduce(list_prepend(0.0::DOUBLE,
           list(-(nx::DOUBLE / t.n::DOUBLE) * log2(nx::DOUBLE / t.n::DOUBLE)
                ORDER BY x)), (a, b) -> a + b) AS h_x
  FROM mx CROSS JOIN tot t
),
hy AS (
  SELECT list_reduce(list_prepend(0.0::DOUBLE,
           list(-(ny::DOUBLE / t.n::DOUBLE) * log2(ny::DOUBLE / t.n::DOUBLE)
                ORDER BY y)), (a, b) -> a + b) AS h_y
  FROM my CROSS JOIN tot t
)
SELECT (SELECT n FROM tot) AS n_total, mi.n_cells,
       {sql_round("mi.mi_raw", 6)} AS mi_bits,
       {sql_round("(SELECT h_x FROM hx)", 6)} AS h_event_type,
       {sql_round("(SELECT h_y FROM hy)", 6)} AS h_segment
FROM mi
"""


def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen per event type: median absolute deviation
    instead of stddev, so a few extreme values can't inflate their own
    detection threshold (the failure mode of the z-score twin on
    heavy-tailed data). Two grouped exact percentiles (median, then
    median of |x - med|) with broadcast joins back; flag
    |x - med| > 3 * 1.4826 * MAD (the Gaussian-consistent scale).
    F.percentile and DuckDB quantile_cont share the interpolation rule
    (pinned since r01 by percentiles_by_type), so counts and rounded
    stats hash-match."""
    e = t(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med")
    )
    j = e.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = j.groupBy("event_type").agg(F.percentile("dev", 0.5).alias("mad"))
    full = j.join(F.broadcast(mad), "event_type")
    is_out = F.col("dev") > F.lit(3.0) * F.lit(1.4826) * F.col("mad")
    return full.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(is_out.cast("long")).alias("n_outliers"),
        round_to(F.max("med"), 6).alias("med"),
        round_to(F.max("mad"), 6).alias("mad"),
    )


_MAD_SQL = f"""
WITH v AS (SELECT event_type, value FROM events),
med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM v GROUP BY 1
),
j AS (
  SELECT v.event_type, v.value, med.med,
         abs(v.value - med.med) AS dev
  FROM v JOIN med USING (event_type)
),
mad AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM j GROUP BY 1)
SELECT j.event_type, count(*)::BIGINT AS n,
       sum((j.dev > 3.0 * 1.4826 * m.mad)::INT)::BIGINT AS n_outliers,
       {sql_round("max(j.med)", 6)} AS med,
       {sql_round("max(m.mad)", 6)} AS mad
FROM j JOIN mad m USING (event_type)
GROUP BY j.event_type
"""


TE_SMOOTH = 50  # pseudo-count weight toward the global mean


def target_encode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed TARGET ENCODING of a categorical feature — the ML-prep
    staple: each order-priority level maps to
    ``(Σ target + m * global_mean) / (n + m)`` so rare levels shrink
    toward the global mean instead of memorizing noise. Sums are exact
    DECIMAL (o_totalprice is 2-decimal), the global mean is broadcast
    back from the same aggregate (never a second scan), and the final
    arithmetic is scalar doubles with the identical expression tree in
    the oracle."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(12,2)").alias("dv"),
    )
    per = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.sum("dv").alias("s")
    )
    tot = per.agg(
        F.sum("n").alias("tn"), F.sum("s").alias("ts")
    )
    j = per.crossJoin(F.broadcast(tot))
    gmean = F.col("ts").cast("double") / F.col("tn").cast("double")
    enc = (F.col("s").cast("double") + F.lit(float(TE_SMOOTH)) * gmean) / (
        F.col("n").cast("double") + F.lit(float(TE_SMOOTH))
    )
    return j.select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n"),
        round_to(F.col("s").cast("double") / F.col("n").cast("double"), 6).alias(
            "level_mean"
        ),
        round_to(enc, 6).alias("encoded"),
    )


_TARGET_ENC_SQL = f"""
WITH per AS (
  SELECT o_orderpriority, count(*)::BIGINT AS n,
         sum(o_totalprice::DECIMAL(12,2)) AS s
  FROM orders GROUP BY 1
),
tot AS (SELECT sum(n)::BIGINT AS tn, sum(s) AS ts FROM per)
SELECT o_orderpriority, n,
  {sql_round("s::DOUBLE / n::DOUBLE", 6)} AS level_mean,
  {sql_round(
      f"(s::DOUBLE + {float(TE_SMOOTH)!r} * (ts::DOUBLE / tn::DOUBLE))"
      f" / (n::DOUBLE + {float(TE_SMOOTH)!r})",
      6,
  )} AS encoded
FROM per CROSS JOIN tot
"""


EDB_BUCKETS = 10


def equi_depth_bins_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth feature binning (each bin holds ~the same row count —
    the ML-prep partner of the equal-width histogram sketch): bucket
    assignment rides the distributed exact order-statistics machinery
    (selection.ntile_assign — percentile bracket + band top-k +
    broadcast cuts, no global sort), then one aggregate emits each
    bin's span and population. The oracle is the plain ntile window —
    the shared hash re-proves the scale path equals the textbook
    definition."""
    from ..operators import selection

    o = t(spark, sf_dir, "orders")
    binned = selection.ntile_assign(
        o, "o_totalprice", "o_orderkey", EDB_BUCKETS
    )
    return (
        binned.groupBy(F.col("bucket").cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_to(F.min("o_totalprice"), 2).alias("lo"),
            round_to(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


PSI_BINS, PSI_SPLIT = 10, "1998-04-01"


def price_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift screen — the ML-monitoring
    standard for "did this feature's distribution move between
    snapshots": the REFERENCE population (orders before {split}) sets
    10 equi-depth bin edges via the distributed exact order-statistics
    machinery (selection.ntile_assign — no global sort); both
    populations then bin by value against the broadcast 9-edge array,
    and PSI = Σ (p_cur − p_ref)·ln(p_cur/p_ref). Per-bin contributions
    ship alongside the total (the actionable part: WHICH decile
    drifted); the total folds in bin order (sorted-fold float rule),
    and ln of exact-count ratios is hash-portable (surprisal
    precedent). Rule of thumb: PSI < 0.1 stable, > 0.25 investigate.

    Scale shape: two scans (reference ntile + full tag), one tiny edge
    broadcast, one 10-row aggregate — no shuffle keyed on rows."""
    from ..operators import selection

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    split = F.to_timestamp(F.lit(PSI_SPLIT))
    ref = o.filter(F.col("o_orderdate") < split)
    refb = selection.ntile_assign(
        ref, "o_totalprice", "o_orderkey", PSI_BINS
    )
    edges = (
        refb.filter(F.col("bucket") < PSI_BINS)
        .groupBy("bucket")
        .agg(F.min("o_totalprice").alias("e"))
        .agg(F.array_sort(F.collect_list("e")).alias("edges"))
    )
    tagged = o.crossJoin(F.broadcast(edges)).select(
        (F.col("o_orderdate") >= split).alias("is_cur"),
        (
            1
            + F.size(
                F.filter(
                    F.col("edges"),
                    lambda e: F.col("o_totalprice") < e,
                )
            )
        ).alias("bin"),
    )
    counts = tagged.groupBy("bin").agg(
        F.sum((~F.col("is_cur")).cast("long")).alias("n_ref"),
        F.sum(F.col("is_cur").cast("long")).alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").alias("__tr"), F.sum("n_cur").alias("__tc")
    )
    pr = F.col("n_ref").cast("double") / F.col("__tr").cast("double")
    pc = F.col("n_cur").cast("double") / F.col("__tc").cast("double")
    c2 = counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_ref",
        "n_cur",
        F.when(
            (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
            (pc - pr) * F.log(pc / pr),
        )
        .otherwise(F.lit(0.0))
        .alias("__contrib"),
    )
    psi = c2.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("bin", "__contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["__contrib"],
        ).alias("__psi")
    )
    return c2.crossJoin(F.broadcast(psi)).select(
        F.col("bin").cast("long").alias("bin"),
        "n_ref",
        "n_cur",
        round_to(F.col("__contrib"), 6).alias("contrib"),
        round_to(F.col("__psi"), 6).alias("psi"),
    )


QT_BUCKET_WIDTH = 50_000.0


def totalprice_quantile_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile (empirical-CDF) feature transform — the rank-based
    normalization ML pipelines apply to heavy-tailed features (the
    uniform-output stage of rank-gauss): every order's price maps to
    rank/n under total order (price, orderkey). Ranks come from
    ``selection.global_row_numbers`` with bucket = floor(price/50k) (a
    numeric order-prefix), so the plan is per-bucket windows plus a
    one-row-per-bucket offset table — the scale-safe substitute for
    ``percent_rank() OVER (ORDER BY ...)``'s single-partition sort,
    proven equal to it by this oracle."""
    from ..operators import selection

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).withColumn(
        "__b", F.floor(F.col("o_totalprice") / F.lit(QT_BUCKET_WIDTH))
    )
    ranked = selection.global_row_numbers(
        o, ["o_totalprice", "o_orderkey"], bucket="__b"
    )
    n = ranked.agg(F.count(F.lit(1)).alias("__n"))
    return ranked.crossJoin(F.broadcast(n)).select(
        "o_orderkey",
        round_to(
            F.col("rnk").cast("double") / F.col("__n").cast("double"), 6
        ).alias("cdf"),
    )


_QT_SQL = f"""
WITH r AS (
  SELECT o_orderkey,
         row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rnk,
         count(*) OVER () AS n
  FROM orders
)
SELECT o_orderkey, {sql_round("rnk::DOUBLE / n::DOUBLE", 6)} AS cdf FROM r
"""


_PSI_SQL = f"""
WITH o AS (
  SELECT o_orderkey, o_totalprice,
         (o_orderdate >= TIMESTAMP '{PSI_SPLIT}') AS is_cur
  FROM orders
),
rb AS (
  SELECT o_totalprice,
         ntile({PSI_BINS}) OVER (ORDER BY o_totalprice DESC, o_orderkey)
           AS bucket
  FROM orders WHERE o_orderdate < TIMESTAMP '{PSI_SPLIT}'
),
ed AS (SELECT bucket, min(o_totalprice) AS e FROM rb
       WHERE bucket < {PSI_BINS} GROUP BY bucket),
ea AS (SELECT list(e ORDER BY e) AS edges FROM ed),
tagged AS (
  SELECT is_cur,
         1 + len(list_filter(ea.edges, e -> o.o_totalprice < e)) AS bin
  FROM o, ea
),
counts AS (
  SELECT bin, sum((NOT is_cur)::INT)::BIGINT AS n_ref,
         sum(is_cur::INT)::BIGINT AS n_cur
  FROM tagged GROUP BY bin
),
tot AS (SELECT sum(n_ref)::BIGINT AS tr, sum(n_cur)::BIGINT AS tc FROM counts),
c2 AS (
  SELECT bin, n_ref, n_cur,
    CASE WHEN n_ref > 0 AND n_cur > 0 THEN
      (n_cur::DOUBLE / tc::DOUBLE - n_ref::DOUBLE / tr::DOUBLE)
      * ln((n_cur::DOUBLE / tc::DOUBLE) / (n_ref::DOUBLE / tr::DOUBLE))
    ELSE 0.0 END AS contrib
  FROM counts, tot
),
psi AS (
  SELECT list_reduce(list_prepend(0.0::DOUBLE, list(contrib ORDER BY bin)),
                     (a, b) -> a + b) AS p
  FROM c2
)
SELECT bin::BIGINT AS bin, n_ref, n_cur,
       {sql_round("contrib", 6)} AS contrib,
       {sql_round("psi.p", 6)} AS psi
FROM c2, psi
"""


_EDB_SQL = f"""
WITH b AS (
  SELECT o_totalprice,
         ntile({EDB_BUCKETS}) OVER (ORDER BY o_totalprice DESC, o_orderkey)
           AS bin
  FROM orders
)
SELECT bin::BIGINT AS bin, count(*)::BIGINT AS n,
       {sql_round("min(o_totalprice)", 2)} AS lo,
       {sql_round("max(o_totalprice)", 2)} AS hi
FROM b GROUP BY 1
"""


ATTR_LOOKBACK_US = 7 * 24 * 3600 * 1_000_000  # 7 days in epoch-µs


def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch vs last-touch marketing attribution in ONE
    user-partitioned window pass each: for every purchase, the earliest
    and the latest click inside the 7-day lookback via conditional
    min/max over an epoch-µs RANGE frame (bounded per row — no
    interval-join explosion, no per-purchase subquery). Summary row per
    model: how many purchases each attribution model can attribute,
    and how often the two models DISAGREE (the number a marketing team
    actually fights over). Integer µs timestamps end to end."""
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-ATTR_LOOKBACK_US, -1)
    )
    click_us = F.when(F.col("event_type") == "click", F.col("us"))
    flagged = e.withColumn("first_click", F.min(click_us).over(w)).withColumn(
        "last_click", F.max(click_us).over(w)
    )
    p = flagged.filter(F.col("event_type") == "purchase")
    return p.agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.col("first_click").isNotNull().cast("long")).alias(
            "n_attributed"
        ),
        F.sum(
            (
                F.col("first_click").isNotNull()
                & (F.col("first_click") != F.col("last_click"))
            ).cast("long")
        ).alias("n_models_disagree"),
        round_to(
            F.sum(F.col("first_click").isNotNull().cast("double"))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("attribution_rate"),
    )


_ATTRIBUTION_SQL = f"""
WITH e AS (
  SELECT user_id, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events
),
fl AS (
  SELECT user_id, event_type, us,
    min(CASE WHEN event_type = 'click' THEN us END) OVER (
      PARTITION BY user_id ORDER BY us
      RANGE BETWEEN {ATTR_LOOKBACK_US} PRECEDING AND 1 PRECEDING
    ) AS first_click,
    max(CASE WHEN event_type = 'click' THEN us END) OVER (
      PARTITION BY user_id ORDER BY us
      RANGE BETWEEN {ATTR_LOOKBACK_US} PRECEDING AND 1 PRECEDING
    ) AS last_click
  FROM e
)
SELECT count(*)::BIGINT AS n_purchases,
       sum((first_click IS NOT NULL)::INT)::BIGINT AS n_attributed,
       sum((first_click IS NOT NULL
            AND first_click != last_click)::INT)::BIGINT AS n_models_disagree,
       {sql_round(
           "sum((first_click IS NOT NULL)::INT)::DOUBLE / count(*)::DOUBLE", 6
       )} AS attribution_rate
FROM fl WHERE event_type = 'purchase'
"""


CONTRIB_CUR, CONTRIB_PREV = "1996-04-01", "1996-03-01"


def momentum_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Root-cause decomposition of a metric move — the BI question
    behind every dashboard spike: WHICH nation drove the month-over-
    month revenue change? Per-nation revenue for two fixed months
    (orders→customer→nation, dims broadcast), per-nation delta on
    exact DECIMAL sums, and each nation's share of the total delta —
    shares sum to 1 by construction. Fan-in is #nations rows after one
    monthly aggregate; no windows."""
    o = t(spark, sf_dir, "orders").filter(
        F.date_trunc("month", F.col("o_orderdate"))
        .cast("date")
        .isin([CONTRIB_CUR, CONTRIB_PREV])
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).join(
        F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]
    )
    month = F.date_trunc("month", F.col("o_orderdate")).cast("date")
    per = j.groupBy("n_name").agg(
        F.sum(
            F.when(
                month == F.lit(CONTRIB_CUR).cast("date"),
                F.col("o_totalprice").cast("decimal(12,2)"),
            ).otherwise(F.lit(0).cast("decimal(12,2)"))
        ).alias("cur"),
        F.sum(
            F.when(
                month == F.lit(CONTRIB_PREV).cast("date"),
                F.col("o_totalprice").cast("decimal(12,2)"),
            ).otherwise(F.lit(0).cast("decimal(12,2)"))
        ).alias("prev"),
    )
    tot = per.agg(
        F.sum(F.col("cur") - F.col("prev")).alias("tdelta")
    )
    out = per.crossJoin(F.broadcast(tot))
    delta = F.col("cur") - F.col("prev")
    return out.select(
        F.col("n_name").alias("nation"),
        round_to(F.col("prev").cast("double"), 2).alias("rev_prev"),
        round_to(F.col("cur").cast("double"), 2).alias("rev_cur"),
        round_to(delta.cast("double"), 2).alias("delta"),
        round_to(
            delta.cast("double") / F.col("tdelta").cast("double"), 6
        ).alias("share_of_move"),
    )


_CONTRIB_SQL = f"""
WITH j AS (
  SELECT n.n_name,
         date_trunc('month', o.o_orderdate::DATE)::DATE AS month,
         o.o_totalprice::DECIMAL(12,2) AS dv
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE date_trunc('month', o.o_orderdate::DATE)::DATE
        IN (DATE '{CONTRIB_CUR}', DATE '{CONTRIB_PREV}')
),
per AS (
  SELECT n_name,
    sum(CASE WHEN month = DATE '{CONTRIB_CUR}' THEN dv
             ELSE 0::DECIMAL(12,2) END) AS cur,
    sum(CASE WHEN month = DATE '{CONTRIB_PREV}' THEN dv
             ELSE 0::DECIMAL(12,2) END) AS prev
  FROM j GROUP BY 1
),
tot AS (SELECT sum(cur - prev) AS tdelta FROM per)
SELECT n_name AS nation,
  {sql_round("prev::DOUBLE", 2)} AS rev_prev,
  {sql_round("cur::DOUBLE", 2)} AS rev_cur,
  {sql_round("(cur - prev)::DOUBLE", 2)} AS delta,
  {sql_round("(cur - prev)::DOUBLE / tdelta::DOUBLE", 6)} AS share_of_move
FROM per CROSS JOIN tot
"""


def seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition (STL-lite) of daily revenue:
    trend = centered 7-day mean by CALENDAR self-join (gap-correct, no
    global window), weekly seasonal = per-day-of-week mean of the
    detrended residual, remainder = the rest. Determinism: all
    intermediate sums stay in x7 integer-DECIMAL space
    (residual*7 = 7*rev - trend_sum — exact, merge-order independent);
    doubles appear only in the final scalar division + rounding, with
    identical expression trees in the oracle."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("rev")
    )
    offsets = F.array(*[F.lit(k) for k in range(-3, 4)])
    fan = daily.select(
        F.col("rev").alias("orev"),
        F.explode(offsets).alias("k"),
        F.col("day"),
    ).select(F.expr("date_add(day, k)").alias("day"), "orev")
    trend7 = fan.groupBy("day").agg(
        F.sum("orev").alias("tsum"), F.count(F.lit(1)).alias("tn")
    )
    base = daily.join(trend7, "day").withColumn(
        "res7",
        F.when(
            F.col("tn") == 7,
            F.col("rev") * F.lit(7) - F.col("tsum"),
        ),
    )
    dow = F.dayofweek("day")
    seas = (
        base.filter(F.col("res7").isNotNull())
        .groupBy(dow.alias("dw"))
        .agg(
            F.sum("res7").alias("ssum"),
            F.count(F.lit(1)).alias("sn"),
        )
    )
    out = base.join(F.broadcast(seas), dow == F.col("dw"), "left")
    trend = F.col("tsum").cast("double") / F.lit(7.0)
    seasonal = F.col("ssum").cast("double") / (
        F.col("sn").cast("double") * F.lit(7.0)
    )
    remainder = F.col("rev").cast("double") - trend - seasonal
    ok = F.col("res7").isNotNull()
    return out.select(
        "day",
        round_to(F.col("rev").cast("double"), 2).alias("revenue"),
        round_to(F.when(ok, trend), 6).alias("trend"),
        round_to(F.when(ok, seasonal), 6).alias("seasonal"),
        round_to(F.when(ok, remainder), 6).alias("remainder"),
    )


_SEASONAL_SQL = f"""
WITH daily AS (
  SELECT o_orderdate::DATE AS day, sum(o_totalprice::DECIMAL(12,2)) AS rev
  FROM orders GROUP BY 1
),
fan AS (
  SELECT day + k::INTEGER AS day, rev AS orev
  FROM daily, unnest([-3, -2, -1, 0, 1, 2, 3]) AS u(k)
),
trend7 AS (
  SELECT day, sum(orev) AS tsum, count(*)::BIGINT AS tn
  FROM fan GROUP BY 1
),
base AS (
  SELECT d.day, d.rev, t.tsum, t.tn,
         CASE WHEN t.tn = 7 THEN d.rev * 7 - t.tsum END AS res7
  FROM daily d JOIN trend7 t USING (day)
),
seas AS (
  SELECT dayofweek(day) AS dw, sum(res7) AS ssum, count(*)::BIGINT AS sn
  FROM base WHERE res7 IS NOT NULL GROUP BY 1
)
SELECT b.day,
  {sql_round("b.rev::DOUBLE", 2)} AS revenue,
  CASE WHEN b.res7 IS NOT NULL THEN
    {sql_round("b.tsum::DOUBLE / 7.0", 6)} END AS trend,
  CASE WHEN b.res7 IS NOT NULL THEN
    {sql_round("s.ssum::DOUBLE / (s.sn::DOUBLE * 7.0)", 6)} END AS seasonal,
  CASE WHEN b.res7 IS NOT NULL THEN
    {sql_round(
        "b.rev::DOUBLE - b.tsum::DOUBLE / 7.0"
        " - s.ssum::DOUBLE / (s.sn::DOUBLE * 7.0)",
        6,
    )} END AS remainder
FROM base b LEFT JOIN seas s ON dayofweek(b.day) = s.dw
"""


def revenue_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test over daily revenue — the NONPARAMETRIC
    monotone-trend screen (rank-based: outlier days can't fake or
    hide a drift, unlike an OLS slope): S = Σ_{i<j} sign(x_j − x_i),
    tie-corrected var S = (n(n−1)(2n+5) − Σ_t t(t−1)(2t+5))/18, and
    the continuity-corrected z = (S ∓ 1)/√var. |z| > 1.96 calls the
    trend at 5%.

    Exactness: revenue is BIGINT cents (the CUSUM rule), so every
    sign comparison, S, and both variance numerators are exact
    integers; var/z are pinned double expressions over them. Scale
    shape: the pairwise join runs over the DAY-aggregated series —
    bounded by the calendar (~2.4k rows; 36.5k for a century), so the
    broadcast non-equi self-join is O(days²) on a dimension that does
    NOT grow with the fact table; the heavy work is the one daily
    aggregate."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        ).alias("revc")
    )
    a = daily.select(F.col("day").alias("da"), F.col("revc").alias("xa"))
    b = daily.select(F.col("day").alias("db"), F.col("revc").alias("xb"))
    sgn = (
        F.when(F.col("xb") > F.col("xa"), F.lit(1))
        .when(F.col("xb") < F.col("xa"), F.lit(-1))
        .otherwise(F.lit(0))
        .cast("long")
    )
    s_row = a.join(F.broadcast(b), F.col("da") < F.col("db")).agg(
        F.sum(sgn).alias("s")
    )
    nt = daily.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        daily.groupBy("revc")
        .agg(F.count(F.lit(1)).alias("__t"))
        .agg(
            F.sum(
                F.col("__t")
                * (F.col("__t") - 1)
                * (2 * F.col("__t") + 5)
            ).alias("tie_term")
        )
    )
    n = F.col("n")
    var_num = (
        n * (n - 1) * (2 * n + 5) - F.col("tie_term")
    ).cast("double")
    var_s = var_num / F.lit(18.0)
    s = F.col("s")
    z = (
        F.when(s > 0, (s - 1).cast("double") / F.sqrt(var_s))
        .when(s < 0, (s + 1).cast("double") / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return (
        s_row.crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(ties))
        .select(
            n.cast("long").alias("n_days"),
            s.cast("long").alias("s"),
            round_to(var_s, 6).alias("var_s"),
            round_to(z, 6).alias("z"),
            F.when(z > 1.96, F.lit("increasing"))
            .when(z < -1.96, F.lit("decreasing"))
            .otherwise(F.lit("none"))
            .alias("trend"),
        )
    )


def revenue_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen slope over monthly revenue — the robust ESTIMATOR
    companion to revenue_mann_kendall's trend TEST (the standard pair
    in every environmental/ops monitoring stack: MK says "is there a
    monotone trend", Sen says "how steep", both immune to outlier
    months that wreck an OLS fit; 29.3% breakdown point). slope =
    median over all month pairs of (rev_j − rev_i)/(mi_j − mi_i),
    intercept = median of (rev − slope·mi).

    Exactness: revenue is BIGINT cents and the month index is an exact
    integer (year·12 + month), so every pairwise slope is one double
    division of exact ints; the median picks exact sorted elements
    (or averages the two middles with a single (a+b)/2.0) — no
    accumulation anywhere, so both engines agree bit-for-bit before
    the final round_to.

    Scale shape: the pairwise expansion runs over the MONTH-aggregated
    series — bounded by the calendar (~84 months; 1.2k for a century),
    never the fact table — so the collect_list median is the
    documented bounded-aggregate class (months² elements by
    construction, like the small-basket arrays); the heavy work is the
    one monthly aggregate with map-side combine."""
    o = t(spark, sf_dir, "orders")
    mi = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long")
    monthly = o.groupBy(mi.alias("mi")).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        ).alias("revc")
    )
    a = monthly.select(F.col("mi").alias("ma"), F.col("revc").alias("xa"))
    b = monthly.select(F.col("mi").alias("mb"), F.col("revc").alias("xb"))
    slope = (F.col("xb") - F.col("xa")).cast("double") / (
        F.col("mb") - F.col("ma")
    ).cast("double")
    pairs = a.join(F.broadcast(b), F.col("ma") < F.col("mb"))
    slopes = pairs.agg(
        F.sort_array(F.collect_list(slope)).alias("sl"),
        F.count(F.lit(1)).alias("n_pairs"),
    )

    def median_of(arr):
        m = F.size(arr)
        odd = F.element_at(arr, ((m + F.lit(1)) / F.lit(2)).cast("int"))
        ev = (
            F.element_at(arr, (m / F.lit(2)).cast("int"))
            + F.element_at(arr, (m / F.lit(2) + F.lit(1)).cast("int"))
        ) / F.lit(2.0)
        return F.when(m % 2 == 1, odd).otherwise(ev)

    sen = slopes.select(
        "n_pairs", median_of(F.col("sl")).alias("__slope")
    )
    resid = monthly.crossJoin(F.broadcast(sen)).select(
        "n_pairs",
        "__slope",
        (
            F.col("revc").cast("double")
            - F.col("__slope") * F.col("mi").cast("double")
        ).alias("__r"),
    )
    final = resid.groupBy("n_pairs", "__slope").agg(
        F.sort_array(F.collect_list("__r")).alias("rs"),
        F.count(F.lit(1)).alias("n_months"),
    )
    return final.select(
        F.col("n_months").cast("long").alias("n_months"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        round_to(F.col("__slope"), 6).alias("sen_slope"),
        round_to(median_of(F.col("rs")), 6).alias("sen_intercept"),
    )


_THEIL_SEN_SQL = f"""
WITH monthly AS (
  SELECT (year(o_orderdate) * 12 + month(o_orderdate))::BIGINT AS mi,
         sum((o_totalprice::DECIMAL(12,2) * 100)::BIGINT)::BIGINT AS revc
  FROM orders GROUP BY 1
),
slopes AS (
  SELECT list_sort(list(
           CAST(b.revc - a.revc AS DOUBLE) / CAST(b.mi - a.mi AS DOUBLE)
         )) AS sl,
         count(*)::BIGINT AS n_pairs
  FROM monthly a JOIN monthly b ON a.mi < b.mi
),
sen AS (
  SELECT n_pairs,
         CASE WHEN len(sl) % 2 = 1 THEN sl[(len(sl) + 1) // 2]
              ELSE (sl[len(sl) // 2] + sl[len(sl) // 2 + 1])
                   / CAST(2.0 AS DOUBLE) END AS slope
  FROM slopes
),
resid AS (
  SELECT s.n_pairs, s.slope,
         list_sort(list(
           CAST(m.revc AS DOUBLE) - s.slope * CAST(m.mi AS DOUBLE)
         )) AS rs,
         count(*)::BIGINT AS n_months
  FROM monthly m, sen s
  GROUP BY s.n_pairs, s.slope
)
SELECT n_months, n_pairs,
       {sql_round("slope", 6)} AS sen_slope,
       {sql_round("(CASE WHEN len(rs) % 2 = 1 THEN rs[(len(rs) + 1) // 2] ELSE (rs[len(rs) // 2] + rs[len(rs) // 2 + 1]) / CAST(2.0 AS DOUBLE) END)", 6)}
         AS sen_intercept
FROM resid
"""


_MANN_KENDALL_SQL = f"""
WITH daily AS (
  SELECT o_orderdate AS day,
         sum((o_totalprice::DECIMAL(12,2) * 100)::BIGINT)::BIGINT AS revc
  FROM orders GROUP BY 1
),
sp AS (
  SELECT sum(CASE WHEN b.revc > a.revc THEN 1
                  WHEN b.revc < a.revc THEN -1 ELSE 0 END)::BIGINT AS s
  FROM daily a JOIN daily b ON a.day < b.day
),
nt AS (SELECT count(*)::BIGINT AS n FROM daily),
ties AS (
  SELECT sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tie_term
  FROM (SELECT count(*)::BIGINT AS t FROM daily GROUP BY revc)
)
SELECT n AS n_days, s,
  {sql_round("(n * (n - 1) * (2 * n + 5) - tie_term)::DOUBLE / 18.0", 6)}
    AS var_s,
  {sql_round(
      "CASE WHEN s > 0 THEN (s - 1)::DOUBLE"
      " / sqrt((n * (n - 1) * (2 * n + 5) - tie_term)::DOUBLE / 18.0)"
      " WHEN s < 0 THEN (s + 1)::DOUBLE"
      " / sqrt((n * (n - 1) * (2 * n + 5) - tie_term)::DOUBLE / 18.0)"
      " ELSE 0.0 END", 6)} AS z,
  CASE WHEN (CASE WHEN s > 0 THEN (s - 1)::DOUBLE
      / sqrt((n * (n - 1) * (2 * n + 5) - tie_term)::DOUBLE / 18.0)
      WHEN s < 0 THEN (s + 1)::DOUBLE
      / sqrt((n * (n - 1) * (2 * n + 5) - tie_term)::DOUBLE / 18.0)
      ELSE 0.0 END) > 1.96 THEN 'increasing'
    WHEN (CASE WHEN s > 0 THEN (s - 1)::DOUBLE
      / sqrt((n * (n - 1) * (2 * n + 5) - tie_term)::DOUBLE / 18.0)
      WHEN s < 0 THEN (s + 1)::DOUBLE
      / sqrt((n * (n - 1) * (2 * n + 5) - tie_term)::DOUBLE / 18.0)
      ELSE 0.0 END) < -1.96 THEN 'decreasing'
    ELSE 'none' END AS trend
FROM sp, nt, ties
"""


def nation_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across nations — the
    inequality summary for "is our business one-market-heavy":
    G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n over the ascending-sorted
    per-nation revenues, with the top nation's share alongside.

    Exactness: revenues are BIGINT cents; rank-weighted products stay
    exact integers (rank <= |nations|), so G is one pinned double
    expression over exact sums. The global rank window is safe HERE
    because it orders the NATION dimension (25 rows, bounded by
    geography, never the fact table) — the same domain-bounded
    exemption as the CUSUM day series; per-customer Gini would need
    the distributed order-statistics machinery instead. Scale shape:
    one fact aggregate keyed by nation, then dimension-sized work."""
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n_dim = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast(
                    "long"
                )
            ).alias("revc")
        )
    )
    w = Window.orderBy("revc", "c_nationkey")
    ranked = per.withColumn("__i", F.row_number().over(w))
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.sum("revc").alias("total_cents"),
        F.sum(F.col("__i") * F.col("revc")).alias("__s"),
        F.max("revc").alias("__top"),
    )
    n, tot = (
        F.col("n_nations").cast("double"),
        F.col("total_cents").cast("double"),
    )
    gini = (2.0 * F.col("__s").cast("double")) / (n * tot) - (n + 1.0) / n
    return agg.crossJoin(
        F.broadcast(
            per.join(
                n_dim, per.c_nationkey == n_dim.n_nationkey
            ).orderBy(F.desc("revc"), "n_name").limit(1).select(
                F.col("n_name").alias("top_nation"), F.col("revc").alias("__tr")
            )
        )
    ).select(
        F.col("n_nations").cast("long").alias("n_nations"),
        F.col("total_cents").cast("long").alias("total_cents"),
        round_to(gini, 6).alias("gini"),
        "top_nation",
        round_to(F.col("__tr").cast("double") / tot, 6).alias("top_share"),
    )


_GINI_SQL = f"""
WITH per AS (
  SELECT c.c_nationkey,
         sum((o.o_totalprice::DECIMAL(12,2) * 100)::BIGINT)::BIGINT AS revc
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1
),
ranked AS (
  SELECT revc, row_number() OVER (ORDER BY revc, c_nationkey) AS i FROM per
),
agg AS (
  SELECT count(*)::BIGINT AS n_nations, sum(revc)::BIGINT AS total_cents,
         sum(i * revc)::BIGINT AS s
  FROM ranked
),
top AS (
  SELECT n.n_name AS top_nation, p.revc AS tr
  FROM per p JOIN nation n ON p.c_nationkey = n.n_nationkey
  ORDER BY p.revc DESC, n.n_name LIMIT 1
)
SELECT n_nations, total_cents,
  {sql_round(
      "(2.0 * s::DOUBLE) / (n_nations::DOUBLE * total_cents::DOUBLE)"
      " - (n_nations::DOUBLE + 1.0) / n_nations::DOUBLE", 6)} AS gini,
  top_nation,
  {sql_round("tr::DOUBLE / total_cents::DOUBLE", 6)} AS top_share
FROM agg, top
"""


def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy RATE of the user-behavior Markov chain — how
    predictable the next event is given the current one:
    H = −Σ_ij (n_ij/N)·log2(n_ij/n_i) bits/transition, the
    information-theoretic summary of event_transitions' probability
    table (a chain near log2(|types|) is noise; near 0 is a rigid
    funnel). Also reports H₀ = log2(n_states) and the predictability
    ratio 1 − H/H₀.

    Exactness: transition counts are exact BIGINTs; the double sum
    folds over the (src, dst) terms sorted lexicographically —
    DOMAIN-bounded (|types|² entries), so the collect_list array is
    tiny at any corpus scale — and log2 of count ratios + round_to 6
    is the surprisal rule. Scale shape: one user-partitioned lead(),
    one |types|²-bounded aggregate, one single-row fold."""
    e = t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.withColumn("dst_type", F.lead("event_type").over(w)).where(
        F.col("dst_type").isNotNull()
    )
    counts = pairs.groupBy(
        F.col("event_type").alias("src"), F.col("dst_type").alias("dst")
    ).agg(F.count(F.lit(1)).alias("nij"))
    totals = counts.groupBy("src").agg(F.sum("nij").alias("ni"))
    terms = counts.join(F.broadcast(totals), "src")
    folded = terms.agg(
        F.sum("nij").alias("n_transitions"),
        F.count(F.lit(1)).alias("__k"),
        F.countDistinct("src").alias("n_states"),
        F.sort_array(
            F.collect_list(F.struct("src", "dst", "nij", "ni"))
        ).alias("__t"),
    )
    n = F.col("n_transitions").cast("double")
    h = -F.aggregate(
        F.col("__t"),
        F.lit(0.0),
        lambda acc, s: acc
        + (s["nij"].cast("double") / n)
        * F.log2(s["nij"].cast("double") / s["ni"].cast("double")),
    )
    h0 = F.log2(F.col("n_states").cast("double"))
    return folded.select(
        F.col("n_transitions").cast("long").alias("n_transitions"),
        F.col("n_states").cast("long").alias("n_states"),
        round_to(h, 6).alias("entropy_rate_bits"),
        round_to(F.lit(1.0) - h / h0, 6).alias("predictability"),
    )


_ENTROPY_RATE_SQL = f"""
WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
  FROM events
),
p AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS dst
  FROM e
),
c AS (
  SELECT src, dst, count(*)::BIGINT AS nij
  FROM p WHERE dst IS NOT NULL GROUP BY src, dst
),
tot AS (SELECT src, sum(nij)::BIGINT AS ni FROM c GROUP BY src),
folded AS (
  SELECT sum(c.nij)::BIGINT AS n_transitions,
         count(DISTINCT c.src)::BIGINT AS n_states,
         list(struct_pack(src := c.src, dst := c.dst, nij := c.nij,
                          ni := tot.ni)
              ORDER BY c.src, c.dst) AS ts
  FROM c JOIN tot USING (src)
)
SELECT n_transitions, n_states,
  {sql_round(
      "-list_reduce(list_prepend(0.0::DOUBLE, list_transform(ts, "
      "s -> (s.nij::DOUBLE / n_transitions::DOUBLE)"
      " * log2(s.nij::DOUBLE / s.ni::DOUBLE))), (a, b) -> a + b)",
      6)} AS entropy_rate_bits,
  {sql_round(
      "1.0 - (-list_reduce(list_prepend(0.0::DOUBLE, list_transform(ts, "
      "s -> (s.nij::DOUBLE / n_transitions::DOUBLE)"
      " * log2(s.nij::DOUBLE / s.ni::DOUBLE))), (a, b) -> a + b))"
      " / log2(n_states::DOUBLE)",
      6)} AS predictability
FROM folded
"""


def revenue_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz RUNS test on day-over-day revenue direction —
    the randomness screen that pairs with revenue_mann_kendall: the
    trend test asks "is it drifting", the runs test asks "is the
    up/down sequence serially independent" (momentum clusters ups,
    mean-reversion alternates; both shrink or inflate the run count
    R against E[R] = 2·n₊·n₋/(n₊+n₋) + 1). Zero-change days drop, the
    classic treatment. Everything derives from exact integers —
    BIGINT-cents signs, integer run count via one lag over the sign
    series — and E/Var/z are pinned double expressions; |z| <= 1.96
    passes at 5%. Scale shape: one daily aggregate; both lags run on
    the calendar-bounded day series (the CUSUM rule), never the fact
    table."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        ).alias("revc")
    )
    wd = Window.orderBy("day")
    signs = (
        daily.withColumn("__prev", F.lag("revc").over(wd))
        .filter(F.col("__prev").isNotNull() & (F.col("revc") != F.col("__prev")))
        .select(
            "day",
            F.when(F.col("revc") > F.col("__prev"), F.lit(1))
            .otherwise(F.lit(-1))
            .alias("s"),
        )
    )
    runs = signs.withColumn("__ps", F.lag("s").over(wd)).select(
        "s",
        F.when(
            F.col("__ps").isNull() | (F.col("s") != F.col("__ps")), F.lit(1)
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("__new_run"),
    )
    agg = runs.agg(
        F.sum(F.when(F.col("s") > 0, 1).otherwise(0)).alias("n_plus"),
        F.sum(F.when(F.col("s") < 0, 1).otherwise(0)).alias("n_minus"),
        F.sum("__new_run").alias("n_runs"),
    )
    n1, n2, r = (
        F.col("n_plus").cast("double"),
        F.col("n_minus").cast("double"),
        F.col("n_runs").cast("double"),
    )
    n = n1 + n2
    er = 2.0 * n1 * n2 / n + 1.0
    vr = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) / (n * n * (n - 1.0))
    z = (r - er) / F.sqrt(vr)
    return agg.select(
        F.col("n_plus").cast("long").alias("n_plus"),
        F.col("n_minus").cast("long").alias("n_minus"),
        F.col("n_runs").cast("long").alias("n_runs"),
        round_to(er, 6).alias("expected_runs"),
        round_to(z, 6).alias("z"),
        (F.abs(z) <= 1.96).alias("looks_random"),
    )


_RUNS_Z = (
    "(n_runs::DOUBLE - (2.0 * n_plus::DOUBLE * n_minus::DOUBLE"
    " / (n_plus::DOUBLE + n_minus::DOUBLE) + 1.0))"
    " / sqrt(2.0 * n_plus::DOUBLE * n_minus::DOUBLE"
    " * (2.0 * n_plus::DOUBLE * n_minus::DOUBLE"
    "    - n_plus::DOUBLE - n_minus::DOUBLE)"
    " / ((n_plus::DOUBLE + n_minus::DOUBLE)"
    "    * (n_plus::DOUBLE + n_minus::DOUBLE)"
    "    * (n_plus::DOUBLE + n_minus::DOUBLE - 1.0)))"
)

_RUNS_SQL = f"""
WITH daily AS (
  SELECT o_orderdate AS day,
         sum((o_totalprice::DECIMAL(12,2) * 100)::BIGINT)::BIGINT AS revc
  FROM orders GROUP BY 1
),
signs AS (
  SELECT day, CASE WHEN revc > prev THEN 1 ELSE -1 END AS s
  FROM (SELECT day, revc, lag(revc) OVER (ORDER BY day) AS prev FROM daily)
  WHERE prev IS NOT NULL AND revc <> prev
),
runs AS (
  SELECT s, CASE WHEN ps IS NULL OR s <> ps THEN 1 ELSE 0 END::BIGINT
           AS new_run
  FROM (SELECT s, lag(s) OVER (ORDER BY day) AS ps FROM signs)
),
agg AS (
  SELECT sum(CASE WHEN s > 0 THEN 1 ELSE 0 END)::BIGINT AS n_plus,
         sum(CASE WHEN s < 0 THEN 1 ELSE 0 END)::BIGINT AS n_minus,
         sum(new_run)::BIGINT AS n_runs
  FROM runs
)
SELECT n_plus, n_minus, n_runs,
  {sql_round(
      "2.0 * n_plus::DOUBLE * n_minus::DOUBLE"
      " / (n_plus::DOUBLE + n_minus::DOUBLE) + 1.0", 6)} AS expected_runs,
  {sql_round(_RUNS_Z, 6)} AS z,
  abs({_RUNS_Z}) <= 1.96 AS looks_random
FROM agg
"""


JACC_MIN_COMMON, JACC_TOP = 3, 50


def parts_jaccard_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering similarity: Jaccard of the
    CUSTOMER sets of two parts, J = |C_a ∩ C_b| / (|C_a| + |C_b| −
    |C_a ∩ C_b|) — the link-prediction / "customers also bought"
    primitive, and the set-similarity twin of part_pair_affinity's
    lift (lift scores co-occurrence against independence; Jaccard
    scores it against the items' audience sizes, so a niche pair with
    perfectly overlapping buyers ranks high even at tiny support).

    Scale shape: intersection counts come from the cust-keyed
    EQUI-self-join (shuffle on customer, fanout bounded by basket size
    squared) — measured 3.3x faster than enumerating pairs inside a
    collected basket array here, the OPPOSITE of part_pair_affinity's
    order baskets: customer baskets are ~100 parts, and at that width
    the interpreted nested-transform enumeration loses to the
    codegen'd join. Audience degrees join back on the pair keys; the
    min-common prune bounds the scored set. Output is the
    deterministic top-{top} by (J desc, part_a, part_b) — a TakeOrdered,
    and scale-stable where an absolute J threshold empties as
    audiences grow with the corpus. All counts exact BIGINTs; J is one
    pinned ratio through round_to 6."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    cp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part")
        )
        .distinct()
    )
    deg = cp.groupBy("part").agg(F.count(F.lit(1)).alias("deg"))
    a = cp.select("cust", F.col("part").alias("part_a"))
    b = cp.select("cust", F.col("part").alias("part_b"))
    common = (
        a.join(b, "cust")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("common"))
        .filter(F.col("common") >= JACC_MIN_COMMON)
    )
    da = deg.select(F.col("part").alias("part_a"), F.col("deg").alias("da"))
    db = deg.select(F.col("part").alias("part_b"), F.col("deg").alias("db"))
    jac = F.col("common").cast("double") / (
        F.col("da") + F.col("db") - F.col("common")
    ).cast("double")
    return (
        common.join(da, "part_a")
        .join(db, "part_b")
        .select(
            "part_a",
            "part_b",
            F.col("common").cast("long").alias("common"),
            F.col("da").cast("long").alias("da"),
            F.col("db").cast("long").alias("db"),
            round_to(jac, 6).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "part_a", "part_b")
        .limit(JACC_TOP)
    )


parts_jaccard_similarity.__doc__ = parts_jaccard_similarity.__doc__.format(
    top=JACC_TOP
)


_PARTS_JACCARD_SQL = f"""
WITH cp AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
deg AS (SELECT part, count(*)::BIGINT AS deg FROM cp GROUP BY part),
common AS (
  SELECT a.part AS part_a, b.part AS part_b, count(*)::BIGINT AS common
  FROM cp a JOIN cp b ON a.cust = b.cust AND a.part < b.part
  GROUP BY 1, 2
  HAVING count(*) >= {JACC_MIN_COMMON}
)
SELECT c.part_a, c.part_b, c.common, x.deg AS da, y.deg AS db,
  {sql_round("c.common::DOUBLE / (x.deg + y.deg - c.common)::DOUBLE", 6)}
    AS jaccard
FROM common c JOIN deg x ON x.part = c.part_a JOIN deg y ON y.part = c.part_b
ORDER BY jaccard DESC, c.part_a, c.part_b
LIMIT {JACC_TOP}
"""


MAHAL_THRESHOLD = 9.21  # chi-square(2) 99th percentile — exact literal


def customers_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate Mahalanobis outlier screen over customers in
    (order count, total spend) space — the multivariate partner of the
    per-column z-score: a customer with unremarkable marginals can
    still be an extreme COMBINATION (3 orders, $900k), and only the
    covariance-corrected distance sees it. 2-D means the inverse is
    closed-form, so md² = (dx² σyy − 2 dx dy σxy + dy² σxx)/det is one
    pinned expression — no linear-algebra library, no iteration.

    Exactness: per-customer features are exact BIGINTs — order count
    and WHOLE-DOLLAR spend (cents div 100; the sub-dollar tail is
    noise at outlier scale). Dollars, not cents, because the moment
    sums must convert to double EXACTLY: Σ spend² in dollars stays
    under 2^53 up to ~10M customers, where the cents form overflows
    double precision and the DECIMAL→double conversion rule drifts
    across engines (the cusum post-mortem; re-scale to k$ beyond).
    The sums aggregate in DECIMAL(38,0) (order-independent); every
    double derives from those exact integers in the same expression
    tree both engines run, and md² goes through round_to 6. Scale
    shape: one customer aggregate, one 1-row moment aggregate
    broadcast back, one projection-side filter — no windows, no joins
    beyond the broadcast scalar."""
    o = t(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        ).alias("__cents"),
    ).select(
        "o_custkey",
        "n_orders",
        F.expr("__cents div 100").alias("spend_usd"),
    )
    d38 = "decimal(38,0)"
    m = cust.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("n_orders").cast(d38)).alias("sx"),
        F.sum(F.col("spend_usd").cast(d38)).alias("sy"),
        F.sum((F.col("n_orders") * F.col("n_orders")).cast(d38)).alias("sxx"),
        F.sum((F.col("n_orders") * F.col("spend_usd")).cast(d38)).alias("sxy"),
        F.sum(
            (F.col("spend_usd") * F.col("spend_usd")).cast(d38)
        ).alias("syy"),
    )
    n = F.col("n").cast("double")
    mx, my = F.col("sx").cast("double") / n, F.col("sy").cast("double") / n
    vxx = F.col("sxx").cast("double") / n - mx * mx
    vxy = F.col("sxy").cast("double") / n - mx * my
    vyy = F.col("syy").cast("double") / n - my * my
    det = vxx * vyy - vxy * vxy
    dx = F.col("n_orders").cast("double") - mx
    dy = F.col("spend_usd").cast("double") - my
    md2 = (dx * dx * vyy - 2 * dx * dy * vxy + dy * dy * vxx) / det
    return (
        cust.crossJoin(F.broadcast(m))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("n_orders").cast("long").alias("n_orders"),
            F.col("spend_usd").cast("long").alias("spend_usd"),
            round_to(md2, 6).alias("md2"),
        )
        .filter(F.col("md2") > MAHAL_THRESHOLD)
    )


_MAHAL_EXPR = (
    "((c.n_orders::DOUBLE - m.sx::DOUBLE / m.n::DOUBLE)"
    " * (c.n_orders::DOUBLE - m.sx::DOUBLE / m.n::DOUBLE)"
    " * (m.syy::DOUBLE / m.n::DOUBLE"
    "    - (m.sy::DOUBLE / m.n::DOUBLE) * (m.sy::DOUBLE / m.n::DOUBLE))"
    " - 2 * (c.n_orders::DOUBLE - m.sx::DOUBLE / m.n::DOUBLE)"
    " * (c.spend_usd::DOUBLE - m.sy::DOUBLE / m.n::DOUBLE)"
    " * (m.sxy::DOUBLE / m.n::DOUBLE"
    "    - (m.sx::DOUBLE / m.n::DOUBLE) * (m.sy::DOUBLE / m.n::DOUBLE))"
    " + (c.spend_usd::DOUBLE - m.sy::DOUBLE / m.n::DOUBLE)"
    " * (c.spend_usd::DOUBLE - m.sy::DOUBLE / m.n::DOUBLE)"
    " * (m.sxx::DOUBLE / m.n::DOUBLE"
    "    - (m.sx::DOUBLE / m.n::DOUBLE) * (m.sx::DOUBLE / m.n::DOUBLE)))"
    " / ((m.sxx::DOUBLE / m.n::DOUBLE"
    "     - (m.sx::DOUBLE / m.n::DOUBLE) * (m.sx::DOUBLE / m.n::DOUBLE))"
    "    * (m.syy::DOUBLE / m.n::DOUBLE"
    "       - (m.sy::DOUBLE / m.n::DOUBLE) * (m.sy::DOUBLE / m.n::DOUBLE))"
    "    - (m.sxy::DOUBLE / m.n::DOUBLE"
    "       - (m.sx::DOUBLE / m.n::DOUBLE) * (m.sy::DOUBLE / m.n::DOUBLE))"
    "      * (m.sxy::DOUBLE / m.n::DOUBLE"
    "         - (m.sx::DOUBLE / m.n::DOUBLE) * (m.sy::DOUBLE / m.n::DOUBLE)))"
)

_MAHAL_SQL = f"""
WITH cust AS (
  SELECT custkey, n_orders, cents // 100 AS spend_usd FROM (
    SELECT o_custkey AS custkey, count(*)::BIGINT AS n_orders,
           sum((o_totalprice::DECIMAL(12,2) * 100)::BIGINT)::BIGINT AS cents
    FROM orders GROUP BY 1
  )
),
m AS (
  SELECT count(*)::BIGINT AS n,
         sum(n_orders::DECIMAL(38,0)) AS sx,
         sum(spend_usd::DECIMAL(38,0)) AS sy,
         sum((n_orders * n_orders)::DECIMAL(38,0)) AS sxx,
         sum((n_orders * spend_usd)::DECIMAL(38,0)) AS sxy,
         sum((spend_usd * spend_usd)::DECIMAL(38,0)) AS syy
  FROM cust
)
SELECT c.custkey, c.n_orders, c.spend_usd,
       {sql_round(_MAHAL_EXPR, 6)} AS md2
FROM cust c CROSS JOIN m
WHERE {sql_round(_MAHAL_EXPR, 6)} > {MAHAL_THRESHOLD}
"""


QUERIES = {
    "revenue_mann_kendall": revenue_mann_kendall,
    "revenue_theil_sen": revenue_theil_sen,
    "revenue_runs_test": revenue_runs_test,
    "events_entropy_rate": events_entropy_rate,
    "nation_revenue_gini": nation_revenue_gini,
    "parts_jaccard_similarity": parts_jaccard_similarity,
    "customers_mahalanobis_outliers": customers_mahalanobis_outliers,
    "copurchase_triangles": copurchase_triangles,
    "momentum_contribution": momentum_contribution,
    "seasonal_decompose_daily": seasonal_decompose_daily,
    "purchase_attribution": purchase_attribution,
    "target_encode_priority": target_encode_priority,
    "equi_depth_bins_totalprice": equi_depth_bins_totalprice,
    "ab_test_events": ab_test_events,
    "ab_mannwhitney_events": ab_mannwhitney_events,
    "events_lead_lag": events_lead_lag,
    "users_kaplan_meier": users_kaplan_meier,
    "conversion_wilson_ci": conversion_wilson_ci,
    "event_segment_mutual_info": event_segment_mutual_info,
    "events_mad_outliers": events_mad_outliers,
    "cohort_retention": cohort_retention,
    "event_transitions": event_transitions,
    "regr_price_by_brand": regr_price_by_brand,
    "events_rolling_zscore": events_rolling_zscore,
    "docs_rag_chunks": docs_rag_chunks,
    "orders_gap_fill": orders_gap_fill,
    "rolling_7d_distinct_users": rolling_7d_distinct_users,
    "rolling_7d_distinct_sketch": rolling_7d_distinct_sketch,
    "nation_trade_pagerank": nation_trade_pagerank,
    "nation_trade_pagerank2": nation_trade_pagerank2,
    "max_concurrent_sessions": max_concurrent_sessions,
    "rag_chunk_dedup": rag_chunk_dedup,
    "rfm_segments": rfm_segments,
    "conversion_lag_histogram": conversion_lag_histogram,
    "lineitem_skew_profile": lineitem_skew_profile,
    "part_pair_affinity": part_pair_affinity,
    "top_event_paths": top_event_paths,
    "revenue_mom_yoy": revenue_mom_yoy,
    "revenue_cusum_shifts": revenue_cusum_shifts,
    "revenue_acf": revenue_acf,
    "revenue_holt_forecast": revenue_holt_forecast,
    "revenue_holt_winters": revenue_holt_winters,
    "copurchase_kcore": copurchase_kcore,
    "copurchase_link_prediction": copurchase_link_prediction,
    "copurchase_communities": copurchase_communities,
    "price_psi_drift": price_psi_drift,
    "totalprice_quantile_transform": totalprice_quantile_transform,
    "priority_mix_chi2": priority_mix_chi2,
    "bootstrap_mean_ci": bootstrap_mean_ci,
    "events_dow_hour_profile": events_dow_hour_profile,
    "region_nation_revenue_share": region_nation_revenue_share,
    "benford_totalprice": benford_totalprice,
}

ORACLES = {
    "revenue_mann_kendall": _MANN_KENDALL_SQL,
    "revenue_theil_sen": _THEIL_SEN_SQL,
    "revenue_runs_test": _RUNS_SQL,
    "events_entropy_rate": _ENTROPY_RATE_SQL,
    "nation_revenue_gini": _GINI_SQL,
    "parts_jaccard_similarity": _PARTS_JACCARD_SQL,
    "customers_mahalanobis_outliers": _MAHAL_SQL,
    "copurchase_triangles": _TRIANGLES_SQL,
    "ab_test_events": _AB_TEST_SQL,
    "ab_mannwhitney_events": _MWU_SQL,
    "events_lead_lag": _LL_SQL,
    "users_kaplan_meier": _KM_SQL,
    "conversion_wilson_ci": _WILSON_SQL,
    "event_segment_mutual_info": _MI_SQL,
    "events_mad_outliers": _MAD_SQL,
    "momentum_contribution": _CONTRIB_SQL,
    "seasonal_decompose_daily": _SEASONAL_SQL,
    "purchase_attribution": _ATTRIBUTION_SQL,
    "target_encode_priority": _TARGET_ENC_SQL,
    "equi_depth_bins_totalprice": _EDB_SQL,
    "cohort_retention": _COHORT_SQL,
    "event_transitions": _TRANSITIONS_SQL,
    "regr_price_by_brand": _REGR_SQL,
    "events_rolling_zscore": _ZSCORE_SQL,
    "docs_rag_chunks": _CHUNKS_SQL,
    "orders_gap_fill": _GAP_FILL_SQL,
    "rolling_7d_distinct_users": _ROLLING_DISTINCT_SQL,
    "rolling_7d_distinct_sketch": _ROLLING_SKETCH_SQL,
    "nation_trade_pagerank": _PAGERANK_SQL,
    "nation_trade_pagerank2": _PAGERANK2_SQL,
    "max_concurrent_sessions": _max_concurrent_sql(),
    "rag_chunk_dedup": _CHUNK_DEDUP_SQL,
    "rfm_segments": _RFM_SQL,
    "conversion_lag_histogram": _CONVERSION_SQL,
    "lineitem_skew_profile": _skew_sql(),
    "part_pair_affinity": _AFFINITY_SQL,
    "top_event_paths": _PATHS_SQL,
    "revenue_mom_yoy": _MOM_YOY_SQL,
    "revenue_cusum_shifts": _CUSUM_SQL,
    "revenue_acf": _ACF_SQL,
    "revenue_holt_forecast": _HOLT_SQL,
    "revenue_holt_winters": _HW_SQL,
    "copurchase_kcore": _kcore_sql(),
    "copurchase_link_prediction": _LINKPRED_SQL,
    "copurchase_communities": _lpa_sql(),
    "price_psi_drift": _PSI_SQL,
    "totalprice_quantile_transform": _QT_SQL,
    "priority_mix_chi2": _CHI2_SQL,
    "bootstrap_mean_ci": _bootstrap_sql(),
    "events_dow_hour_profile": _DOW_HOUR_SQL,
    "region_nation_revenue_share": _REGION_SHARE_SQL,
    "benford_totalprice": _benford_sql(),
}
