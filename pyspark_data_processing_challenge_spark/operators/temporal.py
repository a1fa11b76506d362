"""Temporal operators Spark lacks natively: as-of join, sessionization.

Both are implemented as compositions of built-in operators (one shuffle
each, no UDFs) — the scale path for event-stream enrichment.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: for each left row, attach the right row with the
    greatest ``right_ts <= left_ts`` within the same ``on`` keys
    (DuckDB/pandas ``merge_asof`` 'backward' semantics).

    Implementation: union both sides with a marker, one window sort per
    key ordered by (ts, marker) — right rows sort before left rows at
    equal ts, so ties match — then ``last_value(..., ignoreNulls)``
    carries the latest right values forward. ONE shuffle on ``on`` keys,
    linear in |left|+|right|; no per-key quadratic join. Right rows must
    be unique per (keys, ts) for deterministic output — pre-aggregate
    duplicates first.
    """
    on = list(on)
    lcols = [c for c in left.columns if c not in on and c != left_ts]
    l_marked = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    r_marked = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    merged = l_marked.unionByName(r_marked)
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        *on,
        "__ts",
        "__is_left",
        *lcols,
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
    )
    return (
        filled.filter(F.col("__is_left") == 1)
        .withColumnRenamed("__ts", left_ts)
        .drop("__is_left")
    )


def sessionize(
    df: DataFrame,
    *,
    key: str,
    ts_col: str,
    gap_minutes: float = 30.0,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap from
    the previous event exceeds ``gap_minutes``. Adds ``session_id``
    (1-based per key). One shuffle on ``key``; cumulative-sum window.
    """
    order = [F.col(ts_col), *[F.col(c) for c in order_tiebreak]]
    w_order = Window.partitionBy(key).orderBy(*order)
    gap_sec = F.col(ts_col).cast("double") - F.lag(F.col(ts_col)).over(w_order).cast(
        "double"
    )
    new_session = F.when(
        gap_sec.isNull() | (gap_sec > gap_minutes * 60.0), F.lit(1)
    ).otherwise(F.lit(0))
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        "session_id", F.sum(new_session).over(w_cum).cast("long")
    )


def activity_streaks(
    df: DataFrame,
    *,
    entity_col: str,
    ts_col: str,
) -> DataFrame:
    """Gaps-and-islands: per entity, summarize runs of CONSECUTIVE
    active calendar days (the classic streak analysis the reference's
    relational surface can't express — SURVEY.md §2.5 has no windows).

    Method: distinct (entity, day) → ``day - row_number()`` is constant
    within a consecutive run (the island key) → two aggregates. Every
    window is partitioned by entity; nothing global, scale-safe.

    Returns per entity: active_days, n_streaks, max_streak, and
    max_streak_start (earliest start among longest streaks).
    """
    days = df.select(
        F.col(entity_col).alias("entity"), F.to_date(F.col(ts_col)).alias("day")
    ).distinct()
    w = Window.partitionBy("entity").orderBy("day")
    streaks = (
        days.withColumn(
            "__g", F.date_sub(F.col("day"), F.row_number().over(w))
        )
        .groupBy("entity", "__g")
        .agg(
            F.count(F.lit(1)).alias("len"),
            F.min("day").alias("start"),
        )
    )
    per_entity = streaks.groupBy("entity").agg(
        F.sum("len").alias("active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").alias("max_streak"),
    )
    best = (
        streaks.join(per_entity, "entity")
        .filter(F.col("len") == F.col("max_streak"))
        .groupBy("entity")
        .agg(F.min("start").alias("max_streak_start"))
    )
    return (
        per_entity.join(best, "entity")
        .select(
            F.col("entity").alias(entity_col),
            "active_days",
            "n_streaks",
            "max_streak",
            "max_streak_start",
        )
    )


def m4_downsample(
    df: DataFrame,
    *,
    series_col: str,
    ts_col: str,
    value_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB 2014): per
    (series, time bucket) keep first/last/min/max of the value — the
    four points that make a line-chart rendering of the bucket
    pixel-perfect. ONE hash aggregate (partial + final, map-side
    combined); this is how dashboards read billion-point series.

    Duplicate timestamps within a series×bucket are tie-broken on the
    VALUE: v_first is the min over lexicographic (ts, value) pairs,
    v_last the max — deterministic across engines/partitionings even
    when ts collides (a bare min_by/max_by would be engine-order
    dependent; ADVICE r05).
    """
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket")
    tv = F.struct(F.col(ts_col).alias("t"), F.col(value_col).alias("v"))
    return df.groupBy(series_col, b).agg(
        F.min(tv)["v"].alias("v_first"),
        F.max(tv)["v"].alias("v_last"),
        F.min(value_col).alias("v_min"),
        F.max(value_col).alias("v_max"),
        F.min(ts_col).alias("ts_first"),
        F.max(ts_col).alias("ts_last"),
        F.count(F.lit(1)).alias("n_points"),
    )


def funnel_stages(
    df: DataFrame,
    *,
    entity_col: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
) -> DataFrame:
    """Ordered funnel analysis: for each entity, the earliest time of
    stage 1, then the earliest stage-2 event STRICTLY AFTER it, and so
    on — the classic view→click→purchase conversion question, answered
    in ONE shuffle (a per-entity collect) plus row-local HOF passes.

    Each stage's timestamp is staged as its own projected column before
    the next stage's lambda references it (HOF staging rule — an inline
    reference would re-evaluate the previous stage per element).
    Returns (entity, t_<stage>..., stage) where ``stage`` counts how
    deep the entity got. Requires unique timestamps per entity for
    determinism (true for µs event streams).
    """
    evs = (
        df.select(
            F.col(entity_col).alias("entity"),
            F.struct(
                F.col(ts_col).alias("ts"), F.col(type_col).alias("et")
            ).alias("e"),
        )
        .groupBy("entity")
        .agg(F.array_sort(F.collect_list("e")).alias("__evs"))
    )
    out = evs
    prev: str | None = None
    names = []
    for i, stage in enumerate(stages):
        col = f"t_{stage}"
        names.append(col)
        if prev is None:
            flt = out.withColumn(
                "__m",
                F.filter(F.col("__evs"), lambda e: e["et"] == F.lit(stage)),
            )
        else:
            pc = prev

            def mk(stage=stage, pc=pc):
                return F.filter(
                    F.col("__evs"),
                    lambda e: (e["et"] == F.lit(stage))
                    & (e["ts"] > F.col(pc)),
                )

            flt = out.withColumn("__m", mk())
        out = flt.withColumn(
            col, F.array_min(F.transform(F.col("__m"), lambda e: e["ts"]))
        ).drop("__m")
        prev = col
    # ascending build → the deepest stage is the OUTERMOST when, so the
    # deepest non-null timestamp wins
    stage_expr = F.lit(0)
    for i, col in enumerate(names):
        stage_expr = F.when(F.col(col).isNotNull(), i + 1).otherwise(
            stage_expr
        )
    return out.select(
        F.col("entity").alias(entity_col),
        *[F.col(c) for c in names],
        stage_expr.cast("int").alias("stage"),
    )


def throttle(
    df: DataFrame,
    key_cols: Sequence[str],
    *,
    ts_col: str,
    id_col: str,
    gap_seconds: float,
) -> DataFrame:
    """Debounce / rate-limit dedup: per key, keep an event only if at
    least ``gap_seconds`` passed since the last KEPT event — the
    notification-throttle / retry-collapse semantics. This is NOT the
    lag() predicate (gap vs the previous event): a burst of closely
    spaced events must all collapse onto the burst's FIRST event, which
    makes the kept set a recursive statistic — so it computes as one
    per-key sorted fold over (ts, id) pairs (the CUSUM/Holt shape),
    carrying (last-kept timestamp, kept ids) through the array
    aggregate. Integer epoch-microsecond arithmetic end to end: the
    fold is engine-exact and oracle-hashable.

    Scale shape: one groupBy(key) shuffle; each group's events must fit
    one array (true for per-user event streams; a key with unbounded
    history would sessionize first). Output: (key_cols..., id) of kept
    events, exploded back to rows.
    """
    gap_us = int(round(gap_seconds * 1_000_000))
    pair = F.struct(
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(id_col).alias("id"),
    )
    g = df.groupBy(*[F.col(k) for k in key_cols]).agg(
        F.array_sort(F.collect_list(pair)).alias("__evs")
    )
    zero = F.struct(
        F.lit(-1).cast("long").alias("last"),
        F.array().cast("array<long>").alias("kept"),
    )

    def step(acc, x):
        keep = (acc["last"] < 0) | (
            (x["us"] - acc["last"]) >= F.lit(gap_us)
        )
        return F.struct(
            F.when(keep, x["us"]).otherwise(acc["last"]).alias("last"),
            F.when(
                keep, F.array_append(acc["kept"], x["id"])
            ).otherwise(acc["kept"]).alias("kept"),
        )

    folded = g.select(
        *key_cols,
        F.aggregate(F.col("__evs"), zero, step).alias("__acc"),
    )
    return folded.select(
        *key_cols, F.explode(F.col("__acc.kept")).alias(id_col)
    )
