"""Unit tests for gaps-and-islands streak detection
(operators/temporal.activity_streaks)."""

from __future__ import annotations

import datetime as dt

from pyspark_data_processing_challenge_spark.operators import temporal


def _run(spark, rows):
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = temporal.activity_streaks(df, entity_col="user_id", ts_col="ts")
    return {
        r.user_id: (r.active_days, r.n_streaks, r.max_streak, r.max_streak_start)
        for r in out.collect()
    }


def _ts(y, m, d, h=12):
    return dt.datetime(y, m, d, h)


def test_streaks_merge_and_split(spark):
    rows = [
        # user 1: 3-day streak spanning a month boundary, then a gap,
        # then a single day
        (1, _ts(2024, 1, 30)),
        (1, _ts(2024, 1, 31)),
        (1, _ts(2024, 2, 1)),
        (1, _ts(2024, 2, 5)),
        # user 2: two same-length streaks -> earliest start wins
        (2, _ts(2024, 3, 1)),
        (2, _ts(2024, 3, 2)),
        (2, _ts(2024, 3, 10)),
        (2, _ts(2024, 3, 11)),
    ]
    got = _run(spark, rows)
    assert got[1] == (4, 2, 3, dt.date(2024, 1, 30))
    assert got[2] == (4, 2, 2, dt.date(2024, 3, 1))


def test_multiple_events_one_day_count_once(spark):
    rows = [
        (7, _ts(2024, 5, 1, 1)),
        (7, _ts(2024, 5, 1, 9)),
        (7, _ts(2024, 5, 1, 23)),
        (7, _ts(2024, 5, 2, 3)),
    ]
    got = _run(spark, rows)
    assert got[7] == (2, 1, 2, dt.date(2024, 5, 1))


def test_funnel_order_matters(spark):
    from pyspark_data_processing_challenge_spark.operators import temporal as tp

    rows = [
        # user 1: full ordered funnel
        (1, _ts(2024, 1, 1, 9), "view"),
        (1, _ts(2024, 1, 1, 10), "click"),
        (1, _ts(2024, 1, 1, 11), "purchase"),
        # user 2: click BEFORE the first view -> stuck at stage 1
        (2, _ts(2024, 1, 1, 8), "click"),
        (2, _ts(2024, 1, 1, 9), "view"),
        # user 3: purchase before click -> stage 2 only
        (3, _ts(2024, 1, 1, 9), "view"),
        (3, _ts(2024, 1, 1, 10), "purchase"),
        (3, _ts(2024, 1, 1, 11), "click"),
        # user 4: no view at all -> stage 0
        (4, _ts(2024, 1, 1, 9), "click"),
        # user 5: later second view doesn't matter; click after first view
        (5, _ts(2024, 1, 1, 9), "view"),
        (5, _ts(2024, 1, 1, 10), "click"),
        (5, _ts(2024, 1, 1, 12), "view"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = tp.funnel_stages(
        df, entity_col="user_id", ts_col="ts", type_col="event_type",
        stages=["view", "click", "purchase"],
    )
    got = {r.user_id: r.stage for r in out.collect()}
    assert got == {1: 3, 2: 1, 3: 2, 4: 0, 5: 2}
