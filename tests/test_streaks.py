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
