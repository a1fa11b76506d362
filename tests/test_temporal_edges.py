"""Edge semantics of the as-of join and sessionization operators."""

from __future__ import annotations

import datetime as dt

from pyspark_data_processing_challenge_spark.operators import temporal


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_edges(spark):
    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01T10:00:00"), "p1"),  # before any right → null
            (1, ts("2024-01-01T12:00:00"), "p2"),  # exact tie with right → match
            (1, ts("2024-01-01T13:30:00"), "p3"),  # between rights → earlier one
            (2, ts("2024-01-01T09:00:00"), "p4"),  # key with no right rows
        ],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01T12:00:00"), 100),
            (1, ts("2024-01-01T13:00:00"), 200),
            (1, ts("2024-01-01T14:00:00"), 300),
        ],
        "user_id long, ts timestamp, click long",
    )
    out = {
        r["tag"]: r["click"]
        for r in temporal.asof_join(
            left,
            right,
            on=("user_id",),
            left_ts="ts",
            right_ts="ts",
            right_cols=("click",),
            suffix="",
        ).collect()
    }
    assert out == {"p1": None, "p2": 100, "p3": 200, "p4": None}


def test_sessionize_gap_boundary(spark):
    rows = [
        (1, ts("2024-01-01T10:00:00"), 1),
        (1, ts("2024-01-01T10:30:00"), 2),  # exactly 30min gap → SAME session
        (1, ts("2024-01-01T11:00:01"), 3),  # 30min+1s → new session
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    out = temporal.sessionize(
        df, key="user_id", ts_col="ts", gap_minutes=30.0, order_tiebreak=("event_id",)
    ).collect()
    sessions = {r["event_id"]: r["session_id"] for r in out}
    assert sessions[1] == sessions[2]
    assert sessions[3] == sessions[2] + 1
