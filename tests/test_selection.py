"""Distributed order statistics (operators/selection.py): the scale
path must produce EXACTLY the assignment a global-sort ntile would —
including tie-heavy values and every n mod buckets residue."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pyspark_data_processing_challenge_spark.operators import selection


def test_ntile_cut_ranks():
    # 10 rows, 4 buckets -> sizes 3,3,2,2 -> cuts at 3,6,8
    assert selection.ntile_cut_ranks(10, 4) == [3, 6, 8]
    assert selection.ntile_cut_ranks(8, 4) == [2, 4, 6]
    # fewer rows than buckets: trailing buckets empty, cut ranks repeat
    assert selection.ntile_cut_ranks(3, 4) == [1, 2, 3]
    assert selection.ntile_cut_ranks(1, 4) == [1, 1, 1]
    with pytest.raises(ValueError):
        selection.ntile_cut_ranks(0, 4)


def test_ntile_assign_fewer_rows_than_buckets(spark):
    from pyspark.sql import Window

    df = spark.range(3).select(
        (F.col("id") % 2).cast("double").alias("v"), F.col("id").alias("k")
    )
    got = {
        r["k"]: r["bucket"]
        for r in selection.ntile_assign(df, "v", "k", 5).collect()
    }
    w = Window.orderBy(F.col("v").desc(), F.col("k"))
    want = {
        r["k"]: r["bucket"]
        for r in df.select(
            "k", F.ntile(5).over(w).cast("long").alias("bucket")
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("n", [4, 5, 6, 7, 101])
@pytest.mark.parametrize("buckets", [2, 4])
def test_ntile_assign_matches_window_ntile(spark, n, buckets):
    # heavy value ties (v = i % 3) force the tie-break path at the
    # boundaries; low accuracy widens the sketch band deliberately
    df = spark.range(n).select(
        (F.col("id") % 3).cast("double").alias("v"), F.col("id").alias("k")
    )
    got = selection.ntile_assign(df, "v", "k", buckets, accuracy=100)
    w = Window.orderBy(F.col("v").desc(), F.col("k"))
    want = df.select("k", F.ntile(buckets).over(w).cast("long").alias("bucket"))
    g = {r["k"]: r["bucket"] for r in got.select("k", "bucket").collect()}
    e = {r["k"]: r["bucket"] for r in want.collect()}
    assert g == e


def test_ntile_assign_dominant_value_stays_off_driver(spark):
    """A single value held by 96% of rows widens every band it touches
    to ~the whole table. The refinement must still be exact — and,
    post-r08, the driver receives only the <=3 boundary rows (the band
    pool sorts executor-side in a band-partitioned window), so the
    degenerate distribution is a skewed task, not a driver OOM."""
    from pyspark.sql import Window

    n = 5000
    df = spark.range(n).select(
        F.when(F.col("id") % 25 == 0, F.col("id").cast("double"))
        .otherwise(F.lit(7.0))
        .alias("v"),
        F.col("id").alias("k"),
    )
    got = selection.ntile_assign(df, "v", "k", 4, accuracy=100)
    w = Window.orderBy(F.col("v").desc(), F.col("k"))
    want = df.select("k", F.ntile(4).over(w).cast("long").alias("bucket"))
    g = {r["k"]: r["bucket"] for r in got.select("k", "bucket").collect()}
    e = {r["k"]: r["bucket"] for r in want.collect()}
    assert g == e
