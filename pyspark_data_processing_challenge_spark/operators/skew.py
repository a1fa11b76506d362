"""Skew mitigation operators.

At 100 TB a single hot key turns one reducer into the job's critical
path. AQE's skew-join splitting handles the join case at runtime
(enabled in session.py); these helpers handle the aggregation case
structurally: salt the key, aggregate twice. The two-phase result is
identical to the direct aggregate — queries built on this register the
SAME oracle SQL as their unsalted twin, which pins that equivalence.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, buckets: int = 16) -> DataFrame:
    """Add a salt column spreading each key's rows over ``buckets``
    partial groups. spark_partition_id+monotonic id based — cheap, no
    hashing of the (possibly wide) row, deterministic per task layout
    but NOT stable across runs; correctness never depends on which
    bucket a row lands in."""
    return df.withColumn(
        SALT_COL, (F.monotonically_increasing_id() % buckets).cast("int")
    )


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    sums: dict[str, Column],
    *,
    buckets: int = 16,
    count_alias: str | None = None,
) -> DataFrame:
    """Two-phase skew-resistant aggregate: sums and counts compose over
    partial groups, so phase 1 aggregates (keys + salt) — spreading a
    hot key over ``buckets`` reducers — and phase 2 combines per key.

    ``sums``: output alias → input Column to sum.
    ``count_alias``: optional row-count output name.
    """
    partial_aggs = [F.sum(c).alias(f"__p_{name}") for name, c in sums.items()]
    if count_alias:
        partial_aggs.append(F.count(F.lit(1)).alias("__p_n"))
    partial = (
        with_salt(df, buckets)
        .groupBy(*keys, SALT_COL)
        .agg(*partial_aggs)
    )
    final_aggs = [
        F.sum(f"__p_{name}").alias(name) for name in sums
    ]
    if count_alias:
        final_aggs.append(F.sum("__p_n").alias(count_alias))
    return partial.groupBy(*keys).agg(*final_aggs)
