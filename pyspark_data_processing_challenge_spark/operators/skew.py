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


def key_skew_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Key-distribution diagnosis for partitioning decisions: for each
    candidate key column, the distinct-key count, the hottest key and
    its row count, and the skew ratio (hottest / mean rows-per-key) —
    the number that says whether a groupBy/join on that key needs
    salting (``salted_sum_count``) or AQE skew splitting.

    One scan + a |cols|-wide explode (bounded fanout), one per-(col,key)
    aggregate, one per-col rollup — all map-side combined; never a
    driver-side loop over columns. The hottest key is picked by
    ``max_by`` over a zero-padded ``(count, key)`` sort string (DuckDB's
    arg_max cannot order by a struct, and lexicographic order on the
    18-padded count equals numeric order): deterministic under count
    ties, aggregate-only (no window over the per-key counts, whose
    cardinality is the table's key space at 100 TB).
    """
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("key_col"),
                        F.coalesce(F.col(c).cast("string"), F.lit("NULL")).alias(
                            "key_val"
                        ),
                    )
                    for c in cols
                ]
            )
        ).alias("kv")
    ).select("kv.key_col", "kv.key_val")
    counts = pairs.groupBy("key_col", "key_val").agg(F.count(F.lit(1)).alias("cnt"))
    from ..operators.relational import round2

    return (
        counts.groupBy("key_col")
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("cnt").alias("max_count"),
            F.max_by(
                "key_val",
                F.concat(
                    F.lpad(F.col("cnt").cast("string"), 18, "0"),
                    F.lit("|"),
                    F.col("key_val"),
                ),
            ).alias("top_key"),
        )
        .select(
            "key_col",
            "n_rows",
            "n_keys",
            "max_count",
            "top_key",
            round2(
                F.col("max_count").cast("double")
                / (F.col("n_rows").cast("double") / F.col("n_keys").cast("double")),
                4,
            ).alias("skew_ratio"),
        )
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    *,
    buckets: int = 8,
) -> DataFrame:
    """Skewed-key EQUI-JOIN without broadcast: a hot join key sends all
    its fact rows to one reducer in a plain shuffle join; salting
    spreads each key's rows over ``buckets`` partitions (reusing
    :func:`with_salt`'s row-local salt) and replicates the dim side
    ``buckets``x so every (key, salt) pair still finds its match. Cost:
    dim reads/shuffles buckets-fold — the right trade when dim is far
    smaller than the hot key's row count but too big to broadcast.
    (AQE's skew-join split is the runtime alternative; this is the
    structural form that also works pre-AQE or under
    statistics-blind plans.) Result is row-identical to the plain
    join — the catalog query registers the UNSALTED oracle, pinning
    that equivalence."""
    salted_fact = with_salt(fact, buckets)
    salted_dim = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("int"))
    return salted_fact.join(salted_dim, [on, SALT_COL]).drop(SALT_COL)
