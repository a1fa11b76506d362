"""Distributed exact order statistics (selection) without a global sort.

The naive way to bucket rows by global rank — ``ntile(k) OVER (ORDER BY
…)`` — plans an ``Exchange SinglePartition``: the entire table moves to
ONE task and sorts there. Fine as a small-data oracle twin, fatal at
100 TB. This module implements the scale path:

1. ``percentile_approx`` (one distributed aggregate) brackets each
   target rank's value. Spark's sketch guarantees rank error ≤
   n/accuracy, so the element at the target rank provably lies inside a
   narrow value band (~2·n/accuracy rows wide).
2. One more aggregate counts rows strictly above each band; a
   band-partitioned window ``row_number`` over only the tiny band rows
   pins the precise boundary element, tie-broken on a unique key so the
   total order — and therefore the bucket assignment — is exactly the
   one ``ntile`` would produce.
3. Bucket assignment is then a broadcast-literal ``when`` chain over
   the 3 (value, key) cut points: a narrow map-side projection, zero
   shuffles, zero Window nodes.

Every pass is fully parallel; driver-side state is O(#cuts) — the
refinement collects exactly the boundary elements (one row per cut),
never the band pool. Band WIDTH (~2·n/accuracy + value-tie
multiplicity, ~0.02 % of the table at the default accuracy of 10 000)
now only sizes the executor-side per-band sort: a single value held by
a large fraction of rows widens its band's partition (skewed-band
task), but driver memory stays O(#cuts) regardless.

Reference parity: the reference engine has no selection operator; this
backs the catalog's `agg_quartiles_orders`, the scale twin of
`window_ntile_orders` (same oracle — the two strategies are proven
identical by the shared driver hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ntile_cut_ranks(n: int, buckets: int) -> list[int]:
    """The 1-indexed ranks of the LAST row of each of the first
    ``buckets - 1`` ntile buckets (ntile semantics: the first n % k
    buckets get one extra row). With n < buckets the trailing buckets
    are empty — their cut ranks repeat the last occupied rank, and the
    strictly-after boundary comparison then skips them, exactly like
    ``F.ntile``."""
    if n < 1:
        raise ValueError(f"ntile over {n} rows")
    base, extra = divmod(n, buckets)
    cuts, cum = [], 0
    for i in range(buckets - 1):
        cum += base + (1 if i < extra else 0)
        cuts.append(max(cum, 1))
    return cuts


def exact_order_statistics(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    ranks: list[int],
    n: int | None = None,
    accuracy: int = 10_000,
) -> list[tuple]:
    """The exact (value, tie) element at each 1-indexed rank of the
    total order (``value_col`` DESC, ``tie_col`` ASC), computed with
    two distributed aggregates + one tiny top-k per rank — never a
    global sort. ``tie_col`` must be unique per row (it is what makes
    the order total and the answer exact)."""
    if n is None:
        n = df.count()
    if not ranks:
        return []
    if not all(1 <= b <= n for b in ranks):
        raise ValueError(f"ranks {ranks} out of range for n={n}")
    # rank error of the Greenwald-Khanna sketch is ≤ n/accuracy; +2 slack
    margin = n // accuracy + 2
    denom = float(max(n - 1, 1))
    quantiles = []
    for b in ranks:
        a = n - b + 1  # ascending rank of the target element
        quantiles.append(max(0.0, (a - 1 - margin) / denom))
        quantiles.append(min(1.0, (a - 1 + margin) / denom))
    brackets = df.select(
        F.percentile_approx(value_col, quantiles, accuracy).alias("qs")
    ).first()["qs"]
    bands = [(brackets[2 * i], brackets[2 * i + 1]) for i in range(len(ranks))]
    # one pass: rows strictly better (DESC) than each band's upper edge
    above = df.agg(
        *[
            F.sum((F.col(value_col) > F.lit(hi)).cast("long")).alias(f"c{i}")
            for i, (_, hi) in enumerate(bands)
        ]
    ).first()
    # ONE job refines every band DISTRIBUTED: tag each row with the
    # band indices it falls in (explode handles overlap), rank within
    # each band by a band-partitioned window — never a global sort —
    # and keep only the row at each band's target rank. The driver
    # receives exactly the <= len(ranks) boundary elements; band rows
    # themselves never leave the executors (pre-r08 this was a
    # collect() of the whole band pool, O(Σ band size) driver memory
    # — unbounded under value skew where ties widen a band).
    from pyspark.sql import Window

    band_tags = F.array(
        *[
            F.when(F.col(value_col).between(F.lit(lo), F.lit(hi)), F.lit(i))
            for i, (lo, hi) in enumerate(bands)
        ]
    )
    cand = df.select(
        F.col(value_col),
        F.col(tie_col),
        F.explode(F.filter(band_tags, lambda x: x.isNotNull())).alias(
            "__band"
        ),
    )
    ks = {i: b - (above[f"c{i}"] or 0) for i, b in enumerate(ranks)}
    k_expr = None
    for i, k in ks.items():
        cond = F.col("__band") == i
        k_expr = (
            F.when(cond, F.lit(k))
            if k_expr is None
            else k_expr.when(cond, F.lit(k))
        )
    wb = Window.partitionBy("__band")
    picked = (
        cand.withColumn(
            "__rn",
            F.row_number().over(
                wb.orderBy(F.col(value_col).desc(), F.col(tie_col).asc())
            ),
        )
        .filter(F.col("__rn") == k_expr)
        .select("__band", value_col, tie_col)
        .collect()
    )
    by_band = {r["__band"]: r for r in picked}
    out: list[tuple] = []
    for i, b in enumerate(ranks):
        r = by_band.get(i)
        if r is None:
            raise AssertionError(
                f"rank {b}: sketch bracket missed its guarantee "
                f"(k={ks[i]} outside band) — raise accuracy"
            )
        out.append((r[value_col], r[tie_col]))
    return out


def rank_bucket_assign(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    boundaries: list[tuple],
    bucket_col: str = "bucket",
) -> DataFrame:
    """Assign each row its rank bucket given the boundary elements
    (the LAST element of each bucket but the final one) as broadcast
    literals: bucket = 1 + number of boundaries the row sorts strictly
    after in (value DESC, tie ASC) order. A narrow projection — no
    shuffle, no Window."""
    expr = F.lit(1)
    for v, key in boundaries:
        after = (F.col(value_col) < F.lit(v)) | (
            (F.col(value_col) == F.lit(v)) & (F.col(tie_col) > F.lit(key))
        )
        expr = expr + after.cast("int")
    return df.withColumn(bucket_col, expr.cast("long"))


def ntile_assign(
    df: DataFrame,
    value_col: str,
    tie_col: str,
    buckets: int,
    accuracy: int = 10_000,
) -> DataFrame:
    """Exact ntile(buckets) over (value DESC, tie ASC) — identical
    output to ``F.ntile(buckets).over(Window.orderBy(...))`` but with a
    scale-safe plan (no Exchange SinglePartition, no WindowExec)."""
    n = df.count()
    if n == 0:
        return rank_bucket_assign(df, value_col, tie_col, [], bucket_col="bucket")
    cuts = ntile_cut_ranks(n, buckets)
    bounds = exact_order_statistics(df, value_col, tie_col, cuts, n=n, accuracy=accuracy)
    return rank_bucket_assign(df, value_col, tie_col, bounds, bucket_col="bucket")


# --------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis–Spirakis A-ES)
# --------------------------------------------------------------------------


def weighted_sample_without_replacement(
    df: DataFrame,
    *,
    key_col: str,
    weight_col: str,
    k: int,
    strata_cols: list[str] | None = None,
    salt: str = "wswr",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis 2006, algorithm A-ES): each row gets key ``u^(1/w)`` with
    ``u ~ Uniform(0,1]``; the k largest keys per stratum are an exact
    weighted sample without replacement.

    Determinism: ``u`` derives from the portable ``char_hash`` of
    ``key || salt`` — rerun-stable, restart-stable, engine-portable (the
    property every 100 TB pipeline wants from its sampler; same design
    as curation.sample_by_rates). We rank on the monotone transform
    ``ln(u)/w`` — selection and ranks depend only on the ORDER of
    scores, and the emitted columns are integers/strings, so no float
    ever reaches the output.

    Scale: one window per stratum (partitioned — never global). For a
    single global stratum at extreme scale, swap the window for the
    agg_topk pattern (partial top-k per partition, merge); semantics
    are identical.
    """
    from ..functions.textfns import HASH_MOD, char_hash

    strata = list(strata_cols or [])
    u = (
        char_hash(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
        + F.lit(1)
    ).cast("double") / F.lit(float(HASH_MOD + 1))
    score = F.log(u) / F.col(weight_col).cast("double")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*strata) if strata else Window.partitionBy()
    ).orderBy(F.desc("__score"), F.col(key_col))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__score", score)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("__score")
    )


def global_row_numbers(
    df: DataFrame, order_cols: list[str], *, bucket: str
) -> DataFrame:
    """Scale-safe ``row_number() OVER (ORDER BY order_cols)`` — dense
    1-based global ranks without the single-partition global window.

    Requires ``bucket`` to be an ORDER-PREFIX of ``order_cols``: every
    row in bucket b must sort before every row in any bucket b' > b
    (e.g. bucket = leading characters of the first order column). Ranks
    are then per-bucket ``row_number`` (a partitioned window — each
    bucket sorts independently) plus the cumulative count of all
    earlier buckets. The offset table is ONE row per bucket — a tiny
    aggregate whose own window is bounded by bucket cardinality, not
    data size — and joins back as a broadcast. The ordering must be
    total (include a unique tie-break column) or ranks within ties are
    nondeterministic.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(bucket).orderBy(*order_cols)
    local = df.withColumn("__lr", F.row_number().over(w))
    counts = df.groupBy(bucket).agg(F.count(F.lit(1)).alias("__n"))
    wo = Window.orderBy(bucket).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = counts.select(
        bucket,
        F.coalesce(F.sum("__n").over(wo), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(offs), bucket)
        .withColumn("rnk", (F.col("__lr") + F.col("__off")).cast("long"))
        .drop("__lr", "__off")
    )
