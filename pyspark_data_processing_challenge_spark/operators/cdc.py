"""CDC / merge operators — MERGE INTO and SCD2 without a table format.

Delta/Iceberg provide transactional MERGE; their jars aren't in this
container (and plenty of estates run plain parquet), so these implement
the same logical semantics as pure DataFrame algebra:

- ``merge_upsert``: source rows win on key match, target rows survive
  otherwise, source-only rows insert. One anti-join + union — a single
  shuffle on the key.
- ``scd2_apply``: slowly-changing-dimension type 2 — each change closes
  the key's current version and appends a new open one; history rows
  keep (valid_from, valid_to] ranges. Window over (key, valid_from).

On a real lakehouse these become MERGE INTO / ``foreachBatch`` upserts;
the logical results are identical, which is what the oracle pins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame, source: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """UPSERT semantics of ``MERGE INTO target USING source ON keys
    WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *``.

    Columns must match. Source must be unique per key (enforce upstream
    — duplicate source keys make MERGE ambiguous and Delta would raise).
    """
    keep = target.join(source.select(*keys), list(keys), "left_anti")
    return keep.unionByName(source)


def merge_apply(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    *,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Full MERGE semantics including deletes: ``WHEN MATCHED AND
    op='D' THEN DELETE / WHEN MATCHED THEN UPDATE SET * / WHEN NOT
    MATCHED [AND op<>'D'] THEN INSERT *``.

    Every source key removes its target row (anti-join); non-delete
    source rows then re-insert their new version. Still one shuffle on
    the key plus a union — the delete arm costs nothing extra.

    A NULL in ``op_col`` is an upsert, not a delete: the comparison is
    null-safe, because a plain ``!=`` filter would drop the null-op row
    from the upserts while the anti-join still removed its target row —
    turning a malformed op into a silent DELETE.
    """
    keep = target.join(source.select(*keys), list(keys), "left_anti")
    upserts = source.filter(
        ~F.col(op_col).eqNullSafe(F.lit(delete_op))
    ).drop(op_col)
    return keep.unionByName(upserts)


def changelog_compact(
    log: DataFrame,
    keys: Sequence[str],
    *,
    version_col: str = "version",
    op_col: str = "op",
    delete_op: str = "D",
    keep_tombstones: bool = False,
) -> DataFrame:
    """Compact a multi-version CDC changelog (Debezium/Kafka topic
    shape: many I/U/D ops PER KEY, ordered by ``version_col``) into the
    current snapshot — the log-compaction step that turns a change
    stream back into a table.

    Last-writer-wins per key: the row with the highest version supplies
    every payload column; keys whose latest op is ``delete_op``
    disappear. Implemented as ONE ``max_by`` aggregation, not a window +
    filter: ``max_by`` carries a (version, value) pair per column that
    combines map-side, so a 100 TB log compacts with partial aggregation
    before the single key shuffle — a ranking window would shuffle the
    full log first and keep every version resident for sorting.

    Versions must be unique per key (CDC offsets are); ties would make
    ``max_by`` nondeterministic. The latest-op comparison is null-safe:
    a NULL op is an upsert, never a silent delete (merge_apply's rule).

    ``keep_tombstones=True`` retains latest-op-delete keys WITH the op
    column — the per-batch form for a compacted store whose LATER
    readers must still see that a key died (streaming CDC apply:
    within-batch compaction keeps tombstones, the snapshot read over
    all batches drops them).
    """
    payload = [
        c for c in log.columns if c not in (*keys, version_col, op_col)
    ]
    compacted = log.groupBy(*[F.col(k) for k in keys]).agg(
        *[F.max_by(c, version_col).alias(c) for c in payload],
        F.max(version_col).alias(version_col),
        F.max_by(op_col, version_col).alias(op_col),
    )
    if keep_tombstones:
        return compacted
    return compacted.filter(
        ~F.col(op_col).eqNullSafe(F.lit(delete_op))
    ).drop(op_col)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    *,
    op_col: str = "op",
) -> DataFrame:
    """Change-data-capture BETWEEN two snapshots: emit one row per
    changed key with op I (new only), D (old only), or U (present in
    both, any compare column differs). Unchanged keys are silent.

    One full-outer join on the key; comparisons are null-safe (<=>),
    and presence is detected via never-null marker columns so nullable
    compare columns can't masquerade as absent rows.
    The reverse of merge_apply: diff(old, merge_apply(old, src)) == src.
    """
    o = old.select(*keys, F.lit(1).alias("__in_old"),
                   *[F.col(c).alias(f"__o_{c}") for c in compare_cols])
    n = new.select(*keys, F.lit(1).alias("__in_new"),
                   *[F.col(c).alias(f"__n_{c}") for c in compare_cols])
    j = o.join(n, list(keys), "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    op = (
        F.when(F.col("__in_old").isNull(), F.lit("I"))
        .when(F.col("__in_new").isNull(), F.lit("D"))
        .when(changed, F.lit("U"))
    )
    return (
        j.withColumn(op_col, op)
        .filter(F.col(op_col).isNotNull())
        .select(*keys, op_col)
    )


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    *,
    key: str,
    version_col: str = "version",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    open_sentinel: int | None = None,
) -> DataFrame:
    """Type-2 SCD: ``dim`` holds history rows (valid_from, valid_to with
    null/sentinel = open); ``changes`` holds new attribute versions with
    a ``version_col`` ordering (monotonic int or epoch).

    Result: previous open rows of changed keys are closed at the change
    version; change rows append as the new open version; multiple
    changes for one key chain correctly (each closes the previous).
    Implementation: union dim + stamped changes, then a per-key window
    sets each row's valid_to to the next row's valid_from.
    """
    attr_cols = [c for c in dim.columns if c not in (valid_from, valid_to)]
    stamped = changes.select(
        *[F.col(c) for c in attr_cols if c in changes.columns],
        F.col(version_col).alias(valid_from),
    )
    base = dim.select(*attr_cols, F.col(valid_from))
    merged = base.unionByName(stamped.select(*attr_cols, valid_from))
    w = Window.partitionBy(key).orderBy(valid_from)
    nxt = F.lead(valid_from).over(w)
    close = nxt if open_sentinel is None else F.coalesce(
        nxt, F.lit(open_sentinel)
    )
    return merged.withColumn(valid_to, close)
