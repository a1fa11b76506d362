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
