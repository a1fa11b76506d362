"""Relational transform operators — the reference's pipeline, generalized.

Each function below re-expresses one operator from SURVEY.md §2.2
(reference: data_process.py) as a composable, individually testable
DataFrame transform. Where the reference had an anti-pattern, the
idiomatic form is the default and the bug-compatible form is an opt-in
flag:

- R1 dedup (reference :242): default keyed subset (all-column hash of
  wide rows is shuffle-heavy at scale; the reference also hashed its
  injected lineage column, silently keeping cross-file duplicates).
- R5 membership filter (reference :118-136): default single-scan
  ``isin`` over the union of condition sets; the reference unioned two
  filtered scans, which double-reads the source and duplicates rows on
  overlapping sets.
- R8 unit standardization (reference :182-212): division guarded with
  ``try_divide`` — under Spark 4 ANSI defaults the reference throws
  DIVIDE_BY_ZERO on a zero-quantity converted row (verified, SURVEY §0).
- R2 date cast (reference :244): explicit strict/try policy instead of
  ANSI-throwing ``to_date`` by accident.

All logic is built-in Column expressions — no UDFs — so every operator
stays inside whole-stage codegen and Catalyst can push/prune/fold
around it.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# portable rounding
# --------------------------------------------------------------------------


def round2(c: Column, scale: int = 2) -> Column:
    """Half-up rounding via pure double arithmetic: floor(x*10^s + 0.5)/10^s.

    Spark's ``round()`` on doubles goes through BigDecimal string
    semantics which other engines (DuckDB, Postgres) don't reproduce
    bit-for-bit; this formula is plain IEEE ops, so any engine computes
    the identical double. Correct for non-negative inputs (prices,
    quantities); symmetric half-away-from-zero would need a sign branch.

    Overflow guard (hypothesis-found): Spark's ``floor`` yields a LONG,
    which overflows past 2^63 — and beyond 2^53 a double has no
    sub-integer precision to round anyway — so magnitudes >= 1e15 pass
    through unchanged. The SQL twin (queries/_util.sql_round) applies
    the same guard for bit parity.
    """
    m = float(10**scale)
    return F.when(F.abs(c) >= F.lit(1e15), c).otherwise(
        F.floor(c * m + F.lit(0.5)) / F.lit(m)
    )


# --------------------------------------------------------------------------
# R1 — deduplicate
# --------------------------------------------------------------------------


def dedup(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Exact deduplication (reference R1, data_process.py:242).

    Default ``subset=None`` is all-columns (reference semantics, minus
    the trap of including an injected lineage column — callers add
    lineage *after* dedup or pass an explicit subset). At scale prefer a
    key subset: Catalyst lowers this to a hash aggregate whose shuffle
    width is the subset, not the full row.
    """
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


# --------------------------------------------------------------------------
# R2 — date cast with explicit policy
# --------------------------------------------------------------------------


def with_date(
    df: DataFrame, col: str, fmt: str = "yyyyMMdd", *, policy: str = "try"
) -> DataFrame:
    """String→date in place (reference R2, data_process.py:244).

    ``policy='try'`` (default) nulls malformed input (``try_to_date``);
    ``policy='strict'`` keeps ANSI fail-fast. The reference used plain
    ``to_date`` and was one bad row away from a job abort (SURVEY §7.5.1).
    """
    if policy == "try":
        return df.withColumn(col, F.try_to_date(F.col(col), fmt))
    if policy == "strict":
        return df.withColumn(col, F.to_date(F.col(col), fmt))
    raise ValueError(f"unknown date policy {policy!r}")


# --------------------------------------------------------------------------
# R3 — inclusive date-range filter
# --------------------------------------------------------------------------


def filter_date_range(df: DataFrame, col: str, start: str, end: str) -> DataFrame:
    """Keep ``start <= col <= end`` (reference R3, data_process.py:91-103).

    Bounds are literals cast to date → constant-folded at plan time and
    pushed into the file scan (partition pruning when ``col`` is a
    partition column — the reason the sink partitions by date).
    """
    lo = F.lit(start).cast("date")
    hi = F.lit(end).cast("date")
    return df.filter((F.col(col) >= lo) & (F.col(col) <= hi))


# --------------------------------------------------------------------------
# R4 — equality filter with pass-through sentinel
# --------------------------------------------------------------------------


def filter_equality(
    df: DataFrame, col: str, value: str, *, sentinel: str = "TODOS"
) -> DataFrame:
    """``col == value`` unless value is the sentinel (case-insensitive),
    then no-op (reference R4, data_process.py:105-116). The match itself
    stays case-sensitive — the reference's documented asymmetry.
    """
    if value.upper() == sentinel.upper():
        return df
    return df.filter(F.col(col) == F.lit(value))


# --------------------------------------------------------------------------
# R5 — membership filter
# --------------------------------------------------------------------------


def filter_membership(
    df: DataFrame,
    col: str,
    condition_sets: Sequence[Iterable[str]],
    *,
    case_insensitive: bool = True,
    union_semantics: bool = False,
) -> DataFrame:
    """Disjunctive membership filter (reference R5, data_process.py:118-136).

    Default: ONE scan with ``upper(col).isin(set1 ∪ set2 ∪ …)`` — the
    plan the reference should have produced. ``union_semantics=True``
    reproduces the reference exactly: one filtered branch per set,
    ``unionByName`` — which scans the source N times and DUPLICATES rows
    matching overlapping sets. Kept only for golden-parity tests.
    """
    key = F.upper(F.col(col)) if case_insensitive else F.col(col)
    sets = [sorted({str(v) for v in s}) for s in condition_sets]
    if union_semantics:
        branches = [df.filter(key.isin(s)) for s in sets]
        out = branches[0]
        for b in branches[1:]:
            out = out.unionByName(b)
        return out
    merged = sorted({v for s in sets for v in s})
    return df.filter(key.isin(merged))


# --------------------------------------------------------------------------
# R6 — derived indicator columns
# --------------------------------------------------------------------------


def with_indicators(
    df: DataFrame,
    src_col: str,
    indicators: Mapping[str, Iterable[str]],
    *,
    case_insensitive: bool = True,
) -> DataFrame:
    """One 0/1 int column per entry: 1 iff ``src_col`` ∈ value set
    (reference R6, data_process.py:138-161). Null src falls to 0, like
    the reference (``upper(null).isin`` is null ⇒ falsy).
    """
    key = F.upper(F.col(src_col)) if case_insensitive else F.col(src_col)
    cols = {
        name: F.when(key.isin(sorted({str(v) for v in vals})), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        for name, vals in indicators.items()
    }
    return df.withColumns(cols)


# --------------------------------------------------------------------------
# R7 — null fill
# --------------------------------------------------------------------------


def fill_nulls(
    df: DataFrame,
    *,
    text_value: str | None = None,
    text_cols: Sequence[str] = (),
    numeric_value: float | None = None,
    numeric_cols: Sequence[str] = (),
) -> DataFrame:
    """Typed null fill (reference R7, data_process.py:163-180):
    one value for a set of text columns, one for numeric columns.
    Plans as ``coalesce(col, lit)`` projections — no shuffle.
    """
    out = df
    if text_cols and text_value is not None:
        out = out.na.fill(text_value, subset=list(text_cols))
    if numeric_cols and numeric_value is not None:
        out = out.na.fill(numeric_value, subset=list(numeric_cols))
    return out


# --------------------------------------------------------------------------
# R8 — unit standardization
# --------------------------------------------------------------------------


def standardize_units(
    df: DataFrame,
    *,
    qty_col: str,
    price_col: str,
    unit_col: str,
    from_unit: str,
    factor: float,
    to_unit: str,
    qty_out: str = "cantidad_estandar",
    price_out: str = "precio_estandar",
    unit_out: str = "unidad_estandar",
    price_scale: int = 2,
    reference_round: bool = False,
) -> DataFrame:
    """Conditional unit conversion (reference R8, data_process.py:182-212).

    For rows with ``upper(unit)==from_unit``: qty_out = qty*factor and
    price_out = round(price/qty_out, scale) — i.e. price on a converted
    row is treated as the line total and re-derived per standard unit.
    Other rows pass through. ``unit_out`` is unconditionally ``to_unit``
    for ALL rows (reference semantics, :207-210).

    Division uses ``try_divide`` (null on zero/null divisor) — the
    reference's bare ``/`` throws DIVIDE_BY_ZERO under ANSI (SURVEY §0).
    Rounding uses the portable :func:`round2`; ``reference_round=True``
    switches to Spark's native ``round`` (BigDecimal HALF_UP) for
    bit-parity with the reference's committed golden outputs.
    """
    is_conv = F.upper(F.col(unit_col)) == F.lit(from_unit.upper())
    qty_std = F.when(is_conv, F.col(qty_col) * F.lit(factor)).otherwise(F.col(qty_col))
    out = df.withColumn(qty_out, qty_std)
    divided = F.try_divide(F.col(price_col), F.col(qty_out))
    rounded = (
        F.round(divided, price_scale)
        if reference_round
        else round2(divided, price_scale)
    )
    price_std = F.when(is_conv, rounded).otherwise(F.col(price_col))
    out = out.withColumn(price_out, price_std)
    return out.withColumn(unit_out, F.lit(to_unit))


# --------------------------------------------------------------------------
# R9 — computed total
# --------------------------------------------------------------------------


def with_total(
    df: DataFrame, total_col: str, qty_col: str, price_col: str
) -> DataFrame:
    """``total = qty * price`` (reference R9, data_process.py:259-262)."""
    return df.withColumn(total_col, F.col(qty_col) * F.col(price_col))


# --------------------------------------------------------------------------
# R10 — rename + reorder projection
# --------------------------------------------------------------------------


def rename_and_order(
    df: DataFrame,
    rename: Mapping[str, str] | None = None,
    order: Sequence[str] | None = None,
) -> DataFrame:
    """Bulk rename then impose final column order
    (reference R10, data_process.py:214-233). Both projections collapse
    into one Project node under Catalyst's CollapseProject.
    """
    out = df.withColumnsRenamed(dict(rename or {}))
    if order:
        out = out.select(*order)
    return out


# --------------------------------------------------------------------------
# R11 — pipeline composition helper
# --------------------------------------------------------------------------


def apply_pipeline(df: DataFrame, steps: Sequence) -> DataFrame:
    """Fold a list of ``DataFrame -> DataFrame`` transforms
    (reference R11's fixed chain, data_process.py:235-265, as data).
    No eager counts or ``show()`` mid-chain — observability belongs in
    ``df.observe`` metrics, not extra actions (SURVEY §4.2).
    """
    for step in steps:
        df = step(df)
    return df
