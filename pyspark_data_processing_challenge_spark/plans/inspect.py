"""Physical-plan inspection helpers.

Scale discipline is a plan property, not a hope: filters must reach the
scan (PushedFilters), dimension joins must broadcast, shuffle counts
must match the algebra. These helpers turn ``.explain`` into
assertions, so the plan shape of every headline query is pinned by a
regression test (tests/test_plan_shapes.py) and a future edit that
silently introduces an extra shuffle or loses pushdown fails CI.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical plan string (post-AQE initial plan)."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def has_pushed_filters(df: DataFrame) -> bool:
    """True if any file scan in the plan carries non-empty PushedFilters."""
    plan = executed_plan(df)
    return bool(re.search(r"PushedFilters: \[(?!\])", plan))


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema column lists of each file scan (column-pruning check)."""
    plan = executed_plan(df)
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def broadcast_join_count(df: DataFrame) -> int:
    """Broadcast joins of either flavor: hash (equi) or nested-loop
    (non-equi, e.g. a != filter over a broadcast side)."""
    plan = executed_plan(df)
    return plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")


def sort_merge_join_count(df: DataFrame) -> int:
    return executed_plan(df).count("SortMergeJoin")


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the initial physical plan (AQE may
    later coalesce them, never add)."""
    plan = executed_plan(df)
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan))


def wholestage_codegen_count(df: DataFrame) -> int:
    return len(re.findall(r"\*\(\d+\)", executed_plan(df)))


def raise_error_in_filter(df: DataFrame) -> bool:
    """True if any Filter node of the OPTIMIZED plan carries a
    PREDICATE-SHAPED side-effecting guard — ``assert_true(...)`` or
    ``isnull(raise_error(...))`` as a conjunct. Those are always-true
    asserts whose conjuncts reference only the guarded key, exactly
    what Catalyst's InferFiltersFromConstraints copies through
    equi-join equalities onto the OTHER relation, where the invariant
    may legitimately fail and the relocated assert detonates on rows
    that would never have matched (r11 curate_corpus post-mortem: the
    ``doc_id < 100000`` assert crossed cluster_canonical's anti-join
    onto the components side).

    A guard riding a CONSUMED data column (``concat(text, CASE WHEN ok
    THEN '' ELSE raise_error END)``) is permitted even when predicate
    pushdown substitutes it into a same-relation Filter (e.g. a quality
    ``length(text) >= n`` gate): the substituted conjunct references
    the consumed column itself, so it stays welded to its own relation
    — it can only transfer across a join that equates EVERY referenced
    attribute, in which case the matched rows satisfy the guard
    identically on both sides."""
    plan = optimized_plan(df)
    return any(
        "Filter" in line
        and ("assert_true(" in line or "isnull(raise_error" in line)
        for line in plan.splitlines()
    )


def global_window_over_raw(df: DataFrame) -> bool:
    """True if the plan funnels UNAGGREGATED data into a single
    partition for a Window — the one WindowExec shape that cannot scale
    (ntile/rank over a whole raw table). A single-partition window over
    a HashAggregate output (bounded cardinality, e.g. a day-level
    pre-aggregate) is fine and returns False.

    Approximation: plans print top-down, so the text after an
    ``Exchange SinglePartition`` is its subtree (plus later siblings);
    if no aggregate appears there, the exchange is moving raw rows."""
    plan = executed_plan(df)
    if "Window" not in plan:
        return False
    idx = plan.find("Exchange SinglePartition")
    if idx < 0:
        return False
    below = plan[idx:]
    return not ("HashAggregate" in below or "SortAggregate" in below or "ObjectHashAggregate" in below)
