from .inspect import (
    broadcast_join_count,
    exchange_count,
    executed_plan,
    global_window_over_raw,
    has_pushed_filters,
    optimized_plan,
    raise_error_in_filter,
    scan_read_schema,
    sort_merge_join_count,
    wholestage_codegen_count,
)

__all__ = [
    "executed_plan",
    "optimized_plan",
    "has_pushed_filters",
    "scan_read_schema",
    "broadcast_join_count",
    "sort_merge_join_count",
    "exchange_count",
    "wholestage_codegen_count",
    "global_window_over_raw",
    "raise_error_in_filter",
]
