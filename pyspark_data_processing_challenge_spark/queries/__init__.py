"""Query catalog: every operator exposed as (spark_fn, oracle_sql) pairs.

Each submodule defines ``QUERIES`` (name → fn(spark, sf_dir) → DataFrame)
and ``ORACLES`` (name → ANSI/DuckDB SQL over the driver's pre-registered
views). The driver hash-compares both at sf0.01 (BASELINE.json's t2
gate); ``bench.py`` times a headline subset at sf0.1.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import advanced, analytics, cdcq, extended, extra, llm, reference, relational

_MODULES = (reference, relational, llm, extended, cdcq, extra, advanced, analytics)

# The external driver records correctness verdicts for the first 50
# catalog entries in dict order. Entries that still need a driver
# verdict — new this round, previously red, or previously beyond the
# window — are pinned to the front; the rest of the 50 slots re-verify
# previously-green queries. Queries whose behavior already has a green
# driver verdict AND local test coverage rotate to the tail, with the
# round of that verdict recorded so window coverage is auditable
# without diffing CORRECTNESS history. Membership is asserted, so a
# renamed query fails loudly here instead of silently losing its slot.
# Every entry — windowed or rotated out — stays under
# tests/test_oracle_parity.py's bit-exact full-catalog gate (enforced
# by test_parity_covers_full_catalog).
_VERDICT_PRIORITY = [
    # --- need a (new) verdict this round ---
    "pq_codes",  # r05 red (canonicalizer crash on raw array) — now flattened
    "pq_trained_topk",  # new: Lloyd-trained PQ codebook + ADC top-k
    "image_phash_jpeg_near_dup",  # new: true baseline-JPEG decode recall gate
    "docs_char_entropy_explode",  # new: unbounded-alphabet entropy twin
    "docs_bpe_pair_counts",  # new: BPE tokenizer-training pair counts
    "audio_features",  # new: real PCM decode + peak/ZCR/RMS features
    "video_frame_stats",  # new: ISO-BMFF sample-table walk + frame sampling
    "image_resize_thumbs",  # new: true decode + nearest-neighbor resize
    "cms_heavy_hitters",  # new: mergeable count-min sketch, one-sided contract
    "bloom_join_prune",  # new: runtime-filter Bloom semi-join pruning
    "setsim_prefix_pairs",  # new: AllPairs prefix-filter similarity join
    "copurchase_triangles",  # new: degree-oriented triangle census
    "docs_bpe_merge_step",  # new: full BPE iteration (count-merge-recount)
    "histogram_quantile_sketch",  # new: mergeable histogram quantiles
    "zone_map_pruning",  # new: zone-map data-skipping report
    "embedding_random_projection",  # new: JL reduction, planted-pair recall
    "snapshot_drift_report",  # new: two-snapshot stats drift DQ gate
    "ab_test_events",  # new: Welch t-test from exact DECIMAL stats
    "audio_transcode_features",  # new: decode->decimate->re-encode loop
    "video_scene_cuts",  # new: shot-boundary detection over frame stats
    "zone_map_pruning_2d",  # new: z-tile vs 1D layout skipping for 2D boxes
    "sql_recursive_hierarchy",  # new: Spark 4 WITH RECURSIVE surface
    "event_segment_mutual_info",  # new: MI feature-dependence screen
    "ivm_daily_revenue",  # new: incremental view maintenance contract
    "image_cross_codec_near_dup",  # new: PNG/JPEG same-raster dedup
    "events_grouped_center_arrow",  # new: Spark 4 applyInArrow surface
    "events_mad_outliers",  # new: MAD robust outlier screen
    "salted_join_revenue",  # new: skew-salted join equivalence
    "ivf_trained_topk",  # new: Lloyd-trained coarse quantizer + probe
    # --- new round-6 analytics module ---
    "cohort_retention",
    "event_transitions",
    "regr_price_by_brand",
    "events_rolling_zscore",
    "docs_rag_chunks",
    "orders_gap_fill",
    "rolling_7d_distinct_users",
    "nation_trade_pagerank",
    "max_concurrent_sessions",
    "rag_chunk_dedup",
    "rfm_segments",
    "conversion_lag_histogram",
    "lineitem_skew_profile",
    "part_pair_affinity",
    "top_event_paths",
    "revenue_mom_yoy",
    "region_nation_revenue_share",
    "benford_totalprice",
    "docs_unigram_surprisal",
    "split_oov_rate",
    "nation_trade_pagerank2",
    # Queued for the r07 window (window is at its 50-slot cap; local
    # parity still gates them every round): collection_functions,
    # map_functions, target_encode_priority, equi_depth_bins_totalprice,
    # orders_expectations, purchase_attribution, rolling_7d_distinct_sketch,
    # momentum_contribution, seasonal_decompose_daily, docs_readability,
    # funnel_dropoff, sketch_overlap_users, corpus_manifest
]
# name -> CORRECTNESS round(s) with the green driver verdict backing
# the rotation (all retain stricter local bit-exact parity coverage)
_ROTATED_OUT = {
    # r01-only entries displaced from the 50-slot window by the round-6
    # analytics additions — oldest verdicts left, re-promote in r07
    "events_json_stats": "r01",
    "percentiles_by_type": "r01",
    "rollup_lineitem": "r01",
    "array_agg_lineitems": "r01",
    "pivot_event_counts": "r01",
    "semi_join_urgent_customers": "r01",
    "anti_join_quiet_customers": "r01",
    "set_ops_segments": "r01",
    "sql_revenue_by_nation": "r01",
    "window_topk_orders": "r01",
    "dedup_exact_groups": "r01",
    "simhash_values": "r01",
    "docs_fingerprint": "r01",
    # r01-only, but its scale twin agg_quartiles_orders carries green
    # r04+r05 verdicts on the shared oracle — lowest re-verify value
    "window_ntile_orders": "r01",
    # r01-only; six sibling multimodal queries carry newer verdicts
    "multimodal_meta": "r01",
    # r01-only; sibling window ops (window_running_total in-window,
    # window_rank_stats r02+r05) cover the family
    "window_lag_delta": "r01",
    # r01-only; setsim_prefix_pairs (in-window, brute-force oracle)
    # exercises exact n-gram Jaccard on the same corpus more strictly
    "ngram_jaccard_pairs": "r01",
    # r01-only; the Arrow twin shares the IDENTICAL oracle SQL and the
    # signature math is exercised by minhash_near_dup (r01+r02)
    "minhash_signatures": "r01",
    # r01-only; the embedding ANN family (topk/lsh r01+r02, quantize
    # r04, ivf/pq r05) carries newer verdicts on the same vector math
    "embedding_near_dup": "r01",
    # r01-only; TakeOrdered plan pinned by test_top20_uses_take_ordered
    "sort_top20_orders": "r01",
    # r01-only; window family covered by window_rank_stats (r02+r05)
    "window_running_total": "r01",
    # r01-only; the hourly aggregation is the streaming twins' batch
    # oracle (tests/test_streaming_multimodal.py) — locally re-proven
    "events_hourly": "r01",
    # r01-only simple filter ops; all four are composed inside
    # ref_flagship_pipeline_keyed, green r02+r05
    "op_equality_filter": "r01",
    "op_sentinel_filter": "r01",
    "op_membership_filter": "r01",
    "op_union_membership": "r01",
    "op_fill_nulls": "r01",
    "op_indicators": "r01",
    "op_date_filter": "r01",
    "op_standardize_units": "r01",
    # r01-only; the one-pass aggregate plan is pinned locally
    # (test_null_counts_single_pass) and the DQ family has fresh rows
    "op_null_counts": "r01",
    # r01-only; the as-of machinery carries newer verdicts via
    # orders_pit_acctbal (r05) and conversion_lag_histogram (in-window)
    "asof_join_purchases": "r01",
    # rotated in round 6 to make room for the analytics module
    # (each green in both r01 and r02)
    "ref_flagship_pipeline": "r01+r02",
    "minhash_near_dup": "r01+r02",
    "simhash_near_dup": "r01+r02",
    "embedding_topk": "r01+r02",
    "embedding_lsh_buckets": "r01+r02",
    "near_dup_clusters": "r01+r02",
    "curate_corpus": "r01+r02",
    "minhash_signatures_fast": "r01+r02",
    "dedup_drop_exact": "r01+r02",
    "docs_quality": "r01+r02",
    "docs_lang_id": "r01+r02",
    "docs_token_stats": "r01+r02",
    "op_dedup_subset": "r01+r02",
    "agg_pricing_summary": "r04",
    "join_revenue_by_nation": "r04",
    "sessionize_events": "r01+r02+r04",
    "agg_salted_revenue": "r02",
    # round-4 front-pinned additions: all got green r04 verdicts
    "docs_repetition": "r04",
    "events_variant_stats": "r04",
    "agg_quartiles_orders": "r04",
    "approx_percentiles_by_type": "r04",
    "image_phash": "r04",
    "image_phash_near_dup": "r04",
    "docs_decontaminate": "r04",
    "docs_split_assign": "r04",
    "docs_pack_sequences": "r04",
    "profile_orders": "r04",
    "kmeans_two_step": "r04",
    "docs_domain_mix": "r04",
    "embedding_quantize": "r04",
    "docs_sentences_udtf": "r04",
    "events_grouped_center": "r04",
    # round-5 front-pinned additions: green r05 verdicts
    "docs_dup_spans": "r05",
    "docs_strip_dup_spans": "r05",
    "docs_weighted_sample": "r05",
    "user_streaks": "r05",
    "docs_char_entropy": "r05",
    "events_arrow_scaled": "r05",
    "orders_zvalue": "r05",
    "orders_hilbert": "r05",
    "pq_topk": "r05",
    "sessionize_events_native": "r05",
    "events_m4_downsample": "r05",
    "docs_bm25": "r05",
    "docs_hashed_features": "r05",
    "sketch_merge_distinct": "r05",
    "ivfpq_topk": "r05",
    "orders_pit_acctbal": "r05",
    "events_funnel": "r05",
    # re-verified green in the r05 window
    "ref_flagship_pipeline_keyed": "r02+r05",
    "multimodal_decode": "r02+r05",
    "approx_distinct_stats": "r04+r05",
    "cdc_merge_orders": "r02+r05",
    "scd2_customer_history": "r02+r05",
    "ivf_assignments": "r02+r05",
    "ivf_topk": "r02+r05",
    "tfidf_top_terms": "r02+r05",
    "cube_orders": "r02+r05",
    "top_terms": "r02+r05",
    "string_functions": "r02+r05",
    "date_functions": "r02+r05",
    "range_join_promos": "r02+r05",
    "unpivot_lineitem": "r02+r05",
    "grouping_sets_orders": "r02+r05",
    "stratified_sample_docs": "r02+r05",
    "posexplode_tokens": "r02+r05",
    "regex_extract_parts": "r02+r05",
    "window_rank_stats": "r02+r05",
    "agg_conditional": "r02+r05",
    "kmeans_update_centroids": "r02+r05",
    "doc_length_histogram": "r02+r05",
    "multimodal_media_decode": "r04+r05",
    "docs_bpe_token_count": "r02+r05",
    "join_regional_revenue": "r02+r05",
    "rolling_7d_revenue": "r02+r05",
    "agg_topk_orders": "r04+r05",
    "docs_outlier_trim": "r04+r05",
    "fuzzy_match_parts": "r04+r05",
    "docs_pii_scrub": "r04+r05",
    "cdc_merge_delete_orders": "r04+r05",
    "snapshot_diff_orders": "r04+r05",
}


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
