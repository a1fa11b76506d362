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
    # --- round-7 additions (first driver verdict needed) ---
    "image_rgb_phash_near_dup",  # new: truecolor 4:4:4 JPEG decode recall gate
    "image_rgb_histogram",  # new: bit-exact RGB PNG decode + channel stats
    "audio_spectral_features",  # new: WHT sequency + FFT centroid features
    "ivf_recall_eval",  # new: recall@k gate of IVF vs exact neighbors
    "docs_bigram_surprisal",  # new: corpus bigram-LM perplexity proxy
    "pq_rerank_topk",  # new: ADC shortlist + exact re-rank (two-stage ANN)
    "docs_containment_pairs",  # new: asymmetric containment join
    "revenue_cusum_shifts",  # new: recursion-free CUSUM change points
    "revenue_acf",  # new: ACF seasonality screen, row-local lag folds
    "pyds_docs_pushdown",  # new: Spark 4.1 Python DataSource pushFilters
    # --- queued since round 6 (locally bit-exact green; never had a
    # driver slot — the r06 window was at its 50-slot cap) ---
    "collection_functions",
    "map_functions",
    "target_encode_priority",
    "equi_depth_bins_totalprice",
    "orders_expectations",
    "purchase_attribution",
    "rolling_7d_distinct_sketch",
    "momentum_contribution",
    "seasonal_decompose_daily",
    "docs_readability",
    "funnel_dropoff",
    "sketch_overlap_users",
    "corpus_manifest",
    # --- r01-only verdict tail (VERDICT r06 item 3): 27 of the 32
    # r01-only queries re-promoted; the 5 with the lowest re-verify
    # value (window_ntile_orders, multimodal_meta, window_lag_delta,
    # ngram_jaccard_pairs, minhash_signatures — each covered by a
    # newer sibling verdict, see their _ROTATED_OUT notes) yielded
    # their slots to the ten round-7 queries above; they queue for
    # r08 ---
    "events_json_stats",
    "percentiles_by_type",
    "rollup_lineitem",
    "array_agg_lineitems",
    "pivot_event_counts",
    "semi_join_urgent_customers",
    "anti_join_quiet_customers",
    "set_ops_segments",
    "sql_revenue_by_nation",
    "window_topk_orders",
    "dedup_exact_groups",
    "simhash_values",
    "docs_fingerprint",
    "embedding_near_dup",
    "sort_top20_orders",
    "window_running_total",
    "events_hourly",
    "op_equality_filter",
    "op_sentinel_filter",
    "op_membership_filter",
    "op_union_membership",
    "op_fill_nulls",
    "op_indicators",
    "op_date_filter",
    "op_standardize_units",
    "op_null_counts",
    "asof_join_purchases",
    # Queued for the r08 window (50 slots full; local bit-exact parity
    # gates them every round): spatial_grid_neighbors, priority_mix_chi2,
    # join_revenue_by_nation_shj, image_tri_codec_near_dup,
    # lateral_top_customers, events_udtf_polymorphic, customers_masked,
    # events_hourly_tvf, snapshot_merkle_diff, corpus_scaling_curve,
    # audio_fingerprint_near_dup, video_remux_dedup,
    # docs_blocklist_screen, domain_reweight_plan, docs_semantic_dedup,
    # lsh_recall_eval, bootstrap_mean_ci, events_dow_hour_profile
    # + the five displaced r01 entries noted in _ROTATED_OUT
]
# name -> CORRECTNESS round(s) with the green driver verdict backing
# the rotation (all retain stricter local bit-exact parity coverage)
_ROTATED_OUT = {
    # round-6 window (all 50 green r06 — the first fully green round
    # at the window cap; rotated out to fund the r07 queue + r01 tail)
    "pq_codes": "r06",
    "pq_trained_topk": "r06",
    "image_phash_jpeg_near_dup": "r06",
    "docs_char_entropy_explode": "r06",
    "docs_bpe_pair_counts": "r06",
    "audio_features": "r06",
    "video_frame_stats": "r06",
    "image_resize_thumbs": "r06",
    "cms_heavy_hitters": "r06",
    "bloom_join_prune": "r06",
    "setsim_prefix_pairs": "r06",
    "copurchase_triangles": "r06",
    "docs_bpe_merge_step": "r06",
    "histogram_quantile_sketch": "r06",
    "zone_map_pruning": "r06",
    "embedding_random_projection": "r06",
    "snapshot_drift_report": "r06",
    "ab_test_events": "r06",
    "audio_transcode_features": "r06",
    "video_scene_cuts": "r06",
    "zone_map_pruning_2d": "r06",
    "sql_recursive_hierarchy": "r06",
    "event_segment_mutual_info": "r06",
    "ivm_daily_revenue": "r06",
    "image_cross_codec_near_dup": "r06",
    "events_grouped_center_arrow": "r06",
    "events_mad_outliers": "r06",
    "salted_join_revenue": "r06",
    "ivf_trained_topk": "r06",
    "cohort_retention": "r06",
    "event_transitions": "r06",
    "regr_price_by_brand": "r06",
    "events_rolling_zscore": "r06",
    "docs_rag_chunks": "r06",
    "orders_gap_fill": "r06",
    "rolling_7d_distinct_users": "r06",
    "nation_trade_pagerank": "r06",
    "max_concurrent_sessions": "r06",
    "rag_chunk_dedup": "r06",
    "rfm_segments": "r06",
    "conversion_lag_histogram": "r06",
    "lineitem_skew_profile": "r06",
    "part_pair_affinity": "r06",
    "top_event_paths": "r06",
    "revenue_mom_yoy": "r06",
    "region_nation_revenue_share": "r06",
    "benford_totalprice": "r06",
    "docs_unigram_surprisal": "r06",
    "split_oov_rate": "r06",
    "nation_trade_pagerank2": "r06",
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
    # r01-only, displaced by the round-7 additions (r08 queue) — the
    # five lowest re-verify-value entries, each backed by a newer
    # sibling verdict on the same machinery:
    # scale twin agg_quartiles_orders green r04+r05 on the shared oracle
    "window_ntile_orders": "r01",
    # six sibling multimodal queries carry r04-r06 verdicts
    "multimodal_meta": "r01",
    # window family covered by window_rank_stats (r02+r05)
    "window_lag_delta": "r01",
    # setsim_prefix_pairs (green r06, brute-force oracle) exercises
    # exact n-gram Jaccard on the same corpus more strictly
    "ngram_jaccard_pairs": "r01",
    # the Arrow twin shares the IDENTICAL oracle SQL; signature math
    # exercised by minhash_near_dup (r01+r02)
    "minhash_signatures": "r01",
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
