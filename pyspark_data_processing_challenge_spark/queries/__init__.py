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
    # --- the 18 round-7 additions that have NEVER had a driver slot
    # (VERDICT r07 item 1: every one is locally bit-exact green but the
    # r07 window was at its 50-slot cap) ---
    "docs_semantic_dedup",  # now with the r08 skew-cap sub-split
    "bootstrap_mean_ci",
    "lsh_recall_eval",  # r08: sampled baseline — behavior changed
    "audio_fingerprint_near_dup",
    "video_remux_dedup",
    "image_tri_codec_near_dup",
    "spatial_grid_neighbors",
    "priority_mix_chi2",
    "events_dow_hour_profile",
    "docs_blocklist_screen",
    "domain_reweight_plan",
    "corpus_scaling_curve",
    "snapshot_merkle_diff",
    "customers_masked",
    "events_udtf_polymorphic",
    "lateral_top_customers",
    "events_hourly_tvf",
    "join_revenue_by_nation_shj",
    # --- round-8 additions (first driver verdict needed) ---
    "semdedup_incremental_batch",  # new: incremental semantic dedup
    "docs_dsir_weights",  # new: DSIR importance-resampling weights
    "customers_k_anonymity",  # new: post-masking release gate
    "revenue_holt_forecast",  # new: recursive smoothing as one fold
    "docs_gopher_rules",  # new: the Gopher/MassiveText quality gate
    "lsh_recall_banded_eval",  # new: OR-construction recall companion
    "parts_entity_resolution",  # new: block → score → closure pipeline
    "cdc_changelog_compact",  # new: multi-version log compaction
    "revenue_holt_winters",  # new: seasonal smoothing, dow-keyed state
    "docs_phrase_search",  # new: positional postings intersection
    "parts_snm_pairs",  # new: sorted-neighborhood ER blocking
    "copurchase_kcore",  # new: bounded k-core peeling
    "embedding_hard_negatives",  # new: contrastive negative mining
    "minhash_bbit_near_dup",  # new: b-bit minhash (Li-König)
    "events_debounce",  # new: throttle dedup as a recursive fold
    "price_psi_drift",  # new: PSI distribution-drift screen
    "totalprice_quantile_transform",  # new: scale-safe empirical CDF
    "ab_mannwhitney_events",  # new: tie-corrected rank-sum A/B test
    "copurchase_communities",  # new: deterministic label propagation
    "matryoshka_recall_eval",  # new: truncated-embedding recall study
    "corpus_zipf_fit",  # new: Zipf slope screen (Heaps' partner)
    "events_lead_lag",  # new: lead-lag cross-correlation
    "users_kaplan_meier",  # new: censoring-aware retention curve
    "conversion_wilson_ci",  # new: binomial CI per segment
    "cms_selfjoin_size",  # new: sketch join-size estimation
    "docs_rrf_fusion",  # new: reciprocal-rank hybrid fusion
    # --- behavior touched in r08 (selection.py band refinement went
    # distributed) — re-verify even though r04/r05 verdicts exist ---
    "agg_quartiles_orders",
    "window_ntile_orders",  # shares the selection oracle; r01-only verdict
    # --- the 4 remaining r01-only-verdict entries (displaced from the
    # r07 window; each has a newer sibling verdict but the bar says a
    # fresh driver row) ---
    "multimodal_meta",
    "window_lag_delta",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    # --- oldest-verdict re-verification rotation (r01+r02 / r02) ---
    # --- r04-verdict re-verification rotation (oldest after r02) ---
    # (ref_flagship_pipeline, minhash_near_dup, simhash_near_dup, embedding_topk, embedding_lsh_buckets, near_dup_clusters, curate_corpus, minhash_signatures_fast, dedup_drop_exact, docs_quality, docs_lang_id, docs_token_stats, op_dedup_subset, agg_salted_revenue, agg_pricing_summary, join_revenue_by_nation, docs_repetition, events_variant_stats, approx_percentiles_by_type, image_phash, image_phash_near_dup, docs_decontaminate, docs_split_assign, docs_pack_sequences, profile_orders,
    # kmeans_two_step, docs_domain_mix, embedding_quantize,
    # docs_sentences_udtf, events_grouped_center remain r04-verdict;
    # they queue for the r09 window — 50 slots full)
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
    # r08 rotation: the entire 50-slot r07 window came back green
    # (CORRECTNESS_r07 50/50) and rotates out to fund the 18-query
    # never-checked queue + the oldest-verdict re-verification set.
    # round-7 additions, first verdict r07:
    "image_rgb_phash_near_dup": "r07",
    "image_rgb_histogram": "r07",
    "audio_spectral_features": "r07",
    "ivf_recall_eval": "r07",
    "docs_bigram_surprisal": "r07",
    "pq_rerank_topk": "r07",
    "docs_containment_pairs": "r07",
    "revenue_cusum_shifts": "r07",
    "revenue_acf": "r07",
    "pyds_docs_pushdown": "r07",
    # queued-since-round-6 entries, first verdict r07:
    "collection_functions": "r07",
    "map_functions": "r07",
    "target_encode_priority": "r07",
    "equi_depth_bins_totalprice": "r07",
    "orders_expectations": "r07",
    "purchase_attribution": "r07",
    "rolling_7d_distinct_sketch": "r07",
    "momentum_contribution": "r07",
    "seasonal_decompose_daily": "r07",
    "docs_readability": "r07",
    "funnel_dropoff": "r07",
    "sketch_overlap_users": "r07",
    "corpus_manifest": "r07",
    # the r01-only tail re-verified in the r07 window:
    "events_json_stats": "r01+r07",
    "percentiles_by_type": "r01+r07",
    "rollup_lineitem": "r01+r07",
    "array_agg_lineitems": "r01+r07",
    "pivot_event_counts": "r01+r07",
    "semi_join_urgent_customers": "r01+r07",
    "anti_join_quiet_customers": "r01+r07",
    "set_ops_segments": "r01+r07",
    "sql_revenue_by_nation": "r01+r07",
    "window_topk_orders": "r01+r07",
    "dedup_exact_groups": "r01+r07",
    "simhash_values": "r01+r07",
    "docs_fingerprint": "r01+r07",
    "embedding_near_dup": "r01+r07",
    "sort_top20_orders": "r01+r07",
    "window_running_total": "r01+r07",
    "events_hourly": "r01+r07",
    "op_equality_filter": "r01+r07",
    "op_sentinel_filter": "r01+r07",
    "op_membership_filter": "r01+r07",
    "op_union_membership": "r01+r07",
    "op_fill_nulls": "r01+r07",
    "op_indicators": "r01+r07",
    "op_date_filter": "r01+r07",
    "op_standardize_units": "r01+r07",
    "op_null_counts": "r01+r07",
    "asof_join_purchases": "r01+r07",
    # r04-verdict entries NOT in the r08 re-verify rotation (50 slots
    # full; they queue for r09):
    "sessionize_events": "r01+r02+r04",
    "agg_salted_revenue": "r02",
    "op_dedup_subset": "r02",
    "docs_token_stats": "r02",
    "docs_lang_id": "r02",
    "docs_quality": "r02",
    "dedup_drop_exact": "r02",
    "minhash_signatures_fast": "r02",
    "curate_corpus": "r02",
    "near_dup_clusters": "r02",
    "embedding_topk": "r02",
    "simhash_near_dup": "r02",
    "minhash_near_dup": "r02+r03",
    "ref_flagship_pipeline": "r01+r02",
    "embedding_lsh_buckets": "r02",
    "approx_percentiles_by_type": "r04",
    "events_variant_stats": "r04",
    "docs_repetition": "r04",
    "join_revenue_by_nation": "r04",
    "agg_pricing_summary": "r04",
    "profile_orders": "r04",
    "docs_split_assign": "r04",
    "docs_pack_sequences": "r04",
    "docs_decontaminate": "r04",
    "image_phash_near_dup": "r04",
    "image_phash": "r04",
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
