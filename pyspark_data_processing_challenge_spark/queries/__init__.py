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
    # --- new this round (needs a first driver verdict): the
    # narrow-shuffle exact-dedup form (VERDICT r15 #2) ---
    "dedup_drop_exact_narrow",
    # --- verdict-vintage drain, final leg (VERDICT r15 #3): the eight
    # remaining r09-vintage rows lead the r16 window — after this round
    # no driver verdict in the catalog is older than r10 ---
    "docs_sentences_udtf",  # was r04+r09-vintage
    "events_grouped_center",  # was r04+r09-vintage
    "docs_dup_spans",  # was r05+r09-vintage
    "docs_strip_dup_spans",  # was r05+r09-vintage
    "docs_weighted_sample",  # was r05+r09-vintage
    "user_streaks",  # was r05+r09-vintage
    "docs_char_entropy",  # was r05+r09-vintage
    "events_arrow_scaled",  # was r05+r09-vintage
    # --- oldest-verdict re-verification: the r10 band in
    # registry-queue order (41 of 50 fit; the remaining 9 r10 rows
    # lead the r17 queue) ---
    "docs_quality_classifier",  # was r10-vintage
    "embedding_kmeanspp_seeds",  # was r10-vintage
    "docs_bpe_train_vocab",  # was r10-vintage
    "docs_perceptron_train",  # was r10-vintage
    "docs_classifier_calibration",  # was r10-vintage
    "minhash_threshold_sweep",  # was r10-vintage
    "ivf_nprobe_curve",  # was r10-vintage
    "phash_precision_eval",  # was r10-vintage
    "docs_hashed_embedding",  # was r10-vintage
    "hashed_embedding_planted_cosine",  # was r10-vintage
    "simhash_precision_eval",  # was r10-vintage
    "parts_fs_weights",  # was r10-vintage
    "corpus_dedup_funnel",  # was r10-vintage
    "multimodal_decode",  # was r02+r05+r10-vintage
    "ref_flagship_pipeline_keyed",  # was r02+r05+r10-vintage
    "ivfpq_topk",  # was r05+r10-vintage
    "orders_pit_acctbal",  # was r05+r10-vintage
    "events_funnel",  # was r05+r10-vintage
    "sketch_merge_distinct",  # was r05+r10-vintage
    "docs_hashed_features",  # was r05+r10-vintage
    "docs_bm25",  # was r05+r10-vintage
    "events_m4_downsample",  # was r05+r10-vintage
    "sessionize_events_native",  # was r05+r10-vintage
    "pq_topk",  # was r05+r10-vintage
    "orders_hilbert",  # was r05+r10-vintage
    "orders_zvalue",  # was r05+r10-vintage
    "approx_distinct_stats",  # was r04+r05+r10-vintage
    "cdc_merge_orders",  # was r02+r05+r10-vintage
    "scd2_customer_history",  # was r02+r05+r10-vintage
    "ivf_assignments",  # was r02+r05+r10-vintage
    "ivf_topk",  # was r02+r05+r10-vintage
    "tfidf_top_terms",  # was r02+r05+r10-vintage
    "cube_orders",  # was r02+r05+r10-vintage
    "top_terms",  # was r02+r05+r10-vintage
    "string_functions",  # was r02+r05+r10-vintage
    "date_functions",  # was r02+r05+r10-vintage
    "range_join_promos",  # was r02+r05+r10-vintage
    "unpivot_lineitem",  # was r02+r05+r10-vintage
    "grouping_sets_orders",  # was r02+r05+r10-vintage
    "stratified_sample_docs",  # was r02+r05+r10-vintage
    "posexplode_tokens",  # was r02+r05+r10-vintage
]
# name -> CORRECTNESS round(s) with the green driver verdict backing
# the rotation (all retain stricter local bit-exact parity coverage)
_ROTATED_OUT = {
    # r16 rotation: the entire 50-slot r15 window came back green
    # (CORRECTNESS_r15 50/50) and rotates out; vintage strings list
    # every green driver-verdict round per query (derived from the
    # committed CORRECTNESS_r* history).
    "docs_rrf_fusion": "r08+r15",
    "cms_selfjoin_size": "r08+r15",
    "conversion_wilson_ci": "r08+r15",
    "agg_quartiles_orders": "r04+r08+r15",
    "window_ntile_orders": "r01+r08+r15",
    "multimodal_meta": "r01+r08+r15",
    "window_lag_delta": "r01+r08+r15",
    "ngram_jaccard_pairs": "r01+r08+r15",
    "minhash_signatures": "r01+r08+r15",
    "near_dup_keep_best": "r09+r15",
    "image_video_cross_near_dup": "r09+r15",
    "docs_kneser_ney_ppl": "r09+r15",
    "revenue_mann_kendall": "r09+r15",
    "customers_mahalanobis_outliers": "r09+r15",
    "ivf_ndcg_eval": "r09+r15",
    "parts_jaccard_similarity": "r09+r15",
    "minhash_precision_eval": "r09+r15",
    "semdedup_recall_eval": "r09+r15",
    "revenue_runs_test": "r09+r15",
    "corpus_tokenizer_fertility": "r09+r15",
    "events_entropy_rate": "r09+r15",
    "nation_revenue_gini": "r09+r15",
    "ref_flagship_pipeline": "r09+r15",
    "minhash_near_dup": "r09+r15",
    "simhash_near_dup": "r09+r15",
    "embedding_topk": "r09+r15",
    "embedding_lsh_buckets": "r09+r15",
    "near_dup_clusters": "r09+r15",
    "minhash_signatures_fast": "r09+r15",
    "dedup_drop_exact": "r09+r15",
    "docs_quality": "r09+r15",
    "docs_lang_id": "r09+r15",
    "docs_token_stats": "r09+r15",
    "op_dedup_subset": "r09+r15",
    "agg_salted_revenue": "r09+r15",
    "sessionize_events": "r09+r15",
    "agg_pricing_summary": "r09+r15",
    "join_revenue_by_nation": "r09+r15",
    "docs_repetition": "r09+r15",
    "events_variant_stats": "r09+r15",
    "approx_percentiles_by_type": "r09+r15",
    "image_phash": "r09+r15",
    "image_phash_near_dup": "r09+r15",
    "docs_decontaminate": "r09+r15",
    "docs_split_assign": "r09+r15",
    "docs_pack_sequences": "r09+r15",
    "profile_orders": "r09+r15",
    "kmeans_two_step": "r09+r15",
    "docs_domain_mix": "r09+r15",
    "embedding_quantize": "r09+r15",
    # front of the r17 re-verification queue: the 9 r10-vintage rows
    # the 50-slot r16 window could not fit
    "regex_extract_parts": "r02+r05+r10",
    "window_rank_stats": "r02+r05+r10",
    "agg_conditional": "r02+r05+r10",
    "kmeans_update_centroids": "r02+r05+r10",
    "doc_length_histogram": "r02+r05+r10",
    "multimodal_media_decode": "r04+r05+r10",
    "docs_bpe_token_count": "r02+r05+r10",
    "join_regional_revenue": "r02+r05+r10",
    "rolling_7d_revenue": "r02+r05+r10",
    "decontam_bloom_screen": "r14",
    "decontam_bloom_fp_eval": "r14",
    "customers_dp_seeded_audit": "r14",
    "snn_quality_eval": "r14",
    "embedding_knn_graph": "r13+r14",
    "knn_graph_stats": "r13+r14",
    "embedding_snn_clusters": "r13+r14",
    "snapshot_merkle_diff": "r08+r14",
    "customers_masked": "r08+r14",
    "events_udtf_polymorphic": "r08+r14",
    "domain_reweight_plan": "r08+r14",
    "corpus_scaling_curve": "r08+r14",
    "docs_blocklist_screen": "r08+r14",
    "sort_top20_orders": "r01+r07+r14",
    "asof_join_purchases": "r01+r07+r14",
    "docs_semantic_dedup": "r08+r14",
    "bootstrap_mean_ci": "r08+r14",
    "lsh_recall_eval": "r08+r14",
    "audio_fingerprint_near_dup": "r08+r14",
    "video_remux_dedup": "r08+r14",
    "image_tri_codec_near_dup": "r08+r14",
    "spatial_grid_neighbors": "r08+r14",
    "priority_mix_chi2": "r08+r14",
    "events_dow_hour_profile": "r08+r14",
    "lateral_top_customers": "r08+r14",
    "events_hourly_tvf": "r08+r14",
    "join_revenue_by_nation_shj": "r08+r14",
    "semdedup_incremental_batch": "r08+r14",
    "docs_dsir_weights": "r08+r14",
    "customers_k_anonymity": "r08+r14",
    "revenue_holt_forecast": "r08+r14",
    "docs_gopher_rules": "r08+r14",
    "lsh_recall_banded_eval": "r08+r14",
    "parts_entity_resolution": "r08+r14",
    "cdc_changelog_compact": "r08+r14",
    "revenue_holt_winters": "r08+r14",
    "docs_phrase_search": "r08+r14",
    "parts_snm_pairs": "r08+r14",
    "copurchase_kcore": "r08+r14",
    "embedding_hard_negatives": "r08+r14",
    "minhash_bbit_near_dup": "r08+r14",
    "events_debounce": "r08+r14",
    "price_psi_drift": "r08+r14",
    "totalprice_quantile_transform": "r08+r14",
    "ab_mannwhitney_events": "r08+r14",
    "copurchase_communities": "r08+r14",
    "matryoshka_recall_eval": "r08+r14",
    "corpus_zipf_fit": "r08+r14",
    "events_lead_lag": "r08+r14",
    "users_kaplan_meier": "r08+r14",
    "ivf_filtered_topk": "r13",
    "ivf_filtered_recall_eval": "r13",
    "ivf_filtered_cost_eval": "r13",
    "split_cluster_assign": "r13",
    "split_cluster_leakage_eval": "r13",
    "split_cluster_assign_incremental": "r13",
    "split_balance_report": "r13",
    "embedding_group_pca": "r13",
    "ivf_prefilter_vs_postfilter_eval": "r13",
    "ivf_filtered_adaptive_topk": "r13",
    "docs_softdedup_weights": "r13",
    "embedding_decontaminate": "r13",
    "copurchase_link_prediction": "r13",
    "ivf_tombstone_compact": "r13",
    "ivf_tombstone_probe_eval": "r13",
    "customers_dp_release": "r13",
    "knn_graph_recall_eval": "r13",
    "docs_classifier_auc": "r13",
    "embedding_binary_codes": "r13",
    "embedding_binary_recall_eval": "r13",
    "sql_small_qty_revenue": "r13",
    "sql_lone_late_supplier": "r13",
    "sql_big_order_customers": "r13",
    "sql_dormant_rich_customers": "r13",
    "docs_fingerprint": "r01+r07+r13",
    "simhash_values": "r01+r07+r13",
    "dedup_exact_groups": "r01+r07+r13",
    "window_topk_orders": "r01+r07+r13",
    "sql_revenue_by_nation": "r01+r07+r13",
    "set_ops_segments": "r01+r07+r13",
    "semi_join_urgent_customers": "r01+r07+r13",
    "anti_join_quiet_customers": "r01+r07+r13",
    "pivot_event_counts": "r01+r07+r13",
    "array_agg_lineitems": "r01+r07+r13",
    "rollup_lineitem": "r01+r07+r13",
    "embedding_near_dup": "r01+r07+r13",
    "window_running_total": "r01+r07+r13",
    "events_hourly": "r01+r07+r13",
    "op_equality_filter": "r01+r07+r13",
    "op_sentinel_filter": "r01+r07+r13",
    "op_membership_filter": "r01+r07+r13",
    "op_union_membership": "r01+r07+r13",
    "op_fill_nulls": "r01+r07+r13",
    "op_indicators": "r01+r07+r13",
    "op_date_filter": "r01+r07+r13",
    "op_standardize_units": "r01+r07+r13",
    "op_null_counts": "r01+r07+r13",
    "curate_corpus": "r12",
    "docs_max_dup_extents_salted": "r12",
    "embedding_top_pc": "r12",
    "embedding_top_pc_incremental": "r12",
    "embedding_top_k_pcs": "r12",
    "embedding_pca_project": "r12",
    "split_ngram_leakage": "r12",
    "ivfpq_residual_rerank_topk": "r12",
    "ivfpq_rerank_recall_eval": "r12",
    "ivf_silhouette_histogram": "r12",
    "revenue_theil_sen": "r12",
    "docs_mattr": "r12",
    "rfm_segments": "r06+r12",
    "rag_chunk_dedup": "r06+r12",
    "docs_rag_chunks": "r06+r12",
    "conversion_lag_histogram": "r06+r12",
    "lineitem_skew_profile": "r06+r12",
    "part_pair_affinity": "r06+r12",
    "top_event_paths": "r06+r12",
    "revenue_mom_yoy": "r06+r12",
    "region_nation_revenue_share": "r06+r12",
    "benford_totalprice": "r06+r12",
    "docs_unigram_surprisal": "r06+r12",
    "split_oov_rate": "r06+r12",
    "nation_trade_pagerank2": "r06+r12",
    "image_rgb_phash_near_dup": "r07+r12",
    "image_rgb_histogram": "r07+r12",
    "audio_spectral_features": "r07+r12",
    "ivf_recall_eval": "r07+r12",
    "docs_bigram_surprisal": "r07+r12",
    "pq_rerank_topk": "r07+r12",
    "docs_containment_pairs": "r07+r12",
    "revenue_cusum_shifts": "r07+r12",
    "revenue_acf": "r07+r12",
    "pyds_docs_pushdown": "r07+r12",
    "collection_functions": "r07+r12",
    "map_functions": "r07+r12",
    "target_encode_priority": "r07+r12",
    "equi_depth_bins_totalprice": "r07+r12",
    "orders_expectations": "r07+r12",
    "purchase_attribution": "r07+r12",
    "rolling_7d_distinct_sketch": "r07+r12",
    "momentum_contribution": "r07+r12",
    "seasonal_decompose_daily": "r07+r12",
    "docs_readability": "r07+r12",
    "funnel_dropoff": "r07+r12",
    "sketch_overlap_users": "r07+r12",
    "corpus_manifest": "r07+r12",
    "events_json_stats": "r01+r07+r12",
    "percentiles_by_type": "r01+r07+r12",
    "ivfpq_residual_topk": "r11",
    "ivfpq_ingest_postings": "r11",
    "docs_trained_classifier_eval": "r11",
    "docs_max_dup_extents": "r11",
    "corpus_top_dup_extents": "r11",
    "ivf_list_stats": "r11",
    "ivf_staleness_eval": "r11",
    "snapshot_diff_orders": "r04+r05+r11",
    "cdc_merge_delete_orders": "r04+r05+r11",
    "docs_pii_scrub": "r04+r05+r11",
    "fuzzy_match_parts": "r04+r05+r11",
    "docs_outlier_trim": "r04+r05+r11",
    "agg_topk_orders": "r04+r05+r11",
    "docs_char_entropy_explode": "r06+r11",
    "pq_codes": "r06+r11",
    "pq_trained_topk": "r06+r11",
    "image_phash_jpeg_near_dup": "r06+r11",
    "docs_bpe_pair_counts": "r06+r11",
    "audio_features": "r06+r11",
    "video_frame_stats": "r06+r11",
    "image_resize_thumbs": "r06+r11",
    "cms_heavy_hitters": "r06+r11",
    "bloom_join_prune": "r06+r11",
    "setsim_prefix_pairs": "r06+r11",
    "copurchase_triangles": "r06+r11",
    "docs_bpe_merge_step": "r06+r11",
    "histogram_quantile_sketch": "r06+r11",
    "zone_map_pruning": "r06+r11",
    "embedding_random_projection": "r06+r11",
    "snapshot_drift_report": "r06+r11",
    "ab_test_events": "r06+r11",
    "audio_transcode_features": "r06+r11",
    "video_scene_cuts": "r06+r11",
    "zone_map_pruning_2d": "r06+r11",
    "sql_recursive_hierarchy": "r06+r11",
    "event_segment_mutual_info": "r06+r11",
    "ivm_daily_revenue": "r06+r11",
    "image_cross_codec_near_dup": "r06+r11",
    "events_grouped_center_arrow": "r06+r11",
    "events_mad_outliers": "r06+r11",
    "salted_join_revenue": "r06+r11",
    "ivf_trained_topk": "r06+r11",
    "cohort_retention": "r06+r11",
    "event_transitions": "r06+r11",
    "regr_price_by_brand": "r06+r11",
    "events_rolling_zscore": "r06+r11",
    "orders_gap_fill": "r06+r11",
    "rolling_7d_distinct_users": "r06+r11",
    "nation_trade_pagerank": "r06+r11",
    "max_concurrent_sessions": "r06+r11",
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
