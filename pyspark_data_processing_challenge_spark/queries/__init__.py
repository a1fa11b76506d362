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
    # --- round-13 additions (first driver verdict needed) ---
    "ivf_filtered_topk",  # new: metadata-filtered ANN serving (pre-filter)
    "ivf_filtered_recall_eval",  # new: filtered recall vs exact filtered truth
    "ivf_filtered_cost_eval",  # new: scored-candidate cost, pre vs unfiltered
    "split_cluster_assign",  # new: dedup-aware split assignment
    "split_cluster_leakage_eval",  # new: doc-hash vs cluster leakage twin
    "split_cluster_assign_incremental",  # new: exact ingest twin (forest CC fold)
    "split_balance_report",  # new: realized vs target split mass under cluster keying
    "embedding_group_pca",  # new: closed-form per-label PCA (gap-independent)
    "ivf_prefilter_vs_postfilter_eval",  # new: measured pre-vs-post-filter tradeoff
    "ivf_filtered_adaptive_topk",  # new: adaptive nprobe escalation under filter
    "docs_softdedup_weights",  # new: duplicate-aware sampling weights (SoftDeDup)
    "embedding_decontaminate",  # new: semantic (embedding-space) decontamination
    "copurchase_link_prediction",  # new: Adamic-Adar/RA link prediction
    "ivf_tombstone_compact",  # new: ANN delete lifecycle / compaction scheduler
    "ivf_tombstone_probe_eval",  # new: stale-result + post-delete recall eval
    "customers_dp_release",  # new: Laplace-mechanism DP count release
    "embedding_knn_graph",  # new: corpus-wide list-bounded kNN graph
    "knn_graph_stats",  # new: degree/mutual-edge health report
    "embedding_snn_clusters",  # new: mutual-kNN (SNN) clustering
    "knn_graph_recall_eval",  # new: measured recall vs assignment depth
    "docs_classifier_auc",  # new: exact ROC-AUC of the serving-quantized scorer
    "embedding_binary_codes",  # new: sign-bit 32x-compressed serving codes
    "embedding_binary_recall_eval",  # new: Hamming recall at 32x compression
    "sql_small_qty_revenue",  # new: Q17-shape correlated scalar subquery
    "sql_lone_late_supplier",  # new: Q21-shape EXISTS/NOT EXISTS decorrelation
    "sql_big_order_customers",  # new: Q18-shape IN-over-HAVING semi join
    "sql_dormant_rich_customers",  # new: Q22-shape global-mean + anti join
    # --- oldest-verdict re-verification: the staged r01+r07 band
    # (last driver-verified r07 — five rounds of drift risk covered
    # only by the local gate until now; VERDICT r12 #1), incl. all ten
    # SURVEY-2 op_* rows ---
    "docs_fingerprint",  # was r01+r07-vintage
    "simhash_values",  # was r01+r07-vintage
    "dedup_exact_groups",  # was r01+r07-vintage
    "window_topk_orders",  # was r01+r07-vintage
    "sql_revenue_by_nation",  # was r01+r07-vintage
    "set_ops_segments",  # was r01+r07-vintage
    "semi_join_urgent_customers",  # was r01+r07-vintage
    "anti_join_quiet_customers",  # was r01+r07-vintage
    "pivot_event_counts",  # was r01+r07-vintage
    "array_agg_lineitems",  # was r01+r07-vintage
    "rollup_lineitem",  # was r01+r07-vintage
    "embedding_near_dup",  # was r01+r07-vintage
    "window_running_total",  # was r01+r07-vintage
    "events_hourly",  # was r01+r07-vintage
    "op_equality_filter",  # was r01+r07-vintage (SURVEY-2 R4)
    "op_sentinel_filter",  # was r01+r07-vintage (SURVEY-2 R4)
    "op_membership_filter",  # was r01+r07-vintage (SURVEY-2 R5)
    "op_union_membership",  # was r01+r07-vintage (SURVEY-2 R5)
    "op_fill_nulls",  # was r01+r07-vintage (SURVEY-2 R7)
    "op_indicators",  # was r01+r07-vintage (SURVEY-2 R6)
    "op_date_filter",  # was r01+r07-vintage (SURVEY-2 R2/R3)
    "op_standardize_units",  # was r01+r07-vintage (SURVEY-2 R8)
    "op_null_counts",  # was r01+r07-vintage (SURVEY-2 Q3)
]
# name -> CORRECTNESS round(s) with the green driver verdict backing
# the rotation (all retain stricter local bit-exact parity coverage)
_ROTATED_OUT = {
    # displaced from the r13 window by the ten r13b additions
    # (softdedup weights, semantic decon, link prediction, tombstone
    # lifecycle pair, DP release, kNN graph + stats + SNN clusters +
    # recall eval, classifier AUC — all need FIRST verdicts); these
    # hold green r08 verdicts and lead the r14 re-verification queue
    "snapshot_merkle_diff": "r08",
    "customers_masked": "r08",
    "events_udtf_polymorphic": "r08",
    "domain_reweight_plan": "r08",
    "corpus_scaling_curve": "r08",
    "docs_blocklist_screen": "r08",
    # displaced by the Q18/Q22 additions: both carry r01+r07 verdicts
    # and full local coverage; they rejoin the queue behind the op_* band
    "sort_top20_orders": "r01+r07",
    "asof_join_purchases": "r01+r07",
    "docs_semantic_dedup": "r08",
    "bootstrap_mean_ci": "r08",
    "lsh_recall_eval": "r08",
    "audio_fingerprint_near_dup": "r08",
    "video_remux_dedup": "r08",
    "image_tri_codec_near_dup": "r08",
    "spatial_grid_neighbors": "r08",
    "priority_mix_chi2": "r08",
    "events_dow_hour_profile": "r08",
    "lateral_top_customers": "r08",
    "events_hourly_tvf": "r08",
    "join_revenue_by_nation_shj": "r08",
    "semdedup_incremental_batch": "r08",
    "docs_dsir_weights": "r08",
    "customers_k_anonymity": "r08",
    # r13 rotation: the entire 50-slot r12 window came back green
    # (CORRECTNESS_r12 50/50) and rotates out to fund the staged
    # r01+r07 band + the r13b additions. The r14 queue front is the
    # displaced r08 band above, then the remaining r08 rows below
    # (revenue_holt_forecast ... minhash_signatures).
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
    # front of the r13 re-verification queue: the r01+r07 rows the
    # 50-slot window could not fit this round
    # r12 rotation: the entire 50-slot r11 window came back green
    # (CORRECTNESS_r11 50/50) and rotates out to fund the r07-band
    # re-verification set + the curate_corpus re-check.
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
    "docs_quality_classifier": "r10",
    "embedding_kmeanspp_seeds": "r10",
    "docs_bpe_train_vocab": "r10",
    "docs_perceptron_train": "r10",
    "docs_classifier_calibration": "r10",
    "minhash_threshold_sweep": "r10",
    "ivf_nprobe_curve": "r10",
    "phash_precision_eval": "r10",
    "docs_hashed_embedding": "r10",
    "hashed_embedding_planted_cosine": "r10",
    "simhash_precision_eval": "r10",
    "parts_fs_weights": "r10",
    "corpus_dedup_funnel": "r10",
    "multimodal_decode": "r02+r05+r10",
    "ref_flagship_pipeline_keyed": "r02+r05+r10",
    "ivfpq_topk": "r05+r10",
    "orders_pit_acctbal": "r05+r10",
    "events_funnel": "r05+r10",
    "sketch_merge_distinct": "r05+r10",
    "docs_hashed_features": "r05+r10",
    "docs_bm25": "r05+r10",
    "events_m4_downsample": "r05+r10",
    "sessionize_events_native": "r05+r10",
    "pq_topk": "r05+r10",
    "orders_hilbert": "r05+r10",
    "orders_zvalue": "r05+r10",
    "approx_distinct_stats": "r04+r05+r10",
    "cdc_merge_orders": "r02+r05+r10",
    "scd2_customer_history": "r02+r05+r10",
    "ivf_assignments": "r02+r05+r10",
    "ivf_topk": "r02+r05+r10",
    "tfidf_top_terms": "r02+r05+r10",
    "cube_orders": "r02+r05+r10",
    "top_terms": "r02+r05+r10",
    "string_functions": "r02+r05+r10",
    "date_functions": "r02+r05+r10",
    "range_join_promos": "r02+r05+r10",
    "unpivot_lineitem": "r02+r05+r10",
    "grouping_sets_orders": "r02+r05+r10",
    "stratified_sample_docs": "r02+r05+r10",
    "posexplode_tokens": "r02+r05+r10",
    "regex_extract_parts": "r02+r05+r10",
    "window_rank_stats": "r02+r05+r10",
    "agg_conditional": "r02+r05+r10",
    "kmeans_update_centroids": "r02+r05+r10",
    "doc_length_histogram": "r02+r05+r10",
    "multimodal_media_decode": "r04+r05+r10",
    "docs_bpe_token_count": "r02+r05+r10",
    "join_regional_revenue": "r02+r05+r10",
    "rolling_7d_revenue": "r02+r05+r10",
    "revenue_holt_forecast": "r08",
    "docs_gopher_rules": "r08",
    "lsh_recall_banded_eval": "r08",
    "parts_entity_resolution": "r08",
    "cdc_changelog_compact": "r08",
    "revenue_holt_winters": "r08",
    "docs_phrase_search": "r08",
    "parts_snm_pairs": "r08",
    "copurchase_kcore": "r08",
    "embedding_hard_negatives": "r08",
    "minhash_bbit_near_dup": "r08",
    "events_debounce": "r08",
    "price_psi_drift": "r08",
    "totalprice_quantile_transform": "r08",
    "ab_mannwhitney_events": "r08",
    "copurchase_communities": "r08",
    "matryoshka_recall_eval": "r08",
    "corpus_zipf_fit": "r08",
    "events_lead_lag": "r08",
    "users_kaplan_meier": "r08",
    "conversion_wilson_ci": "r08",
    "cms_selfjoin_size": "r08",
    "docs_rrf_fusion": "r08",
    "agg_quartiles_orders": "r04+r08",
    "window_ntile_orders": "r01+r08",
    "multimodal_meta": "r01+r08",
    "window_lag_delta": "r01+r08",
    "ngram_jaccard_pairs": "r01+r08",
    "minhash_signatures": "r01+r08",
    "near_dup_keep_best": "r09",
    "image_video_cross_near_dup": "r09",
    "docs_kneser_ney_ppl": "r09",
    "revenue_mann_kendall": "r09",
    "customers_mahalanobis_outliers": "r09",
    "ivf_ndcg_eval": "r09",
    "parts_jaccard_similarity": "r09",
    "minhash_precision_eval": "r09",
    "semdedup_recall_eval": "r09",
    "revenue_runs_test": "r09",
    "corpus_tokenizer_fertility": "r09",
    "events_entropy_rate": "r09",
    "nation_revenue_gini": "r09",
    "ref_flagship_pipeline": "r01+r02+r09",
    "minhash_near_dup": "r02+r03+r09",
    "simhash_near_dup": "r02+r09",
    "embedding_topk": "r02+r09",
    "embedding_lsh_buckets": "r02+r09",
    "near_dup_clusters": "r02+r09",
    "minhash_signatures_fast": "r02+r09",
    "dedup_drop_exact": "r02+r09",
    "docs_quality": "r02+r09",
    "docs_lang_id": "r02+r09",
    "docs_token_stats": "r02+r09",
    "op_dedup_subset": "r02+r09",
    "agg_salted_revenue": "r02+r09",
    "sessionize_events": "r01+r02+r04+r09",
    "agg_pricing_summary": "r04+r09",
    "join_revenue_by_nation": "r04+r09",
    "docs_repetition": "r04+r09",
    "events_variant_stats": "r04+r09",
    "approx_percentiles_by_type": "r04+r09",
    "image_phash": "r04+r09",
    "image_phash_near_dup": "r04+r09",
    "docs_decontaminate": "r04+r09",
    "docs_split_assign": "r04+r09",
    "docs_pack_sequences": "r04+r09",
    "profile_orders": "r04+r09",
    "kmeans_two_step": "r04+r09",
    "docs_domain_mix": "r04+r09",
    "embedding_quantize": "r04+r09",
    "docs_sentences_udtf": "r04+r09",
    "events_grouped_center": "r04+r09",
    "docs_dup_spans": "r05+r09",
    "docs_strip_dup_spans": "r05+r09",
    "docs_weighted_sample": "r05+r09",
    "user_streaks": "r05+r09",
    "docs_char_entropy": "r05+r09",
    "events_arrow_scaled": "r05+r09",
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
