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
    # --- round-10 additions (first driver verdict needed) ---
    "docs_quality_classifier",  # new: hashed-feature linear quality scorer
    "embedding_kmeanspp_seeds",  # new: deterministic k-means++ (maximin) seeding
    "docs_bpe_train_vocab",  # new: N-merge BPE training loop
    "docs_perceptron_train",  # new: integer-exact batch-perceptron training
    "docs_classifier_calibration",  # new: logit-bucket reliability table
    "minhash_threshold_sweep",  # new: est-Jaccard threshold-capacity curve
    "ivf_nprobe_curve",  # new: recall-vs-nprobe capacity curve
    "phash_precision_eval",  # new: perceptual-hash false-positive gate
    "docs_hashed_embedding",  # new: model-free hashed text embeddings
    "hashed_embedding_planted_cosine",  # new: embedding quality gate
    "simhash_precision_eval",  # new: SimHash false-positive gate
    "parts_fs_weights",  # new: Fellegi-Sunter linkage evidence weights
    "corpus_dedup_funnel",  # new: raw -> exact -> near yield report
    # --- oldest-verdict re-verification rotation (VERDICT r09
    # item 3): the 43 r05-vintage rows — the oldest band after the
    # r09 rotation — re-verify in this window ---
    "multimodal_decode",  # was r02+r05-vintage
    "ref_flagship_pipeline_keyed",  # was r02+r05-vintage
    "ivfpq_topk",  # was r05-vintage
    "orders_pit_acctbal",  # was r05-vintage
    "events_funnel",  # was r05-vintage
    "sketch_merge_distinct",  # was r05-vintage
    "docs_hashed_features",  # was r05-vintage
    "docs_bm25",  # was r05-vintage
    "events_m4_downsample",  # was r05-vintage
    "sessionize_events_native",  # was r05-vintage
    "pq_topk",  # was r05-vintage
    "orders_hilbert",  # was r05-vintage
    "orders_zvalue",  # was r05-vintage
    "approx_distinct_stats",  # was r04+r05-vintage
    "cdc_merge_orders",  # was r02+r05-vintage
    "scd2_customer_history",  # was r02+r05-vintage
    "ivf_assignments",  # was r02+r05-vintage
    "ivf_topk",  # was r02+r05-vintage
    "tfidf_top_terms",  # was r02+r05-vintage
    "cube_orders",  # was r02+r05-vintage
    "top_terms",  # was r02+r05-vintage
    "string_functions",  # was r02+r05-vintage
    "date_functions",  # was r02+r05-vintage
    "range_join_promos",  # was r02+r05-vintage
    "unpivot_lineitem",  # was r02+r05-vintage
    "grouping_sets_orders",  # was r02+r05-vintage
    "stratified_sample_docs",  # was r02+r05-vintage
    "posexplode_tokens",  # was r02+r05-vintage
    "regex_extract_parts",  # was r02+r05-vintage
    "window_rank_stats",  # was r02+r05-vintage
    "agg_conditional",  # was r02+r05-vintage
    "kmeans_update_centroids",  # was r02+r05-vintage
    "doc_length_histogram",  # was r02+r05-vintage
    "multimodal_media_decode",  # was r04+r05-vintage
    "docs_bpe_token_count",  # was r02+r05-vintage
    "join_regional_revenue",  # was r02+r05-vintage
    "rolling_7d_revenue",  # was r02+r05-vintage
    # --- r06-vintage FILLERS (next-oldest) to hold the window at 50 ---
]
# name -> CORRECTNESS round(s) with the green driver verdict backing
# the rotation (all retain stricter local bit-exact parity coverage)
_ROTATED_OUT = {
    # the one r05-vintage row displaced by the round-10 additions
    # (window capped at 50) — front of the r11 re-verification queue
    "snapshot_diff_orders": "r04+r05",
    "agg_topk_orders": "r04+r05",
    "docs_outlier_trim": "r04+r05",
    "fuzzy_match_parts": "r04+r05",
    "docs_pii_scrub": "r04+r05",
    "cdc_merge_delete_orders": "r04+r05",
    "docs_char_entropy_explode": "r06",
    "pq_codes": "r06",
    "pq_trained_topk": "r06",
    "image_phash_jpeg_near_dup": "r06",
    # r10 rotation: the entire 50-slot r09 window came back green
    # (CORRECTNESS_r09 50/50) and rotates out to fund the oldest-
    # verdict (r05-vintage) re-verification set + round-10 adds.
    "docs_semantic_dedup": "r08",
    "bootstrap_mean_ci": "r08",
    "lsh_recall_eval": "r08",
    "audio_fingerprint_near_dup": "r08",
    "video_remux_dedup": "r08",
    "image_tri_codec_near_dup": "r08",
    "spatial_grid_neighbors": "r08",
    "priority_mix_chi2": "r08",
    "events_dow_hour_profile": "r08",
    "docs_blocklist_screen": "r08",
    "domain_reweight_plan": "r08",
    "corpus_scaling_curve": "r08",
    "snapshot_merkle_diff": "r08",
    "customers_masked": "r08",
    "events_udtf_polymorphic": "r08",
    "lateral_top_customers": "r08",
    "events_hourly_tvf": "r08",
    "join_revenue_by_nation_shj": "r08",
    "semdedup_incremental_batch": "r08",
    "docs_dsir_weights": "r08",
    "customers_k_anonymity": "r08",
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
    "curate_corpus": "r02+r09",
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
