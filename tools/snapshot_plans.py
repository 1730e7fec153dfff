"""Write PLANS.md: formatted physical plans of the headline queries at sf0.01.

Reviewable evidence that filters push down, dimensions broadcast, aggregates
have map-side partials, and top-k avoids global sorts. Regenerate after plan-
affecting changes: python tools/snapshot_plans.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from messikinesisprovider_spark.plans.inspect import physical_plan
from messikinesisprovider_spark.registry import all_specs
from messikinesisprovider_spark.session import get_spark

SF = "/root/testdata/sf0.01"
SHOW = [
    "filter_project",
    "pricing_summary",
    "join_broadcast",
    "join_multiway",
    "sort_limit_topk",
    "window_topk_per_group",
    "asof_join_last_click",
    "dedup_minhash_lsh",
    "sim_topk_bruteforce",
    "tpch_q6_forecast_revenue",
    "tpch_q21_waiting_supplier",
    "contamination_check",
    "sim_ann_lsh",
    "term_salience_topk",
    "dedup_chunk_fraction",
    "pack_sequences",
    "gap_fill_interpolate",
    "rolling_zscore_anomaly",
    "text_oov_rate",
    # round 2b additions
    "snapshot_diff",
    "dedup_incremental_exact",
    "copurchase_pairs",
    "zorder_morton_layout",
    "funnel_conversion",
    "cohort_retention",
    "target_encode_loo",
    "triangle_count",
    # round 3 additions: two-pass global ranking (range partition + window
    # + broadcast offsets, no SinglePartition exchange), hash samplers
    "window_rank_dense_ntile",
    "percent_rank_cume",
    "vocab_coverage",
    "sample_stratified_hash",
    "split_train_val_test",
    "sample_per_source_k",
    "mixture_weights_tokens",
    "dedup_embedding_lsh",
    "dedup_incremental_minhash",
    "sketch_kmv_distinct",
    # round 3c
    "bm25_topk",
    "dedup_winnowing_overlap",
    "quality_hashed_linear",
    "range_join_binned",
    "asof_join_nearest",
    "graph_pagerank",
    "bpe_merge_step",
    "sketch_kmv_setops",
    "sim_ann_ivf_hashseed",
    "semdedup_cells",
    "ngram_lm_score",
    "ewma_user_value",
    "sketch_countmin_topk",
    "anomaly_mad_flags",
    "skyline_pareto",
    "percentile_bands_hourly",
    "fuzzy_join_lev",
    # round 3f
    "dq_expectations",
    "skew_salted_join",
    "graph_khop_reach",
    # round 3g
    "retrieval_rrf_hybrid",
    "graph_label_propagation",
    # round 3h
    "sequence_pattern_match",
    "seasonal_hourly_index",
    # round 3i
    "percentile_cont_exact",
    "multimodal_dedup_binary",
    # round 3j
    "graph_jaccard_links",
    # round 3n-3q
    "eval_auc_exact",
    "assoc_rules_lift",
    "corr_pairs_exact",
    "token_pmi_bigrams",
    "kmeans_lloyd_step",
    "ols_per_group",
    "drift_chisquare_bins",
    "markov_transitions",
    "survival_hazard_bins",
    "sketch_countmin_merge",
    "attribution_linear",
    "scd2_incremental_merge",
    # rounds 3r-3y
    "k_anonymity_audit",
    "forecast_backtest_snaive",
    "event_trigram_paths",
    "negative_sampling_hash",
    "changepoint_cusum_hourly",
    "split_group_aware",
    "partition_pruned_daily",
    "sim_ann_pq_adc",
    "dedup_containment_kmv",
    # round 3z
    "rolling_median_k",
    "langid_confusion_matrix",
    # round 3aa
    "embedding_pca_power_iter",
    # round 3cc
    "kmeans_lloyd_rounds",
    # round 4
    "graph_edges_materialized",
    "copurchase_pairs",
    "ingest_csv_documents",
    "gdpr_delete_propagation",
    "embedding_standardize",
    "cooccur_window_pmi",
    "sketch_agms_join_size",
    "threshold_sweep_quality",
    "ivm_agg_maintenance",
    "small_file_compaction_plan",
    "multimodal_frame_dedup",
    "rolling_active_users",
    "data_skipping_minmax_audit",
    "anomaly_seasonal_residual",
    "bpe_train_rounds",
    # round 4 (continued)
    "rfm_segmentation",
    "ab_test_cuped",
    "eval_ndcg_at_k",
    "graph_kcore_peel",
    "knn_graph_build",
    "corpus_shard_plan",
    "tfidf_topk_pairs",
    "eval_pass_at_k",
    "encoding_runlength_audit",
    "t_closeness_audit",
    "eval_calibration_ece",
    "bpe_encode_corpus",
    "multimodal_resize_pipeline",
    "dpp_dim_filter_join",
    "spc_control_chart",
    "arrow_batch_hash",
    "variant_props_extract",
    "pseudonymize_referential",
    "tpch_rf_maintenance",
    "schema_evolution_read",
    "observed_metrics_audit",
    "interval_union_coverage",
    "cogroup_order_reconcile",
    # round 4 (continued session): recursive CTE (UnionLoop), decorrelated
    # LATERAL (one ranking window, no per-row re-execution), adaptive-grid
    # spatial join, PAV micro-table minimax, shared-edge SSSP, split
    # finder histogram, two-pass KS cumulative, null-safe hash join
    "recursive_cte_bom",
    "lateral_topk_join",
    "tz_local_activity",
    "geo_grid_knn",
    "isotonic_calibration_pav",
    "graph_sssp_bounded",
    "tree_split_histogram",
    "weighted_median_exact",
    "apportion_largest_remainder",
    "diff_in_diff_estimate",
    "benford_first_digit_audit",
    "winsorized_trimmed_mean",
    "ohlc_candlestick_daily",
    "twap_time_weighted_value",
    "running_balance_floor",
    "bag_set_ops_all",
    "span_corruption_masking",
    "url_canonicalize_dedup",
    "ingest_jsonl_quarantine",
    "late_arriving_dim_resolution",
    "quantile_bucket_normalize",
    "business_days_ship_delay",
    "null_safe_key_join",
    "ks_test_drift_exact",
    "bootstrap_mean_ci_hash",
    "fifo_lot_matching",
    "dbscan_core_points",
    # round 4, session 4: the scale-interesting plans — prefix-filter join
    # (rare-token candidates), bitmap rollup (two-level BIT_OR), IVM delta
    # join, VAD mapInPandas, revenue-recognition explode, tournament slices
    "setsim_prefix_filter_join",
    "bitmap_distinct_rollup",
    "ivm_join_delta_view",
    "revenue_recognition_monthly",
    "multimodal_audio_vad_segments",
    "cumulative_gains_lift",
    "blocking_quality_metrics",
    "mann_whitney_u_exact",
    "successive_halving_eval",
    "embedding_matryoshka_recall",
    # rounds 5-6: the adaptive scale twins (ladder-sized LSH build sides),
    # aggregate-pushdown range join, two-pass unbounded-domain ranks,
    # chained IGNORE-NULLS windows, convergent min-label propagation
    "knn_graph_adaptive",
    "semdedup_adaptive",
    "dedup_minhash_adaptive",
    "range_join_preagg",
    "kruskal_wallis_h",
    "window_count_distinct",
    "asof_join_tolerance",
    "funnel_time_bounded",
    "graph_connected_components",
    "dsir_importance_weights",
    "values_inline_dim_join",
    # round 7
    "sim_ann_ivf_trained",
    "filtered_aggregates_report",
    "hilbert_curve_layout",
    "graph_hits_step",
    "forecast_holt_linear",
    "colbert_maxsim_retrieval",
    "mmr_diversified_topk",
    "tokenizer_vocab_prune",
    "als_rank1_round",
]


def main():
    spark = get_spark("plans")
    specs = all_specs()
    out = [
        "# PLANS — formatted physical plans of headline queries (sf0.01)\n",
        "Generated by tools/snapshot_plans.py. What to look for: `PushedFilters`",
        "(predicate pushdown), `ReadSchema` (column pruning), `BroadcastHashJoin`",
        "(dimension broadcast), paired `HashAggregate` (map-side partials),",
        "`TakeOrderedAndProject` (top-k without global sort).\n",
    ]
    for name in SHOW:
        plan = physical_plan(specs[name].fn(spark, SF))
        out.append(f"\n## {name}\n\n```\n{plan.strip()}\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")


if __name__ == "__main__":
    main()
