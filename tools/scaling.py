"""Write SCALING.md: wall time of representative queries across the three
test scale factors (10x data per step), with the 0.01→0.1 growth ratio —
plus (round 5) a THIRD decade: the ~40 scale-tagged queries re-timed on the
synthetic sf1 fixture (tools/make_sfbig.py: sf0.1 upsampled 10x with
consistent key offsets, permuted document text and rolled embeddings so
joins/dedup scale with true content growth, not synthetic cloning).

Evidence for the scale argument: a plan whose runtime grows ~linearly (or
less, while fixed overhead dominates) across THREE decades of input is
shuffle- and skew-shaped correctly at this range; a super-linear ratio marks
an operator to re-plan. Regenerate: python tools/scaling.py (builds the sf1
fixture automatically if absent).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from messikinesisprovider_spark.registry import all_specs
from messikinesisprovider_spark.session import get_spark

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
QUERIES = [
    "pricing_summary",
    "join_multiway",
    "window_topk_per_group",
    "sessionize_gaps",
    "dedup_exact",
    "dedup_minhash_lsh",
    "term_salience_topk",
    "snapshot_diff",
    "funnel_conversion",
    "cohort_retention",
    "copurchase_pairs",
    "zorder_morton_layout",
    "curation_pipeline_e2e",
    "heavy_hitter_tokens",
    "triangle_count",
    "target_encode_loo",
    # round 3: two-pass global ranking + hash sampling family
    "window_rank_dense_ntile",
    "percent_rank_cume",
    "sample_stratified_hash",
    "split_train_val_test",
    # round 3c
    "bm25_topk",
    "dedup_winnowing_overlap",
    "range_join_binned",
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
    # round 4: shared-edge-table graph audit, format round-trips, deletion
    # cascade, feature scaling, windowed PMI, join-size sketch, aggregate
    # IVM, compaction planning, frame dedup
    "graph_edges_materialized",
    "ingest_csv_documents",
    "gdpr_delete_propagation",
    "embedding_standardize",
    "cooccur_window_pmi",
    "sketch_agms_join_size",
    "ivm_agg_maintenance",
    "small_file_compaction_plan",
    "multimodal_frame_dedup",
    "rolling_active_users",
    "data_skipping_minmax_audit",
    "anomaly_seasonal_residual",
    "bpe_train_rounds",
    # round 4 (continued): ingestion breadth, segmentation/experiment/
    # ranking evals, graph peel + kNN graph + shard plan, sparse TF-IDF
    # join, privacy trio completion, BPE encode, resize stage, DPP join
    "ingest_xml_documents",
    "ingest_binaryfile_media",
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
    # round 4 (continued session): new relational/analytics/spatial/graph
    # families
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
    # round 4, session 4
    "mann_whitney_u_exact",
    "gini_nation_spend",
    "herfindahl_supplier_share",
    "simpson_diversity_source",
    "setsim_prefix_filter_join",
    "bitmap_distinct_rollup",
    "revenue_recognition_monthly",
    "allen_interval_relations",
    "ivm_join_delta_view",
    "cumulative_gains_lift",
    "listagg_order_report",
    "hll_union_rollup",
    "permutation_test_hash",
    "sql_pipe_syntax_report",
    "fairness_parity_audit",
    "blocking_quality_metrics",
    "multimodal_audio_vad_segments",
    "attribution_position_based",
    "survivorship_golden_record",
    "wilson_lower_bound_ranking",
    "eb_shrunk_rate_ranking",
    "embedding_matryoshka_recall",
    "tree_split_two_level",
    "successive_halving_eval",
    "image_ahash_dedup",
    "forecast_pinball_loss",
    "causal_stratified_ate",
    "cohens_kappa_langid",
    "applyinarrow_group_digest",
    "bot_rate_flagging",
    "graph_modularity_lpa",
    "fano_burstiness_by_type",
    "consistent_hash_ring_plan",
    "churn_label_daily",
    "join_shuffle_hash_hint",
    "heaps_law_curve",
    "ansi_try_functions",
    "cycle_time_p50_monthly",
    # round 5
    "knn_graph_adaptive",
    "bradley_terry_two_rounds",
    "doc_unigram_surprisal",
    "eval_auc_pr_exact",
    "skew_salted_left_join",
    "kendall_tau_exact",
    "acf_daily_lags",
    "range_join_preagg",
]

# Third decade (round 5): the scale-tagged subset re-timed on the synthetic
# sf1 fixture. One heavy representative per operator family plus every query
# the round-4 verdict called out as a worst 0.01->0.1 offender
# (pricing_summary 3.73x, applyinarrow_group_digest 2.69x,
# sketch_agms_join_size 2.64x, heaps_law_curve 2.28x).
BIG_DIR = os.environ.get("SPARK_GRAFT_SFBIG_DIR", "/tmp/sf1")
BIG_QUERIES = [
    # round-4 worst offenders
    "pricing_summary",
    "applyinarrow_group_digest",
    "sketch_agms_join_size",
    "heaps_law_curve",
    # joins
    "join_multiway",
    "range_join_binned",
    "skew_salted_join",
    "dpp_dim_filter_join",
    "setsim_prefix_filter_join",
    # agg / window
    "window_topk_per_group",
    "window_rank_dense_ntile",
    "percentile_cont_exact",
    "sessionize_gaps",
    "percent_rank_cume",
    # dedup
    "dedup_exact",
    "dedup_minhash_lsh",
    "semdedup_cells",
    "dedup_winnowing_overlap",
    "url_canonicalize_dedup",
    # similarity / ANN
    "sim_ann_ivf_hashseed",
    "knn_graph_build",
    "knn_graph_adaptive",
    "sim_ann_pq_adc",
    "tfidf_topk_pairs",
    # graph (shared edge table)
    "graph_edges_materialized",
    "graph_khop_reach",
    "graph_kcore_peel",
    "triangle_count",
    # text / tokenizer
    "term_salience_topk",
    "token_pmi_bigrams",
    "ngram_lm_score",
    "bpe_train_rounds",
    "bpe_encode_corpus",
    # curation / events
    "curation_pipeline_e2e",
    "corpus_shard_plan",
    "funnel_conversion",
    "cohort_retention",
    "rolling_active_users",
    "cooccur_window_pmi",
    # python exec surfaces + sampling-heavy
    "arrow_batch_hash",
    "cogroup_order_reconcile",
    "bootstrap_mean_ci_hash",
    # round 5: preference duels, global-rank AP, outer salted join,
    # aggregate-pushdown range join (the linear twin of range_join_binned)
    "range_join_preagg",
    "bradley_terry_two_rounds",
    "eval_auc_pr_exact",
    "skew_salted_left_join",
    "doc_unigram_surprisal",
]


def _ensure_sfbig() -> bool:
    if os.path.isdir(BIG_DIR) and os.path.exists(os.path.join(BIG_DIR, "lineitem.parquet")):
        return True
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    r = subprocess.run(
        [sys.executable, os.path.join(here, "make_sfbig.py"), SFS[-1], BIG_DIR],
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        print(f"sfbig generation failed, skipping third decade:\n{r.stderr[-2000:]}")
        return False
    return True


def main():
    spark = get_spark("scaling")
    specs = all_specs()
    # warm every query once at the smallest SF (codegen, UDF workers)
    for name in QUERIES:
        specs[name].fn(spark, SFS[0]).write.format("noop").mode("overwrite").save()
    results = {}
    for name in QUERIES:
        per_sf = []
        for sf in SFS:
            best = None
            for _ in range(2):  # min-of-2: steady-state, not JIT/GC noise
                spark.catalog.clearCache()
                t0 = time.time()
                specs[name].fn(spark, sf).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            per_sf.append(round(best, 3))
        results[name] = per_sf
    big_results: dict[str, float] = {}
    if _ensure_sfbig():
        for name in BIG_QUERIES:
            best = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                specs[name].fn(spark, BIG_DIR).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            big_results[name] = round(best, 3)
    lines = [
        "# SCALING — wall time across scale factors (local[32], min of 2 runs)",
        "",
        "10x rows per SF step. Ratio columns are wall-time growth per decade:",
        "~1x means fixed overhead still dominates (the plan has headroom), up",
        "to ~10x is linear in input, above ~10x would flag a super-linear",
        "shuffle or skew problem. The sf1 columns are the scale-tagged subset",
        "re-timed on the synthetic third decade (`tools/make_sfbig.py`:",
        "sf0.1 upsampled 10x, keys offset consistently, document text",
        "permuted / embeddings rolled per copy so dedup/ANN joins scale with",
        "true content growth). Regenerate: `python tools/scaling.py`.",
        "",
        "| query | sf0.001 s | sf0.01 s | sf0.1 s | 0.01→0.1 ratio | sf1 s | 0.1→1.0 ratio |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, (a, b, c) in results.items():
        ratio = round(c / b, 2) if b else float("nan")
        if name in big_results:
            d = big_results[name]
            big_ratio = f"{round(d / c, 2)}x" if c else "nan"
            lines.append(f"| {name} | {a} | {b} | {c} | {ratio}x | {d} | {big_ratio} |")
        else:
            lines.append(f"| {name} | {a} | {b} | {c} | {ratio}x | | |")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"three_sf": results, "sf1": big_results}))
    print("SCALING.md written")


if __name__ == "__main__":
    main()
