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
    # round 8, session 2: edge-cohesion peel, compressed-signature audit,
    # spectral perceptual hash, weighted sampling, JL projection audit
    "graph_ktruss_peel",
    "dedup_minhash_bbit",
    "image_whash_spectral_dedup",
    "sample_weighted_topk_es",
    "embedding_jl_distortion",
    # round 8, session 3: corpus-scale char entropy, per-part demand fold,
    # survival curve fold, broadcast-panel data valuation
    "text_char_entropy",
    "forecast_croston_intermittent",
    "survival_kaplan_meier",
    "data_shapley_knn",
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
    # round 6
    "semdedup_adaptive",
    "dedup_minhash_adaptive",
    "kruskal_wallis_h",
    "window_count_distinct",
    "ngram_novelty_eval",
    "dsir_importance_weights",
    # round 7: the iterative-graph convergence loop (fourth-decade target)
    "graph_connected_components",
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
    # joins — range_join_binned (pair-output-bound on this densifying
    # fixture: ~1.3e9 matched pairs at sf1) is retired from the third-decade
    # table in favor of its registered linear twin range_join_preagg
    # (round-5 verdict item 6); the binned pattern demo stays registered
    # and timed on the real three-SF decades above.
    "join_multiway",
    "range_join_preagg",
    "skew_salted_join",
    "dpp_dim_filter_join",
    "setsim_prefix_filter_join",
    # agg / window
    "window_topk_per_group",
    "window_rank_dense_ntile",
    "percentile_cont_exact",
    "sessionize_gaps",
    "percent_rank_cume",
    # dedup — semdedup_cells (fixed 16-cell count, 14x on 10x data) is
    # retired from the third decade in favor of its registered adaptive
    # twin semdedup_adaptive (round-5 verdict items 1+6).
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_adaptive",
    "dedup_minhash_bbit",
    "semdedup_adaptive",
    "dedup_winnowing_overlap",
    "url_canonicalize_dedup",
    # similarity / ANN — knn_graph_build (fixed 16-bit banding, 19x) is
    # retired in favor of knn_graph_adaptive (round-5 item 6).
    "sim_ann_ivf_hashseed",
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
    # round 7 (verdict item 2): sf1 baselines for the iterative-graph and
    # streaming-state fourth-decade rows below
    "graph_connected_components",
    "graph_modularity_lpa",
    "graph_sssp_bounded",
    "streaming_dedup_within_watermark",
]


_SFBIG_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# Round-6 verdict item 4: the open-vocab x10 fixture — every copy brings new
# vocabulary (Heaps'-law growth), so per-shingle document frequency stays
# constant and the exact prefix-filter join is measured against realistic df
# growth instead of the closed-31-word degeneracy.
OV_DIR = os.environ.get("SPARK_GRAFT_SFOV_DIR", "/tmp/sf1ov")
OV_QUERIES = [
    "setsim_prefix_filter_join",
    "dedup_minhash_lsh",
    "dedup_minhash_adaptive",
    # text members of the fourth-decade set: their sf1 baselines must be
    # open-vocab so the 1.0->10 ratio compares like with like
    "dedup_exact",
    "dedup_winnowing_overlap",
    "url_canonicalize_dedup",
    "tfidf_topk_pairs",
]

# Round-6 verdict item 8: a FOURTH decade for the dedup/ANN scale paths only
# — documents/embeddings multiplied 100x over sf0.1 (other tables stay
# sf0.1-sized; the doc/vec id family is self-contained so FKs hold).
D4_DIR = os.environ.get("SPARK_GRAFT_SF4_DIR", "/tmp/sf10de")
D4_QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_adaptive",
    "dedup_minhash_bbit",
    "semdedup_adaptive",
    "knn_graph_adaptive",
    "sim_ann_ivf_hashseed",
    "sim_ann_pq_adc",
    "dedup_winnowing_overlap",
    "url_canonicalize_dedup",
    "tfidf_topk_pairs",
]

# Round-7 verdict item 2: a fourth decade for the ITERATIVE-GRAPH loops and
# one state-heavy streaming topology — lineitem (feeds the materialized
# co-purchase edge table every graph query reads) and events (feeds the
# staged streaming logs) multiplied 100x over sf0.1; the 100 key-offset
# copies are disconnected subgraphs, so convergence round count is constant
# while per-round volume grows 100x — exactly the per-round cost bound the
# 100 TB claim needs measured. Baselines are the sf1 rows (10x), so ~10x =
# linear in the ratio column.
D4GS_DIR = os.environ.get("SPARK_GRAFT_SF4GS_DIR", "/tmp/sf10gl")
D4GS_QUERIES = [
    "graph_connected_components",
    "graph_modularity_lpa",
    "graph_sssp_bounded",
    "streaming_dedup_within_watermark",
]


def _ensure_fixture(dst: str, extra_args: list[str], marker_substrs: list[str]) -> bool:
    """A fixture only counts as present when make_sfbig's completion marker
    (written after the last table) exists, every table file exists, AND the
    marker records the expected variant — a partially-generated or
    wrong-variant directory must regenerate, never silently feed timings."""
    marker = os.path.join(dst, "_COMPLETE")
    complete = os.path.exists(marker) and all(
        os.path.exists(os.path.join(dst, f"{t}.parquet")) for t in _SFBIG_TABLES
    )
    if complete:
        with open(marker) as f:
            txt = f.read()
        complete = all(s in txt for s in marker_substrs)
    if complete:
        return True
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    r = subprocess.run(
        [sys.executable, os.path.join(here, "make_sfbig.py"), SFS[-1], dst, *extra_args],
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        print(f"fixture generation for {dst} failed, skipping:\n{r.stderr[-2000:]}")
        return False
    return True


def _ensure_sfbig() -> bool:
    return _ensure_fixture(
        BIG_DIR, ["10"], ["open_vocab=False", "multiplied=customer,"]
    )


def _ensure_sfov() -> bool:
    return _ensure_fixture(
        OV_DIR, ["10", "--open-vocab"], ["open_vocab=True", "multiplied=customer,"]
    )


def _ensure_sf4gs() -> bool:
    return _ensure_fixture(
        D4GS_DIR,
        ["100", "--tables=lineitem,events"],
        ["factor=100", "open_vocab=False", "multiplied=lineitem,events"],
    )


def _ensure_sf4() -> bool:
    # Open-vocab since round 6: the closed-vocab x100 fixture makes text
    # dedup OUTPUT volume quadratic (background similarity is a constant of
    # the closed vocabulary), so it measures fixture degeneracy, not plans.
    # Embeddings are identical under either flag (the roll is vocab-free),
    # so embedding queries' sf1 baselines stay comparable.
    return _ensure_fixture(
        D4_DIR,
        ["100", "--tables=documents,embeddings", "--open-vocab"],
        ["factor=100", "open_vocab=True", "multiplied=documents,embeddings"],
    )


def main():
    # --deep-from=<json>: reuse a previous run's three-SF (and sf1) timings
    # — re-time only the deep fixtures (sf1 rows named in --retime=, the OV
    # decade, the fourth decade) and rewrite SCALING.md. For iterating on
    # the scale-path queries without paying the ~1 h three-SF sweep.
    deep_from = None
    retime: set[str] = set()
    for a in sys.argv[1:]:
        if a.startswith("--deep-from="):
            deep_from = a.split("=", 1)[1]
        if a.startswith("--retime="):
            retime = set(a.split("=", 1)[1].split(","))
    spark = get_spark("scaling")
    specs = all_specs()
    cached_sf1: dict[str, float] = {}
    if deep_from:
        with open(deep_from) as f:
            cache = json.load(f)
        results = {k: v for k, v in cache["three_sf"].items() if k in QUERIES}
        cached_sf1 = dict(cache.get("sf1", {}))
        missing = [n for n in QUERIES if n not in results]
        for name in missing:  # queries added since the cached run
            specs[name].fn(spark, SFS[0]).write.format("noop").mode("overwrite").save()
        for name in missing:
            per_sf = []
            for sf in SFS:
                best = None
                for _ in range(2):
                    spark.catalog.clearCache()
                    t0 = time.time()
                    specs[name].fn(spark, sf).write.format("noop").mode("overwrite").save()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                per_sf.append(round(best, 3))
            results[name] = per_sf
        results = {n: results[n] for n in QUERIES if n in results}
    else:
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
    def _time_on(names: list[str], sf_dir: str) -> dict[str, float]:
        out: dict[str, float] = {}
        for name in names:
            best = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            out[name] = round(best, 3)
        return out

    big_results: dict[str, float] = {}
    if _ensure_sfbig():
        if cached_sf1:
            big_results = {n: cached_sf1[n] for n in BIG_QUERIES if n in cached_sf1 and n not in retime}
            redo = [n for n in BIG_QUERIES if n not in big_results]
            big_results.update(_time_on(redo, BIG_DIR))
        else:
            big_results = _time_on(BIG_QUERIES, BIG_DIR)
    ov_results: dict[str, float] = {}
    if _ensure_sfov():
        ov_results = _time_on(OV_QUERIES, OV_DIR)
    d4_results: dict[str, float] = {}
    if big_results and _ensure_sf4():
        d4_results = _time_on(D4_QUERIES, D4_DIR)
    d4gs_results: dict[str, float] = {}
    if big_results and _ensure_sf4gs():
        d4gs_results = _time_on(D4GS_QUERIES, D4GS_DIR)
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
    if ov_results:
        lines += [
            "",
            "## Open-vocabulary decade (round-6 item 4)",
            "",
            "`/tmp/sf1ov` = sf0.1 x10 with every copy's words suffixed `~k`:",
            "vocabulary grows with the corpus (Heaps' law), so per-shingle",
            "document frequency stays constant — the realistic regime for",
            "exact prefix-filter set-similarity. The closed-vocab sf1 row",
            "above degrades by construction (every shingle's df grows",
            "linearly; candidate groups are sum-of-df²); this row shows the",
            "same plan on realistic df growth.",
            "",
            "| query | sf0.1 s | sf1ov s | 0.1→1.0ov ratio |",
            "|---|---|---|---|",
        ]
        for name, t in ov_results.items():
            base = results[name][2] if name in results else None
            r = f"{round(t / base, 2)}x" if base else "n/a"
            lines.append(f"| {name} | {base} | {t} | {r} |")
    if d4_results:
        lines += [
            "",
            "## Fourth decade — dedup/ANN scale paths (round-6 item 8)",
            "",
            "`/tmp/sf10de` = documents/embeddings x100 over sf0.1, OPEN",
            "vocabulary (500k docs / 200k vectors; other tables sf0.1-sized —",
            "these queries read only the text/embedding tables; closed-vocab",
            "x100 makes text-dedup OUTPUT volume quadratic by construction,",
            "which measures the fixture, not the plan). Text queries compare",
            "against their open-vocab sf1 baseline, embedding queries against",
            "sf1 (embeddings are identical under either flag); 10x more",
            "content than the baseline, so ~10x = linear.",
            "",
            "| query | sf1(/ov) s | sf10de s | 1.0→10 ratio |",
            "|---|---|---|---|",
        ]
        for name, t in d4_results.items():
            base = ov_results.get(name, big_results.get(name))
            r = f"{round(t / base, 2)}x" if base else "n/a"
            lines.append(f"| {name} | {base} | {t} | {r} |")
    if d4gs_results:
        lines += [
            "",
            "## Fourth decade — iterative graph + streaming state (round-7 item 2)",
            "",
            "`/tmp/sf10gl` = lineitem + events x100 over sf0.1 (60M lineitem",
            "rows feed the materialized co-purchase edge table; 10M events",
            "feed the staged streaming log). The 100 key-offset copies form",
            "disconnected subgraphs, so the label-propagation / SSSP / CC",
            "loops converge in the SAME round count while per-round volume",
            "grows 100x — the per-round cost bound is what scales. Baseline",
            "is the sf1 row (10x data), so ~10x = linear; streaming state",
            "(watermark dedup) holds 10M keys across 4 state partitions.",
            "",
            "| query | sf1 s | sf10gl s | 1.0→10 ratio |",
            "|---|---|---|---|",
        ]
        for name, t in d4gs_results.items():
            base = big_results.get(name)
            r = f"{round(t / base, 2)}x" if base else "n/a"
            lines.append(f"| {name} | {base} | {t} | {r} |")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"three_sf": results, "sf1": big_results, "sf1ov": ov_results, "sf10de": d4_results, "sf10gl": d4gs_results}))
    print("SCALING.md written")


if __name__ == "__main__":
    main()
