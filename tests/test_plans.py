"""Plan-quality tests: the scale contract (pushdown, pruning, broadcast,
partial aggregation, top-k) asserted on the physical plans of the registered
queries. A change that silently de-optimizes a plan fails here, not on a
cluster."""

from messikinesisprovider_spark.plans import inspect
from messikinesisprovider_spark.registry import all_specs

SF = "/root/testdata/sf0.001"


def q(spark, name):
    return all_specs()[name].fn(spark, SF)


def test_filter_pushdown_reaches_parquet_scan(spark):
    df = q(spark, "filter_project")
    pushed = " ".join(inspect.pushed_filters(df))
    assert "l_discount" in pushed and "l_quantity" in pushed and "l_shipdate" in pushed


def test_column_pruning_reads_only_needed_columns(spark):
    df = q(spark, "filter_project")
    [schema] = inspect.read_schemas(df)
    # 11-column table; only the 7 referenced columns should be read
    assert "l_orderkey" in schema and "l_extendedprice" in schema
    assert "l_suppkey" not in schema and "l_tax" not in schema


def test_dimension_join_broadcasts(spark):
    assert inspect.has_broadcast_join(q(spark, "join_broadcast"))


def test_multiway_join_broadcasts_all_dims(spark):
    plan = inspect.physical_plan(q(spark, "join_multiway"))
    # lineitem⋈orders may shuffle; every dimension join must broadcast
    assert plan.count("BroadcastHashJoin") >= 4


def test_topk_avoids_global_sort(spark):
    assert inspect.has_top_k(q(spark, "sort_limit_topk"))


def test_aggregation_has_map_side_partial(spark):
    assert inspect.partial_aggregate_count(q(spark, "pricing_summary")) >= 2


def test_semi_join_stays_semi(spark):
    plan = inspect.physical_plan(q(spark, "join_semi"))
    assert "LeftSemi" in plan


def test_anti_join_stays_anti(spark):
    plan = inspect.physical_plan(q(spark, "join_anti"))
    assert "LeftAnti" in plan


def test_scan_heavy_queries_are_codegen(spark):
    # the hot path of a pure projection pipeline should be one codegen span
    assert inspect.codegen_stage_count(q(spark, "text_stats")) >= 1


def test_events_time_filter_prunes_columns(spark):
    df = q(spark, "cursor_scan_from_time")
    schemas = inspect.read_schemas(df)
    assert all("props" not in s for s in schemas), "unused props column must be pruned"


def test_bucketed_join_query_has_no_join_exchange(spark):
    """join_bucketed_colocated: sort-merge join fed directly by bucketed
    scans — the only Exchange allowed is the final small aggregation's."""
    # simple plan prints parent-first: everything after SortMergeJoin is the
    # join's input subtree, where an Exchange would mean a shuffled join
    plan = inspect.simple_plan(q(spark, "join_bucketed_colocated"))
    assert "SortMergeJoin" in plan
    join_inputs = plan.split("SortMergeJoin")[-1]
    assert "Exchange" not in join_inputs, plan
    assert "SelectedBucketsCount: 16 out of 16" in inspect.physical_plan(
        q(spark, "join_bucketed_colocated")
    )


def test_ivf_query_plan_has_no_ml_stages(spark):
    """sim_ann_ivf must be pure Catalyst at query time: the quantizer is a
    literal, so no MLlib stages and no extra scan for training.  (Retired
    from the registry in round 7 — similarity5.sim_ann_ivf_trained is the
    registered trained-IVF query — but the library function keeps its plan
    contract.)"""
    from messikinesisprovider_spark.operators.similarity import sim_ann_ivf

    plan = inspect.physical_plan(sim_ann_ivf(spark, SF))
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # The registered successor is trained fully in-plan: no ML stages either.
    plan2 = inspect.physical_plan(q(spark, "sim_ann_ivf_trained"))
    assert "BroadcastNestedLoopJoin" in plan2 or "BroadcastHashJoin" in plan2


def test_tpch_q6_predicates_all_push_to_scan(spark):
    pushed = " ".join(inspect.pushed_filters(q(spark, "tpch_q6_forecast_revenue")))
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed


def test_tpch_q2_no_cartesian_and_min_via_window(spark):
    plan = inspect.physical_plan(q(spark, "tpch_q2_min_cost_supplier"))
    assert "CartesianProduct" not in plan
    assert "Window" in plan  # groupwise min is a window, not a rejoined subquery


def test_tpch_q21_single_lineitem_orders_join_shape(spark):
    """The EXISTS/NOT EXISTS pair must collapse into one per-order aggregate:
    exactly one lineitem-orders join subtree feeding both the late lines and
    the order stats, never three correlated rescans."""
    plan = inspect.physical_plan(q(spark, "tpch_q21_waiting_supplier"))
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan
    # distinct counts via two-level aggregation, not count_distinct's Expand
    # (which would double every fact row before the shuffle)
    assert "Expand" not in plan
    assert plan.count("HashAggregate") >= 4  # partials at both levels


def test_tpch_q16_excluded_suppliers_are_anti_join(spark):
    plan = inspect.physical_plan(q(spark, "tpch_q16_supplier_count"))
    assert "LeftAnti" in plan


def test_tpch_q17_avg_threshold_is_aggregate_then_join(spark):
    # correlated scalar subquery decorrelated: no nested-loop per-row rescan
    plan = inspect.physical_plan(q(spark, "tpch_q17_small_quantity_revenue"))
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4  # partial+final for avg and sum


def test_contamination_corpus_side_never_shuffles_before_join(spark):
    """The training-corpus scan must flow into a broadcast join (eval side
    built) with no Exchange between scan and join."""
    plan = inspect.simple_plan(q(spark, "contamination_check"))
    join_inputs = plan.split("BroadcastHashJoin")[-1]
    scan_part = join_inputs.split("Scan parquet")[0] if "Scan parquet" in join_inputs else join_inputs
    assert "Exchange hashpartitioning" not in scan_part, plan


def test_term_salience_df_table_broadcasts(spark):
    plan = inspect.physical_plan(q(spark, "term_salience_topk"))
    # document-frequency (vocabulary) side must broadcast; the only corpus
    # shuffles are the two aggregations and the final per-doc window
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # rank pushdown: partial top-k before the window shuffle
    assert "WindowGroupLimit" in plan


def test_oov_vocab_side_broadcasts(spark):
    plan = inspect.physical_plan(q(spark, "text_oov_rate"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_curation_row_maps_have_no_shuffle(spark):
    # quality gate and int8 quantization are pure per-row maps: no Exchange
    for name in ("quality_gopher_rules", "embedding_quantize_int8"):
        plan = inspect.physical_plan(q(spark, name))
        assert "Exchange" not in plan, name
        assert "pythonUDF" not in plan.lower(), name


def test_pack_sequences_window_partitions_by_source(spark):
    # the running total must partition by the shard key — a global-order
    # window (empty partition spec) would serialize at scale
    plan = inspect.physical_plan(q(spark, "pack_sequences"))
    assert "partitionspec=[source" in plan.replace(" ", "").lower() or (
        "hashpartitioning(source" in plan.replace(" ", "").lower()
    )


def test_timeseries_windows_partition_by_key(spark):
    plan = inspect.physical_plan(q(spark, "rolling_zscore_anomaly"))
    assert "hashpartitioning(event_type" in plan.replace(" ", "").lower()
    plan2 = inspect.physical_plan(q(spark, "gap_fill_interpolate"))
    assert "hashpartitioning(event_type" in plan2.replace(" ", "").lower()


def test_copurchase_apriori_side_broadcasts(spark):
    # the frequent-item list and the basket-width list are both orders of
    # magnitude smaller than lineitem: they must broadcast, and the only
    # SortMergeJoin allowed is the orderkey-aligned pair self-join.
    # (round 4: the registered query reads the materialized shared table,
    # so the mining-shape pins move to the mining function itself)
    from messikinesisprovider_spark.operators.graphshared import (
        mine_copurchase_pairs,
    )

    mined = mine_copurchase_pairs(spark, SF)
    plan = inspect.physical_plan(mined)
    assert plan.count("BroadcastHashJoin") >= 1
    assert inspect.partial_aggregate_count(mined) >= 2
    # the registered query itself must be a bare scan of the materialized
    # bucketed table — no re-mining join anywhere in its plan
    reader_plan = inspect.physical_plan(q(spark, "copurchase_pairs"))
    assert "Join" not in reader_plan


def test_funnel_stage_filters_push_to_scan(spark):
    df = q(spark, "funnel_conversion")
    pushed = " ".join(inspect.pushed_filters(df))
    assert "event_type" in pushed  # each stage reads a slim slice


def test_data_profile_is_single_scan(spark):
    plan = inspect.physical_plan(q(spark, "data_profile_orders"))
    # one scan of orders feeds all per-column metrics (the Expand for the
    # multi-distinct is the documented exactness cost, not an extra scan).
    # formatted explain prints each node twice (tree + details), so a
    # single scan appears at most twice in the string
    assert plan.count("Scan parquet") <= 2
    assert "Expand" in plan


def test_incremental_dedup_stays_anti_join(spark):
    plan = inspect.physical_plan(q(spark, "dedup_incremental_exact"))
    assert "LeftAnti" in plan


def test_zorder_audit_has_map_side_partial(spark):
    assert inspect.partial_aggregate_count(q(spark, "zorder_morton_layout")) >= 2
    # the interleave is pure integer arithmetic: no Python anywhere
    plan = inspect.physical_plan(q(spark, "zorder_morton_layout"))
    assert "pythonUDF" not in plan.lower()


def test_snapshot_diff_full_outer_on_key(spark):
    plan = inspect.physical_plan(q(spark, "snapshot_diff"))
    assert "FullOuter" in plan
    # changed-row filter is codegen, not Python
    assert "pythonUDF" not in plan.lower()


def test_cohort_retention_has_map_side_partial(spark):
    assert inspect.partial_aggregate_count(q(spark, "cohort_retention")) >= 2


def test_no_row_at_a_time_python_udfs_anywhere(spark):
    """Blanket UDF-discipline check over the whole registry: no registered
    query may plan a row-at-a-time Python UDF (BatchEvalPython). Python is
    allowed only Arrow-batched (ArrowEvalPython / MapInPandas /
    FlatMapGroupsInPandas / UDTF). Streaming topologies are excluded — their
    fn() executes a real stream rather than returning a lazy plan."""
    from messikinesisprovider_spark.registry import all_specs

    skipped, checked = [], 0
    for name, spec in all_specs().items():
        if name.startswith("streaming_") or "eval" in spec.tags:
            skipped.append(name)
            continue
        plan = inspect.physical_plan(spec.fn(spark, SF))
        assert "BatchEvalPython" not in plan, f"{name} plans a row-at-a-time Python UDF"
        checked += 1
    assert checked > 100  # the sweep really covered the registry


# Queries whose plan legitimately contains a BroadcastNestedLoopJoin. Every
# entry is one of two sanctioned shapes; anything NEW that plans a BNLJ must
# either re-plan or be added here with its reason.
#   scalar: joining a 1-row (or few-row constant-size) broadcast aggregate —
#           thresholds, corpus totals, max-date cursors, trained quantizers;
#           build side is O(1) regardless of data scale.
#   all-pairs baseline: deliberate exact baselines, row-capped/guarded and
#           documented as the verifier for a bucketed scale path.
_BNLJ_ALLOWED = {
    # scalar broadcasts (retrieval_rrf_hybrid: the ONE-row query vector —
    # c.vec_id <> q.vec_id against a single broadcast row is O(1) build)
    "retrieval_rrf_hybrid",
    "flagship_events_last_day", "cursor_scan_from_time",
    "cursor_scan_external_id", "cursor_fallback_replay",
    "tpch_q11_important_stock", "tpch_q22_global_sales_opportunity",
    "sketch_distinct_rollup", "source_mixing_weights", "vocab_coverage",
    "rebalance_classes", "mixture_weights_tokens", "bm25_topk",
    "bpe_merge_step", "sketch_kmv_setops", "triangle_count",
    # 16-row constant quantizer broadcasts
    "sim_ann_ivf_hashseed", "semdedup_cells", "sim_ann_ivf",
    # round 7: the trained-IVF twin — same 16-row quantizer broadcasts,
    # once per Lloyd round plus the final assignment
    "sim_ann_ivf_trained",
    # round 7: bounded/scalar broadcasts — ColBERT's 8-row query-vector set
    # (theta join on mvdoc inequality), MMR's 1-row greedy picks over a
    # 20-row candidate table, ALS's 1-row K and denominator totals
    "colbert_maxsim_retrieval", "mmr_diversified_topk", "als_rank1_round",
    # round 7: the 8-row binary-quantized query set broadcast (theta join
    # on vec_id inequality — the sim_topk class)
    "embedding_binary_quantize_recall",
    # round 8: the 32-row eval-set broadcast — decontamination is an exact
    # corpus x eval scan BY DESIGN (recall 1.0; LSH measured 0.5 at θ≈68°),
    # the build side is the benchmark, bounded independent of corpus scale
    "contamination_check_embedding",
    # round 8 session 3: the 4-row h60-sampled test-panel broadcast (the
    # contamination_check_embedding class — build side is the fixed panel,
    # independent of corpus scale; theta filter t.vec_id <> q.test_id)
    "data_shapley_knn",
    # round 8: per-round 1-row triangle/edge report-row crossJoins (the
    # graph_kcore_peel class) and the 1-row u-probability broadcast into
    # the Fellegi-Sunter scoring select
    "graph_ktruss_peel", "er_fellegi_sunter",
    # round 8: the 1-row global distinct-bigram scalar broadcast (the
    # continuation-probability denominator)
    "ngram_lm_kneser_ney",
    # round 6: the adaptive SemDeDup centroid broadcast — ladder-sized
    # (16..4096 rows, hard cap), a capped quantizer build side independent
    # of fact-table scale (the semdedup_cells class with a bounded k)
    "semdedup_adaptive",
    # round 6: 1-row scalar broadcasts — the Kruskal-Wallis tie-correction
    # row, Cramér's grand-total row, the mixing-temperature total and
    # normalizer rows (all O(1) build sides, the token_pmi class)
    "kruskal_wallis_h", "cramers_v_association", "source_mixing_temperature",
    # guarded all-pairs exact baselines
    "dedup_embedding_cosine", "sim_topk_bruteforce",
    # rounds 3n-3r — scalar broadcasts (1-row totals/bounds/report aggregates:
    # token_pmi's corpus total, drift's time bounds, countmin_merge's verdict
    # row, scd2_incremental's count report, assoc_rules' basket total) and
    # post-aggregation micro-table theta joins whose cardinality is bounded
    # by the DOMAIN, not the data (AUC's score buckets, survival's day bins,
    # kmeans' 16-centroid assignment)
    "eval_auc_exact", "assoc_rules_lift", "token_pmi_bigrams",
    "kmeans_lloyd_step", "drift_chisquare_bins", "survival_hazard_bins",
    "sketch_countmin_merge", "scd2_incremental_merge",
    # rounds 3s-3y scalar broadcasts: the trigram corpus total, the
    # forecast day bounds, the split leakage-verdict row, the part-domain
    # max for negative sampling
    "event_trigram_paths", "forecast_backtest_snaive", "split_group_aware",
    "negative_sampling_hash",
    # round 3z/3aa scalar broadcasts: confusion-matrix overall totals, the
    # PCA Rayleigh/max-abs report rows
    "langid_confusion_matrix", "embedding_pca_power_iter",
    # round 3cc: 16-row constant centroid broadcasts per Lloyd round; the
    # day-level cumulative theta join (|days| micro-table, survival shape)
    "kmeans_lloyd_rounds", "user_growth_curve",
    # round 4: the windowed-PMI corpus total (1-row broadcast, the
    # token_pmi_bigrams shape)
    "cooccur_window_pmi",
    # round 4: 1-row scalar broadcasts — the AGMS exact-join-size ground
    # truth row, and the IVM time-split bound
    "sketch_agms_join_size", "ivm_agg_maintenance",
    # round 4: day-level exclusive-running-sum theta join (|days|
    # micro-table, the user_growth_curve shape)
    "small_file_compaction_plan",
    # round 4: per-round 1-row winning-pair broadcasts (the
    # kmeans_lloyd_rounds shape in the text domain)
    "bpe_train_rounds",
    # round 4: PAV minimax on the 32-row bin table — theta joins bounded
    # by the BIN DOMAIN squared (the user_growth_curve micro-table class)
    "isotonic_calibration_pav",
    # round 4: 1-row best-threshold broadcast (tree split argmax) and the
    # |sources| micro-table remainder-rank theta join + 1-row totals
    "tree_split_histogram", "apportion_largest_remainder",
    # round 4: 1-row digit-total broadcast (Benford chi-square shares)
    "benford_first_digit_audit",
    # round 4: 1-row adaptive-cell-width broadcast (spatial grid join)
    "geo_grid_knn",
    # round 4: 1-row group-total broadcast (KS integer cross-product form)
    "ks_test_drift_exact",
    # round 4: 1-row adaptive-eps broadcast (DBSCAN core-point grid)
    "dbscan_core_points",
    # round 4: 1-row scalar broadcasts — the corpus max-date row (RFM
    # recency anchor), the timeline-midpoint bound + 1-row global-moment
    # row (CUPED theta)
    "rfm_segmentation", "ab_test_cuped",
    # round 4: per-round 1-row survivor/edge report-row crossJoins
    # (metadata-scale aggregates of the shrinking k-core edge set)
    "graph_kcore_peel",
    # round 4: the 1-row corpus-size broadcast feeding the df cap and the
    # scaled-integer idf (the bm25_topk shape)
    "tfidf_topk_pairs",
    # round 4: micro-table crosses of post-aggregation totals — the 3-row
    # sensitive-value marginals + 1-row corpus total (t-closeness grid),
    # the 1-row ECE numerator/denominator total
    "t_closeness_audit", "eval_calibration_ece",
    # round 4: the 1-row max-key broadcast re-keying the RF1 insert batch
    "tpch_rf_maintenance",
    # round 4: the 10x10 decile micro-table cumulative theta join + the
    # 1-row totals broadcast (the user_growth_curve class)
    "cumulative_gains_lift",
    # round 4: the 1-row merged-sketch estimate crossed with the 1-row
    # exact total (ALL row of the HLL rollup)
    "hll_union_rollup",
    # round 4: 1-row global-rate broadcast (four-fifths rule)
    "fairness_parity_audit",
    # round 4: 1-row root-argmax broadcast + 9-row per-child argmax theta;
    # <=8-row per-round config-rank theta joins (successive halving)
    "tree_split_two_level", "successive_halving_eval",
    # round 4: the 8-query-vector broadcast against the corpus (the
    # sim_topk_bruteforce shape at two dimensionalities)
    "embedding_matryoshka_recall",
    # round 4: the 1-row chance-agreement total crossed with the 1-row
    # accuracy total (Cohen's kappa)
    "cohens_kappa_langid",
    # round 4: the 1-row per-user-average totals broadcast (abuse flags)
    "bot_rate_flagging",
    # round 4: 1-row scalar broadcasts — the forecast day bounds (the
    # forecast_backtest_snaive shape), the churn last-day bound, and the
    # modularity edge-count m
    "forecast_pinball_loss", "churn_label_daily", "graph_modularity_lpa",
    # round 5: the 1-row corpus-token-total broadcast feeding the scaled
    # inverse-frequency term (the token_pmi_bigrams corpus-total shape)
    "doc_unigram_surprisal",
    # round 5: domain-bounded contingency/marginal micro-table theta joins
    # (50x11 value-domain cells; the eval_auc_exact score-bucket class) plus
    # 1-row report-total crosses
    "kendall_tau_exact", "spearman_rho_exact",
    # round 5: the 7-row lag spine crossed with the |days| micro-series and
    # the 1-row mean/denominator broadcasts
    "acf_daily_lags",
    # round 5: the 8-row salt-spine broadcast replicating the dimension side
    # (the skew_salted_join construction, outer variant)
    "skew_salted_left_join",
    # round 5: the 7-row offset-spine broadcast (aggregate-pushdown range join)
    "range_join_preagg",
    # round 5: the 1-row global-revenue total broadcast (percent-of-total)
    "ratio_to_report_window",
    # round 5: 1-row total/p80 broadcasts + the 10-row decile spine
    # (Pareto concentration report)
    "pareto_8020_revenue",
    # round 5: 1-row max-date / timeline-bounds / totals broadcasts
    "decayed_popularity_halflife", "drift_total_variation",
}


def test_no_cartesian_and_bnlj_only_where_sanctioned(spark):
    """Blanket join-discipline check: no registered query may plan a
    CartesianProduct, and BroadcastNestedLoopJoin only for the whitelisted
    scalar-broadcast / guarded-baseline shapes above. Catches the classic
    scale regression where a join predicate stops being an equi-join."""
    from messikinesisprovider_spark.registry import all_specs

    checked = 0
    for name, spec in all_specs().items():
        if name.startswith("streaming_") or "eval" in spec.tags:
            continue
        plan = inspect.physical_plan(spec.fn(spark, SF))
        assert "CartesianProduct" not in plan, f"{name} plans a CartesianProduct"
        if name not in _BNLJ_ALLOWED:
            assert (
                "BroadcastNestedLoopJoin" not in plan
            ), f"{name} plans an unsanctioned BroadcastNestedLoopJoin"
        checked += 1
    assert checked > 100


def test_shuffle_hash_hint_is_honored(spark):
    """join_shuffle_hash_hint exists to demonstrate the strategy hint:
    the plan must contain a ShuffledHashJoin (not the SMJ Catalyst would
    otherwise pick for two large sides)."""
    from messikinesisprovider_spark.operators.pipeline67 import join_shuffle_hash_hint
    from messikinesisprovider_spark.plans import inspect

    plan = inspect.physical_plan(join_shuffle_hash_hint(spark, SF))
    assert "ShuffledHashJoin" in plan, "SHUFFLE_HASH hint was not honored"


def test_dpp_is_planned(spark):
    """dpp_dim_filter_join's fact scan must carry a dynamic-pruning
    partition filter — the plan property the query exists to demonstrate
    (only matching day partitions are read at runtime)."""
    from messikinesisprovider_spark.operators.pipeline35 import dpp_join_frame

    out = dpp_join_frame(spark, SF)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
