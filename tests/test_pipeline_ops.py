"""Behavioral tests for the pipeline_ops family (PII scrub, stratified
sampling, decontamination, repetition filter) beyond the DuckDB parity gate:
determinism, invariants, and plan-shape assertions."""

from pyspark.sql import functions as F

from messikinesisprovider_spark.operators import pipeline_ops

SF = "/root/testdata/sf0.001"


def test_pii_scrub_removes_planted_pii(spark):
    rows = {r["doc_id"]: r for r in pipeline_ops.text_pii_scrub(spark, SF).collect()}
    assert rows, "sampled slice must be non-empty"
    for doc_id, r in rows.items():
        if doc_id % 3 in (0, 1):
            # a planted email/phone was removed
            assert r["n_pii_chars"] > 0, doc_id
        else:
            assert r["n_pii_chars"] == 0, doc_id
        assert r["scrubbed_len"] > 0


def test_stratified_sample_rates_and_determinism(spark):
    a = {r["lang"]: r for r in pipeline_ops.sample_stratified(spark, SF).collect()}
    b = {r["lang"]: r for r in pipeline_ops.sample_stratified(spark, SF).collect()}
    assert a.keys() == b.keys()
    for lang in a:
        assert (a[lang]["n_kept"], a[lang]["n_total"]) == (b[lang]["n_kept"], b[lang]["n_total"])
        assert 0 <= a[lang]["n_kept"] <= a[lang]["n_total"]
    # full-rate strata keep everything
    for lang in ("zh", "es", "de"):
        if lang in a:
            assert a[lang]["n_kept"] == a[lang]["n_total"]
    # the downsampled stratum actually downsamples (en rate 0.5; binomial
    # bound loose enough for the small sf0.001 corpus)
    if "en" in a and a["en"]["n_total"] >= 10:
        assert a["en"]["n_kept"] < a["en"]["n_total"]


def test_contamination_join_broadcasts_eval_side(spark):
    df = pipeline_ops.contamination_check(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    # report covers only training sources
    assert all(r["source"] != "src0" for r in df.collect())


def test_repetition_ratio_invariants(spark):
    rows = pipeline_ops.text_repetition_ratio(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r["top_gram_count"] <= r["n_grams"]
        assert 0 < r["repetition_ratio"] <= 1.0
        assert r["flagged"] == (
            r["top_gram_count"] / r["n_grams"] > pipeline_ops.REPETITION_MAX_RATIO
        )


def test_sketch_rollup_accuracy_and_merge_consistency(spark):
    rows = {
        r["source"]: (r["n_distinct_exact"], r["hll_within_tol"])
        for r in pipeline_ops.sketch_distinct_rollup(spark, SF).collect()
    }
    d = spark.read.parquet(f"{SF}/documents.parquet")
    exact_total = d.select("text").distinct().count()
    total_exact, total_tol = rows.pop("__all__")
    assert total_exact == exact_total
    # per-source estimates AND the merged global estimate are in tolerance
    assert total_tol and all(tol for _, tol in rows.values())
    assert sum(n for n, _ in rows.values()) >= exact_total  # sources partition docs
