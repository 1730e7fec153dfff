"""Adversarial edge-data parity: NULL text/user/value, empty and unicode
strings, zero-norm vectors, same-timestamp ties.

The driver's synthetic tables are clean, so cross-engine divergences on
these inputs stay latent until real data hits them. tools/edge_fixtures.py
builds an sf0.001 copy with the edges injected; this module re-runs the
Spark-vs-DuckDB compare for every query class that round 3's full edge
sweep found (and fixed): zero-norm cosine guards, NULL-key join/window
semantics, NULL-text UDF paths, xxhash64(NULL) phantom sketch items, the
NULL partition-key publish sentinel, and DuckDB 1.0's lossy
arg_max-over-DECIMAL keys. The full sweep is `python tools/edge_fixtures.py
&& python tools/parity.py /tmp/sfedge`.
"""

import importlib.util
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(_REPO, "tools", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.argv, argv = [name], sys.argv  # tools read sys.argv at import
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.argv = argv
    return mod


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sfedge"))
    subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "edge_fixtures.py"), out],
        check=True,
        capture_output=True,
    )
    return out


# one per fixed divergence class; the heavy streaming twins stay in the
# manual full sweep
EDGE_QUERIES = [
    "sim_topk_bruteforce",        # zero-norm vector exclusion
    "embedding_quantize_int8",    # amax=0 guard
    "dedup_simhash",              # NULL text -> no signature (UDF None path)
    "asof_join_last_click",       # NULL join key semantics
    "histogram_equidepth",        # NULL ordering (ntile) exclusion
    "user_features_builtin",      # null-safe oracle join (NULL group kept)
    "grouped_user_features",      # nullable key in applyInPandas schema
    "pandas_udaf_weighted_mean",  # NULL value/weight in UDAF
    "sketch_distinct_rollup",     # xxhash64(NULL) phantom item + tol floor
    "text_hashed_embedding_pool", # zero-token source pooling
    "streaming_cdc_upsert",       # publish sentinel + HUGEINT arg_max key
    "er_fellegi_sunter",          # NULL field agreement = 0, not NULL (when/otherwise vs CASE)
    "dp_noisy_count_release",     # NULL group key in seed (Spark CONCAT propagates NULL, DuckDB skips)
    # round-8 session-3 NULL-ts classes (fixture injects NULL event ts):
    "sessionize_gaps",            # untimestamped events excluded from sessions (NULLS FIRST/LAST split)
    "scd2_history",               # temporal build requires ts (version numbering shift)
    "window_running_frame",       # explicit ts NULLS LAST in running frames
    "time_bucket_tumbling",       # window() drops NULL ts; oracle filter matches
]


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_query_matches_oracle(spark, edge_dir, name):
    parity = _load_tool("parity")
    from messikinesisprovider_spark.registry import all_specs

    spec = all_specs()[name]
    con = parity.duck_connect(edge_dir)
    spark_pdf = parity.canon(spec.fn(spark, edge_dir).toPandas())
    duck_pdf = parity.canon(con.execute(spec.oracle).df())
    problems = parity.compare(name, spark_pdf, duck_pdf)
    assert not problems, problems


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    import duckdb

    out = str(tmp_path_factory.mktemp("sfempty"))
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('/root/testdata/sf0.001/{t}.parquet') "
            f"WHERE false) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    return out


# one per fixed empty-input class: Spark ROLLUP/CUBE emits no rows where SQL
# emits the () total (HAVING-aligned oracles), 0-divisor recall/estimator
# guards, empty IVF quantizer short-circuit
EMPTY_QUERIES = [
    "rollup_agg",
    "cube_agg",
    "grouping_sets",
    "multimodal_decode_pipeline",
    "sketch_kmv_setops",
]


@pytest.mark.parametrize("name", EMPTY_QUERIES)
def test_empty_input_matches_oracle(spark, empty_dir, name):
    parity = _load_tool("parity")
    from messikinesisprovider_spark.registry import all_specs

    spec = all_specs()[name]
    con = parity.duck_connect(empty_dir)
    spark_pdf = parity.canon(spec.fn(spark, empty_dir).toPandas())
    duck_pdf = parity.canon(con.execute(spec.oracle).df())
    problems = parity.compare(name, spark_pdf, duck_pdf)
    assert not problems, problems


def test_empty_input_recall_evals_and_ivf_run(spark, empty_dir):
    from messikinesisprovider_spark.operators import evals, similarity

    assert similarity.sim_ann_ivf(spark, empty_dir).count() == 0
    for r in evals.ann_recall_eval(spark, empty_dir).collect():
        assert r["n_exact"] == 0 and r["recall"] is None
    r = evals.minhash_recall_eval(spark, empty_dir).collect()[0]
    assert r["n_true_pairs"] == 0 and r["recall"] is None


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sfskew"))
    subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "skew_fixtures.py"), out],
        check=True,
        capture_output=True,
    )
    return out


# Third adversarial axis: hot keys (tools/skew_fixtures.py — 54% of events on
# one user, 120x verbatim boilerplate doc + 30 near-variants, 140 cloned/
# perturbed template embeddings, one 80-line order). The round-3 full sweep
# passed 0/176 first try (the edge/empty hardening plus the df/bucket caps
# already covered hot keys); these pin the classes most sensitive to skew so
# a regression surfaces in CI, not in the next full sweep.
SKEW_QUERIES = [
    "skew_salted_join",          # the hot-key join itself (54% single-key)
    "dedup_minhash_lsh",         # 120-doc identical band buckets (7140 pairs)
    "dedup_clusters",            # one giant star component
    "sessionize_gaps",           # one user owning half the session stream
    "latest_event_per_user",     # hot-user window + burst-minute ties
    "semdedup_cells",            # degenerate cell: 140 vectors, cosine 1.0
    "heavy_hitter_tokens",       # boilerplate tokens dominating counts
    "mixture_weights_tokens",    # one source dominating the mix
]


@pytest.mark.parametrize("name", SKEW_QUERIES)
def test_skewed_data_matches_oracle(spark, skew_dir, name):
    parity = _load_tool("parity")
    from messikinesisprovider_spark.registry import all_specs

    spec = all_specs()[name]
    con = parity.duck_connect(skew_dir)
    spark_pdf = parity.canon(spec.fn(spark, skew_dir).toPandas())
    duck_pdf = parity.canon(con.execute(spec.oracle).df())
    problems = parity.compare(name, spark_pdf, duck_pdf)
    assert not problems, problems
