"""Semantic tests for feature-engineering (operators/features.py) and graph
(operators/graph2.py) operators — python recomputation next to the parity
harness's cross-engine hash check."""

from collections import defaultdict

from pyspark.sql import functions as F

from messikinesisprovider_spark.operators import features, graph2

SF = "/root/testdata/sf0.001"


def test_target_encode_loo_matches_python(spark):
    rows = features.target_encode_loo(spark, SF).collect()
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).collect()
    sums, counts = defaultdict(float), defaultdict(int)
    for r in o:
        sums[r["o_orderpriority"]] += r["o_totalprice"]
        counts[r["o_orderpriority"]] += 1
    prices = {r["o_orderkey"]: (r["o_orderpriority"], r["o_totalprice"]) for r in o}
    assert len(rows) == len(o)
    for r in rows:
        cat, price = prices[r["o_orderkey"]]
        n = counts[cat]
        if n > 1:
            want = (sums[cat] - price) / (n - 1)
            assert abs(r["loo_mean_price"] - want) < 1e-6
            # leakage check: the encoding never equals the plain category
            # mean unless the row's value IS the mean
            mean = sums[cat] / n
            if abs(price - mean) > 1e-9:
                assert abs(r["loo_mean_price"] - mean) > 1e-12
        else:
            assert r["loo_mean_price"] is None


def test_histogram_equidepth_bins_are_balanced_and_ordered(spark):
    rows = features.histogram_equidepth(spark, SF).collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r["bin"])
        assert [r["bin"] for r in rs] == list(range(1, features._N_BINS + 1))
        sizes = [r["n"] for r in rs]
        assert max(sizes) - min(sizes) <= 1  # equi-depth: ntile balance
        for lo_r, hi_r in zip(rs, rs[1:]):
            assert lo_r["hi"] <= hi_r["lo"]  # bins tile the value axis
        for r in rs:
            assert r["lo"] <= r["hi"]


def test_triangle_count_matches_python_sets(spark):
    [row] = graph2.triangle_count(spark, SF).collect()
    edges = {
        (r["a"], r["b"]) for r in graph2._copurchase_edges(spark, SF).collect()
    }
    assert row["n_edges"] == len(edges)
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    # count each triangle {a<b<c} exactly once: at its (a,b) edge with the
    # third vertex constrained above b
    want = sum(
        1
        for (a, b) in edges
        for c in (adj[a] & adj[b])
        if b < c
    )
    assert row["n_triangles"] == want
