"""Python references for pipeline59 (round 4): Wilson LB and EB shrinkage
rankings."""

from __future__ import annotations

import math

import pandas as pd

from messikinesisprovider_spark.operators import pipeline59

SF = "/root/testdata/sf0.001"


def _per_brand():
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    part = pd.read_parquet(f"{SF}/part.parquet")
    li = li.merge(part[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey")
    g = li.groupby("p_brand")["l_returnflag"].agg(
        n="size", pos=lambda s: int((s == "R").sum())
    )
    return g


def test_wilson_matches_formula_and_orders_correctly(spark):
    rows = {r["brand"]: r for r in pipeline59.wilson_lower_bound_ranking(spark, SF).collect()}
    g = _per_brand()
    z, z2 = 1.96, 3.8416
    scores = {}
    for brand, (n, pos) in g.iterrows():
        phat = pos / n
        lb = (phat + z2 / (2 * n) - z * math.sqrt((phat * (1 - phat) + z2 / (4 * n)) / n)) / (
            1 + z2 / n
        )
        scores[brand] = lb
        r = rows[brand]
        assert (r["n"], r["pos"]) == (n, pos)
        assert abs(r["wilson_lb"] - lb) < 1e-12
        # the lower bound is below the raw rate and within [0, 1)
        assert 0.0 <= r["wilson_lb"] < phat
    order = sorted(scores, key=lambda b: (-scores[b], b))
    assert [b for b, _ in sorted(rows.items(), key=lambda kv: kv[1]["rank"])] == order


def test_eb_shrinkage_pulls_toward_prior(spark):
    rows = {r["brand"]: r for r in pipeline59.eb_shrunk_rate_ranking(spark, SF).collect()}
    g = _per_brand()
    a, b = pipeline59._EB_A, pipeline59._EB_B
    prior = a / (a + b)
    for brand, (n, pos) in g.iterrows():
        r = rows[brand]
        shrunk = (pos + a) / (n + a + b)
        assert abs(r["shrunk_rate"] - shrunk) < 1e-15
        raw = pos / n
        # shrinkage moves the estimate strictly toward the prior mean
        assert min(raw, prior) - 1e-12 <= shrunk <= max(raw, prior) + 1e-12
    # ranks are a permutation of 1..n_brands
    assert sorted(r["rank"] for r in rows.values()) == list(range(1, len(rows) + 1))
