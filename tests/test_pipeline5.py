"""Semantic tests for the round-3e operators (pipeline5.py).

Parity proves cross-engine equality; these pin semantics against python
references (a from-scratch Count-Min sketch, a sequential median/MAD fold,
an O(n²) dominance check) and the scale-relevant plan shapes.
"""

import datetime
import hashlib

import pytest
from pyspark.sql import functions as F

from messikinesisprovider_spark.operators import pipeline5

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# sketch_countmin_topk
# ---------------------------------------------------------------------------


def test_cms_never_underestimates_on_real_data(spark):
    rows = pipeline5.sketch_countmin_topk(spark, SF).collect()
    assert 0 < len(rows) <= pipeline5.CMS_TOPK
    for r in rows:
        assert r["no_underestimate"] is True
        assert r["est_c"] >= r["exact_c"]
        assert r["overshoot"] == r["est_c"] - r["exact_c"]


def test_cms_matches_python_reference_sketch(spark, tmp_path):
    texts = {
        1: "a a a b b c",
        2: "a b c d d d d",
        3: "e f a",
    }
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    # reference CMS built token-occurrence at a time
    counters = [[0] * pipeline5.CMS_WIDTH for _ in range(pipeline5.CMS_ROWS)]
    exact = {}
    for t in texts.values():
        for w in t.lower().split(" "):
            if not w:
                continue
            exact[w] = exact.get(w, 0) + 1
            for r in range(pipeline5.CMS_ROWS):
                counters[r][_h60(f"{r}|{w}") % pipeline5.CMS_WIDTH] += 1

    def ref_est(w):
        return min(
            counters[r][_h60(f"{r}|{w}") % pipeline5.CMS_WIDTH]
            for r in range(pipeline5.CMS_ROWS)
        )

    got = {r["token"]: r for r in pipeline5.sketch_countmin_topk(spark, str(tmp_path)).collect()}
    want_topk = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[: pipeline5.CMS_TOPK]
    assert set(got) == {w for w, _ in want_topk}
    for w, c in want_topk:
        assert got[w]["exact_c"] == c
        assert got[w]["est_c"] == ref_est(w)


# ---------------------------------------------------------------------------
# anomaly_mad_flags
# ---------------------------------------------------------------------------


def test_mad_matches_python_reference(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1)
    series = {
        "click": [1.0, 2.0, 3.0, 4.0, 100.0],       # odd n, one outlier
        "view": [10.0, 10.0, 11.0, 12.0, 12.0, 500.0],  # even n
        "buy": [5.0, None, 7.0],                     # NULL value dropped
    }
    rows, eid = [], 0
    for et, vals in series.items():
        for v in vals:
            rows.append((eid, t0 + datetime.timedelta(minutes=eid), 1, et, v, "{}"))
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    def lower_median(xs):
        xs = sorted(xs)
        return xs[(len(xs) + 1) // 2 - 1]

    got = {r["event_type"]: r for r in pipeline5.anomaly_mad_flags(spark, str(tmp_path)).collect()}
    for et, vals in series.items():
        xs = [v for v in vals if v is not None]
        med = lower_median(xs)
        mad = lower_median([abs(v - med) for v in xs])
        n_anom = sum(
            1 for v in xs if abs(v - med) > pipeline5.MAD_SIGMA * pipeline5.MAD_CONSISTENCY * mad
        )
        assert got[et]["n"] == len(xs)
        assert got[et]["med"] == med
        assert got[et]["mad"] == mad
        assert got[et]["n_anomalies"] == n_anom
    # the planted outliers are flagged
    assert got["click"]["n_anomalies"] == 1
    assert got["view"]["n_anomalies"] == 1


# ---------------------------------------------------------------------------
# skyline_pareto
# ---------------------------------------------------------------------------


def test_skyline_matches_naive_dominance(spark):
    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .collect()
    )
    pts = {}
    for r in orders:
        k = (r["o_totalprice"], r["o_orderdate"])
        keeper, n = pts.get(k, (None, 0))
        pts[k] = (r["o_orderkey"] if keeper is None else min(keeper, r["o_orderkey"]), n + 1)
    skyline = set()
    keys = list(pts)
    for p in keys:
        dominated = any(
            q != p and q[0] <= p[0] and q[1] <= p[1] for q in keys
        )
        if not dominated:
            skyline.add(p)

    got = pipeline5.skyline_pareto(spark, SF).collect()
    assert {(r["price"], r["odate"]) for r in got} == skyline
    for r in got:
        keeper, n = pts[(r["price"], r["odate"])]
        assert r["keeper_orderkey"] == keeper and r["n_dups"] == n


def test_skyline_no_single_partition_stage(spark):
    plan = (
        pipeline5.skyline_pareto(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan
    assert "rangepartitioning" in plan.lower()
