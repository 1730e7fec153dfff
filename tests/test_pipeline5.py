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


# ---------------------------------------------------------------------------
# percentile_bands_hourly
# ---------------------------------------------------------------------------


def test_percentile_bands_match_python_rank_selection(spark, tmp_path):
    t0 = datetime.datetime(2024, 3, 1, 10, 0)
    vals = [5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0, 4.0, 6.0, 10.0]  # one hour, n=10
    rows = [
        (i, t0 + datetime.timedelta(minutes=i), 1, "click", v, "{}")
        for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = pipeline5.percentile_bands_hourly(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    xs = sorted(vals)
    # discrete rank selection: element at ceil(p*n/100)
    assert r["n"] == 10
    assert r["p50"] == xs[(50 * 10 + 99) // 100 - 1]  # 5th element = 5.0
    assert r["p95"] == xs[(95 * 10 + 99) // 100 - 1]  # 10th element = 10.0
    assert r["p99"] == xs[(99 * 10 + 99) // 100 - 1]
    assert r["max_value"] == 10.0


def test_percentile_bands_single_window_pass(spark):
    plan = (
        pipeline5.percentile_bands_hourly(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    # one shuffle total: window partitioning on hour_bucket is reused by the
    # final groupBy (two back-to-back Window nodes — row_number needs an
    # ordered frame, count(*) an unbounded one — share the same exchange)
    assert plan.count("Exchange") == 1
    assert "SinglePartition" not in plan


# ---------------------------------------------------------------------------
# fuzzy_join_lev
# ---------------------------------------------------------------------------


def test_fuzzy_join_matches_naive_all_pairs(spark):
    # The Ed-Join prefix filter has GUARANTEED recall, so the operator's
    # output must equal the full O(n²) truth: every pair with lev <= LEV_MAX
    # among names of qualifying length.
    import itertools

    parts = (
        spark.read.parquet(f"{SF}/part.parquet").select("p_partkey", "p_name").collect()
    )

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    eligible = [r for r in parts if len(r["p_name"]) >= pipeline5.FUZZY_MIN_LEN]
    want = set()
    for x, y in itertools.combinations(sorted(eligible, key=lambda r: r["p_partkey"]), 2):
        if abs(len(x["p_name"]) - len(y["p_name"])) <= pipeline5.LEV_MAX and lev(
            x["p_name"], y["p_name"]
        ) <= pipeline5.LEV_MAX:
            want.add((x["p_partkey"], y["p_partkey"]))

    got = {(r["key_a"], r["key_b"]) for r in pipeline5.fuzzy_join_lev(spark, SF).collect()}
    assert got == want


def test_fuzzy_join_finds_planted_typo(spark, tmp_path):
    rows = [
        (1, "goldenrod lavender spring", "B1", "M1", "T1", 1, "C1", 1.0, "x"),
        (2, "goldenrod lavendar spring", "B1", "M1", "T1", 1, "C1", 1.0, "x"),  # 1 edit
        (3, "completely different name", "B1", "M1", "T1", 1, "C1", 1.0, "x"),
    ]
    spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_mfgr string, p_type string, "
        "p_size int, p_container string, p_retailprice double, p_comment string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")
    got = {(r["key_a"], r["key_b"]): r["lev"] for r in pipeline5.fuzzy_join_lev(spark, str(tmp_path)).collect()}
    assert got == {(1, 2): 1}
