"""Python references for pipeline52 (round 4): Mann-Whitney U, Gini,
Herfindahl, Simpson diversity."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd

from messikinesisprovider_spark.operators import pipeline52

SF = "/root/testdata/sf0.001"


def test_mann_whitney_matches_scipy_style_reference(spark):
    row = pipeline52.mann_whitney_u_exact(spark, SF).collect()[0]
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna() & ev["event_type"].isin(["purchase", "click"])]
    a = sorted(ev.loc[ev["event_type"] == "purchase", "value"])
    b = sorted(ev.loc[ev["event_type"] == "click", "value"])
    # U1 = sum over a of (#b strictly below + half of ties); doubled to stay int
    import bisect

    u1_x2 = 0
    for x in a:
        lo = bisect.bisect_left(b, x)
        hi = bisect.bisect_right(b, x)
        u1_x2 += 2 * lo + (hi - lo)
    n1, n2 = len(a), len(b)
    assert row["n1"] == n1 and row["n2"] == n2
    assert row["u1_x2"] == u1_x2
    assert row["u2_x2"] == 2 * n1 * n2 - u1_x2
    # U1 + U2 = n1*n2 identity and the effect size stays in [-1, 1]
    assert row["u1_x2"] + row["u2_x2"] == 2 * n1 * n2
    assert -1.0 <= row["rank_biserial"] <= 1.0


def _gini_reference(values: list[int]) -> tuple[int, int, int]:
    xs = sorted(values)
    n, total = len(xs), sum(xs)
    num = 2 * sum((i + 1) * x for i, x in enumerate(xs)) - (n + 1) * total
    return n, total, num


def test_gini_matches_sorted_rank_formula(spark):
    rows = {r["nation"]: r for r in pipeline52.gini_nation_spend(spark, SF).collect()}
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    # SQL ROUND is half-away-from-zero; pandas .round() is half-to-even
    orders["dollars"] = np.floor(orders["o_totalprice"] + 0.5).astype("int64")
    spend = orders.groupby("o_custkey")["dollars"].sum()
    cust["dollars"] = cust["c_custkey"].map(spend).fillna(0).astype("int64")
    nk_to_name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    for nk, grp in cust.groupby("c_nationkey"):
        n, total, num = _gini_reference(list(grp["dollars"]))
        r = rows[nk_to_name[nk]]
        assert (r["n_customers"], r["total_dollars"], r["gini_num"]) == (n, total, num)
        assert 0.0 <= r["gini"] < 1.0  # non-negative spend => Gini in [0, 1)


def test_herfindahl_bounds_and_reference(spark):
    rows = {r["nation"]: r for r in pipeline52.herfindahl_supplier_share(spark, SF).collect()}
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    sup = pd.read_parquet(f"{SF}/supplier.parquet")
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    li["d"] = np.floor(li["l_extendedprice"] * (1 - li["l_discount"]) + 0.5).astype("int64")
    li = li.merge(sup[["s_suppkey", "s_nationkey"]], left_on="l_suppkey", right_on="s_suppkey")
    rev = li.groupby(["s_nationkey", "l_suppkey"])["d"].sum()
    nk_to_name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    for nk, grp in rev.groupby(level=0):
        r = rows[nk_to_name[nk]]
        assert r["n_suppliers"] == len(grp)
        assert r["total_dollars"] == int(grp.sum())
        assert r["sum_sq"] == int((grp.astype("int64") ** 2).sum())
        # HHI in (1/n, 1]: equality only under a monopoly
        assert 1.0 / len(grp) <= r["hhi"] + 1e-12
        assert r["hhi"] <= 1.0 + 1e-12


def test_simpson_diversity_matches_counter(spark):
    rows = {r["source"]: r for r in pipeline52.simpson_diversity_source(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    by_source: dict[str, Counter] = {}
    for src, text in zip(docs["source"], docs["text"]):
        if text is None:
            continue
        by_source.setdefault(src, Counter()).update(re.findall(r"[a-z]+", text.lower()))
    for src, counts in by_source.items():
        if not counts:
            continue
        n = sum(counts.values())
        num = sum(c * (c - 1) for c in counts.values())
        r = rows[src]
        assert r["n_tokens"] == n
        assert r["distinct_tokens"] == len(counts)
        assert r["simpson_num"] == num
        if n >= 2:
            assert abs(r["simpson_lambda"] - num / (n * (n - 1))) < 1e-15
