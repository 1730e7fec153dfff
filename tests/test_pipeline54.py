"""Python references for pipeline54 (round 4): revenue recognition, Allen
relations, delta-join IVM."""

from __future__ import annotations

from datetime import date

import numpy as np
import pandas as pd

from messikinesisprovider_spark.operators import pipeline54

SF = "/root/testdata/sf0.001"


def _periods():
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    maxship = li.groupby("l_orderkey")["l_shipdate"].max()
    out = []
    for _, o in orders.iterrows():
        d0 = o["o_orderdate"].date()
        ms = maxship.get(o["o_orderkey"])
        d1 = max(ms.date() if ms is not None and not pd.isna(ms) else d0, d0)
        cents = int(np.floor(o["o_totalprice"] * 100 + 0.5))
        out.append((int(o["o_orderkey"]), cents, d0, d1))
    return out


def _month_seq(d0: date, d1: date):
    m = date(d0.year, d0.month, 1)
    stop = date(d1.year, d1.month, 1)
    while m <= stop:
        yield m
        m = date(m.year + (m.month == 12), m.month % 12 + 1, 1)


def test_revenue_recognition_greedy_replay(spark):
    got = {
        pd.Timestamp(r["month"]): (r["n_orders"], r["recognized_cents"], r["alloc_checksum"])
        for r in pipeline54.revenue_recognition_monthly(spark, SF).collect()
    }
    agg: dict[pd.Timestamp, list[int]] = {}
    for key, cents, d0, d1 in _periods():
        td = (d1 - d0).days + 1
        rows = []
        for m in _month_seq(d0, d1):
            nxt = date(m.year + (m.month == 12), m.month % 12 + 1, 1)
            lo, hi = max(m, d0), min(nxt - pd.Timedelta(days=1).to_pytimedelta(), d1)
            od = (hi - lo).days + 1
            rows.append([m, (cents * od) // td, (cents * od) % td])
        extra = cents - sum(r[1] for r in rows)
        # +1 cent to the largest remainders, month-ascending tiebreak
        for r in sorted(rows, key=lambda r: (-r[2], r[0]))[:extra]:
            r[1] += 1
        assert sum(r[1] for r in rows) == cents  # conservation, per order
        for m, rec, _ in rows:
            a = agg.setdefault(pd.Timestamp(m), [0, 0, 0])
            a[0] += 1
            a[1] += rec
            a[2] += (key * 31 + rec % 97) % pipeline54._CK_MOD
    assert got == {m: tuple(v) for m, v in agg.items()}


def test_allen_relations_matches_brute_force(spark):
    got = {r["relation"]: (r["n_pairs"], r["pair_checksum"]) for r in
           pipeline54.allen_interval_relations(spark, SF).collect()}
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    maxship = li.groupby("l_orderkey")["l_shipdate"].max()
    iv = []
    for _, o in orders.iterrows():
        d0 = o["o_orderdate"].date()
        ms = maxship.get(o["o_orderkey"])
        d1 = max(ms.date() if ms is not None and not pd.isna(ms) else d0, d0)
        iv.append((int(o["o_custkey"]), d0, d1, int(o["o_orderkey"])))
    expect: dict[str, list[int]] = {}
    bycust: dict[int, list] = {}
    for cust, s, e, k in iv:
        bycust.setdefault(cust, []).append((s, e, k))
    for cust, ivs in bycust.items():
        ivs.sort()
        for (s, e, k), (s2, e2, k2) in zip(ivs, ivs[1:]):
            if s < s2:
                rel = ("precedes" if e < s2 else "meets" if e == s2 else
                       "overlaps" if e < e2 else "finished_by" if e == e2 else "contains")
            else:
                rel = "starts" if e < e2 else "equals"
            a = expect.setdefault(rel, [0, 0])
            a[0] += 1
            a[1] += (k * 31 + k2) % pipeline54._CK_MOD
    assert got == {rel: tuple(v) for rel, v in expect.items()}


def test_ivm_join_terms_reconstruct_rebuild(spark):
    rows = {r["term"]: r for r in pipeline54.ivm_join_delta_view(spark, SF).collect()}
    terms = [rows[t] for t in ("base_base", "base_deltaB", "deltaA_base", "deltaA_deltaB")]
    rb = rows["rebuild"]
    assert sum(t["n_rows"] for t in terms) == rb["n_rows"]
    assert sum(t["revenue_cents"] for t in terms) == rb["revenue_cents"]
    assert sum(t["key_checksum"] for t in terms) == rb["key_checksum"]
    # the split is non-vacuous: both base and delta sides carry rows
    assert rows["base_base"]["n_rows"] > 0
    assert rows["deltaA_deltaB"]["n_rows"] > 0
