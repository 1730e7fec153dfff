"""Python references for pipeline56 (round 4): pipe syntax, fairness
parity, blocking quality."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pandas as pd

from messikinesisprovider_spark.operators import pipeline56

SF = "/root/testdata/sf0.001"


def test_pipe_syntax_matches_classic_dataframe(spark):
    got = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in pipeline56.sql_pipe_syntax_report(spark, SF).collect()
    }
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li = li[li["l_shipdate"] >= pd.Timestamp("1996-01-01")]
    for (rf, ls), grp in li.groupby(["l_returnflag", "l_linestatus"]):
        r = got[(rf, ls)]
        assert r["n_rows"] == len(grp)
        assert abs(r["sum_qty"] - grp["l_quantity"].sum()) < 1e-6
    assert len(got) == li.groupby(["l_returnflag", "l_linestatus"]).ngroups


def test_fairness_parity_four_fifths_rule(spark):
    rows = {r["segment"]: r for r in pipeline56.fairness_parity_audit(spark, SF).collect()}
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    f_cust = set(orders.loc[orders["o_orderstatus"] == "F", "o_custkey"])
    cust["pos"] = cust["c_custkey"].isin(f_cust).astype(int)
    per = cust.groupby("c_mktsegment")["pos"].agg(["size", "sum"])
    g_n, g_pos = len(cust), int(cust["pos"].sum())
    for seg, (n, n_pos) in per.iterrows():
        r = rows[seg]
        assert (r["n"], r["n_pos"]) == (n, n_pos)
        ratio = (n_pos * g_n) / (n * g_pos)
        assert abs(r["parity_ratio"] - ratio) < 1e-12
        assert r["flagged"] == (5 * n_pos * g_n < 4 * n * g_pos or 4 * n_pos * g_n > 5 * n * g_pos)


def test_blocking_metrics_match_counter_arithmetic(spark):
    r = pipeline56.blocking_quality_metrics(spark, SF).collect()[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs["text"].notna()]
    blocks = Counter()
    fps = Counter()
    both = Counter()
    for text in docs["text"]:
        lt = text.lower()
        block = lt[:16]
        fp = hashlib.md5("|".join(sorted(set(re.findall(r"[a-z]+", lt)))).encode()).hexdigest()
        blocks[block] += 1
        fps[fp] += 1
        both[(block, fp)] += 1

    def pairs(c: Counter) -> int:
        return sum(v * (v - 1) // 2 for v in c.values())

    n = len(docs)
    assert r["n"] == n
    assert r["cand_pairs"] == pairs(blocks)
    assert r["truth_pairs"] == pairs(fps)
    assert r["hit_pairs"] == pairs(both)
    assert abs(r["reduction_ratio"] - (1 - pairs(blocks) / (n * (n - 1) // 2))) < 1e-12
    assert abs(r["pair_completeness"] - pairs(both) / pairs(fps)) < 1e-12
    # the audit is non-vacuous on the stock corpus: bag-of-words dups exist
    # and prefix blocking misses most of them
    assert r["truth_pairs"] > 0
    assert r["hit_pairs"] < r["truth_pairs"]
