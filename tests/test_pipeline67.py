"""Python references for pipeline67 (round 4): hint join and Heaps curve."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from messikinesisprovider_spark.operators import pipeline67

SF = "/root/testdata/sf0.001"


def test_hint_join_matches_pandas(spark):
    rows = {r["priority"]: r for r in pipeline67.join_shuffle_hash_hint(spark, SF).collect()}
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = orders[orders["o_orderdate"] >= pd.Timestamp("1997-01-01")]
    j = li.merge(orders[["o_orderkey", "o_orderpriority"]], left_on="l_orderkey", right_on="o_orderkey")
    j["cents"] = np.floor(j["l_extendedprice"] * (1 - j["l_discount"]) * 100 + 0.5).astype("int64")
    for prio, g in j.groupby("o_orderpriority"):
        r = rows[prio]
        assert (r["n_items"], r["revenue_cents"]) == (len(g), int(g["cents"].sum()))
    assert len(rows) == j["o_orderpriority"].nunique()


def test_heaps_curve_matches_replay(spark):
    got = {(r["source"], r["stage"]): r for r in pipeline67.heaps_law_curve(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs["text"].notna()].sort_values("doc_id")
    k = pipeline67._STAGES
    for source, grp in docs.groupby("source"):
        grp = grp.sort_values("doc_id").reset_index(drop=True)
        n = len(grp)
        base, rem = divmod(n, k)
        sizes = [base + 1 if i < rem else base for i in range(k)]
        stages = np.repeat(np.arange(1, k + 1), sizes)
        seen: set[str] = set()
        cum_occ = 0
        per = {}
        for stage in range(1, k + 1):
            texts = grp.loc[stages[: len(grp)] == stage, "text"]
            for t in texts:
                ws = re.findall(r"[a-z]+", t.lower())
                sh = [" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)]
                cum_occ += len(sh)
                seen.update(sh)
            per[stage] = (cum_occ, len(seen))
        for stage, (occ, dist) in per.items():
            r = got[(source, stage)]
            assert (r["cum_occurrences"], r["cum_distinct"]) == (occ, dist)
            if occ:
                assert abs(r["novelty_ratio"] - dist / occ) < 1e-15
        # cumulative distinct and occurrences are nondecreasing (a novelty
        # RATIO can legitimately tick up when a stage is unusually fresh)
        ds = [per[s][1] for s in range(1, k + 1)]
        occs = [per[s][0] for s in range(1, k + 1)]
        assert ds == sorted(ds) and occs == sorted(occs)
        # and the curve ends sublinear: final distinct < final occurrences
        assert ds[-1] < occs[-1]
