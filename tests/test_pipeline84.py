"""Python-reference tests for pipeline84 (iterative graph + relational/ML
prep). The DuckDB oracles prove cross-engine equality; these pin semantics
against independent pure-Python computations."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd

from messikinesisprovider_spark.operators.graphshared import mine_copurchase_edges
from messikinesisprovider_spark.operators.pipeline84 import (
    _ASOF_TOL_S,
    _KFOLDS,
    asof_join_tolerance,
    drawdown_running_max,
    explode_outer_nulls,
    graph_connected_components,
    ml_kfold_stratified,
)

SF = "/root/testdata/sf0.001"


def test_connected_components_match_union_find(spark):
    edges = [(r["a"], r["b"]) for r in mine_copurchase_edges(spark, SF).collect()]
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {v: find(v) for v in parent}
    sizes = defaultdict(int)
    for v in comp:
        sizes[comp[v]] += 1
    rows = graph_connected_components(spark, SF).collect()
    assert len(rows) == len(comp)
    for r in rows:
        assert comp[r["part_id"]] == r["component"]
        assert sizes[r["component"]] == r["component_reach"]
    # labels are canonical minima: every component id is its own label
    assert all(comp[c] == c for c in set(comp.values()))


def test_asof_tolerance_semantics(spark):
    out = asof_join_tolerance(spark, SF).toPandas()
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    ).dropna(subset=["user_id", "ts"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    expect = {}
    last_click: dict[int, pd.Timestamp] = {}
    for r in ev.itertuples():
        if r.event_type == "click":
            last_click[r.user_id] = r.ts
        elif r.event_type == "purchase":
            lc = last_click.get(r.user_id)
            fresh = lc is not None and (r.ts - lc).total_seconds() <= _ASOF_TOL_S
            expect[r.event_id] = (lc if fresh else None, fresh)
    assert len(out) == len(expect)
    for r in out.itertuples():
        lc, fresh = expect[r.event_id]
        assert bool(r.fresh) == fresh
        got = None if pd.isna(r.matched_click_ts) else r.matched_click_ts
        assert got == lc


def test_drawdown_matches_pandas(spark):
    out = {r["o_custkey"]: r for r in drawdown_running_max(spark, SF).collect()}
    o = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"],
    ).dropna(subset=["o_totalprice"])
    o["cents"] = np.round(o["o_totalprice"].to_numpy() * 100).astype("int64")
    o = o.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    for ck, grp in o.groupby("o_custkey"):
        if len(grp) < 3:
            assert ck not in out
            continue
        peak = grp["cents"].cummax()
        r = out[ck]
        assert r["n_orders"] == len(grp)
        assert r["peak_cents"] == int(peak.max())
        assert r["max_drawdown_cents"] == int((peak - grp["cents"]).max())


def test_kfold_partitions_every_doc(spark):
    rows = ml_kfold_stratified(spark, SF).collect()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["lang"]).dropna()
    assert sum(r["n_docs"] for r in rows) == len(docs)
    assert {r["fold"] for r in rows} <= set(range(_KFOLDS))
    per_lang = defaultdict(int)
    for r in rows:
        per_lang[r["lang"]] += r["n_docs"]
    assert per_lang == docs["lang"].value_counts().to_dict()


def test_explode_outer_preserves_every_doc(spark):
    out = explode_outer_nulls(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    # row-preserving: every doc_id appears at least once, docs without long
    # tokens appear exactly once with a NULL token
    assert set(out["doc_id"]) == set(docs["doc_id"])
    empties = out[out["tok"].isna()]
    for did in empties["doc_id"]:
        text = docs.loc[docs["doc_id"] == did, "text"].iloc[0]
        toks = [t for t in (text or "").lower().split(" ") if len(t) >= 8]
        assert toks == []
