"""Python references for pipeline61 (round 4): two-level tree and
successive halving."""

from __future__ import annotations

import hashlib

import pandas as pd

from messikinesisprovider_spark.operators import pipeline61

SF = "/root/testdata/sf0.001"


def _purity(n_l, p_l, n_r, p_r):
    left = 0.0 if n_l == 0 else (p_l * p_l + (n_l - p_l) * (n_l - p_l)) / n_l
    right = 0.0 if n_r == 0 else (p_r * p_r + (n_r - p_r) * (n_r - p_r)) / n_r
    return left + right


def _best_split(rows):
    """rows: list of (value, y) -> (threshold, hist..., purity)."""
    best = None
    for t in pipeline61._T2_THRESHOLDS:
        n_l = sum(1 for v, _ in rows if v < t)
        p_l = sum(1 for v, y in rows if v < t and y)
        n_r = len(rows) - n_l
        p_r = sum(y for _, y in rows) - p_l
        pur = _purity(n_l, p_l, n_r, p_r)
        key = (-pur, t)
        if best is None or key < best[0]:
            best = (key, (t, n_l, p_l, n_r, p_r, pur))
    return best[1]


def test_two_level_tree_matches_greedy_replay(spark):
    got = {r["node"]: r for r in pipeline61.tree_split_two_level(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()]
    rows = [(v, int(t == "purchase")) for v, t in zip(ev["value"], ev["event_type"])]
    t0, n_l, p_l, n_r, p_r, pur = _best_split(rows)
    r = got["root"]
    assert (r["threshold"], r["n_left"], r["pos_left"], r["n_right"], r["pos_right"]) == (
        t0, n_l, p_l, n_r, p_r,
    )
    assert abs(r["purity"] - pur) < 1e-9
    for node, sub in (("left", [x for x in rows if x[0] < t0]),
                      ("right", [x for x in rows if x[0] >= t0])):
        t, n_l, p_l, n_r, p_r, pur = _best_split(sub)
        g = got[node]
        assert (g["threshold"], g["n_left"], g["pos_left"], g["n_right"], g["pos_right"]) == (
            t, n_l, p_l, n_r, p_r,
        )
        assert abs(g["purity"] - pur) < 1e-9
    assert len(got) == 3


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_successive_halving_matches_replay(spark):
    out = pipeline61.successive_halving_eval(spark, SF).collect()
    got = {(r["round"], r["threshold"]): r for r in out}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs["text"].notna()].copy()
    docs["h"] = docs["doc_id"].map(lambda i: _h60(f"sh|{i}"))
    configs = sorted(pipeline61._SH_CONFIGS)
    expect = {}
    for rnd, mod, keep in pipeline61._SH_ROUNDS:
        d = docs if mod == 1 else docs[docs["h"] % mod == 0]
        evals = []
        for t in configs:
            n, kept = len(d), int((d["n_chars"] >= t).sum())
            pm = kept * 1000 // max(n, 1)
            evals.append((abs(pm - 500), t, n, kept, pm))
        evals.sort()
        surv = {t for _, t, _, _, _ in evals[:keep]}
        for dist, t, n, kept, pm in evals:
            expect[(rnd, t)] = (n, kept, pm, t in surv)
        configs = sorted(surv)
    assert set(got) == set(expect)
    for key, (n, kept, pm, surv) in expect.items():
        r = got[key]
        assert (r["n_docs"], r["kept"], r["kept_permille"], r["survived"]) == (n, kept, pm, surv)
    # the tournament narrows: 8 + 4 + 2 evaluations
    assert len(out) == 14
