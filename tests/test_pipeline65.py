"""Python references for pipeline65 (round 4): LPA modularity and Fano."""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd

from messikinesisprovider_spark.operators import pipeline65

SF = "/root/testdata/sf0.001"


def _graph():
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    baskets = li.groupby("l_orderkey")["l_partkey"].apply(lambda s: sorted(set(s)))
    pairs = Counter()
    for parts in baskets:
        for i, a in enumerate(parts):
            for b in parts[i + 1:]:
                pairs[(a, b)] += 1
    edges = [p for p, c in pairs.items() if c >= 2]
    return edges


def _lpa(edges, rounds):
    adj = defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n in adj:
            cnt = Counter(labels[x] for x in adj[n])
            best = min(cnt, key=lambda l: (-cnt[l], l))
            new[n] = best
        labels = new
    return labels


def test_modularity_matches_networkx_style_replay(spark):
    rows = {r["community"]: r for r in pipeline65.graph_modularity_lpa(spark, SF).collect()}
    edges = _graph()
    labels = _lpa(edges, pipeline65.LPA_ROUNDS)
    m = len(edges)
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    per = {}
    for n, l in labels.items():
        a = per.setdefault(str(l), [0, 0, 0])
        a[0] += 1
        a[1] += deg[n]
    for a, b in edges:
        if labels[a] == labels[b]:
            per[str(labels[a])][2] += 1
    q_total = 0
    for comm, (nm, ds, ei) in per.items():
        r = rows[comm]
        q_term = 4 * m * ei - ds * ds
        assert (r["n_members"], r["degree_sum"], r["e_intra"], r["q_term"]) == (nm, ds, ei, q_term)
        q_total += q_term
    allr = rows["ALL"]
    assert allr["q_term"] == q_total
    # modularity of a sensible community structure is positive and < 1
    q = q_total / (4 * m * m)
    assert 0 < q < 1
    assert len(rows) == len(per) + 1


def test_fano_matches_pandas(spark):
    rows = {r["event_type"]: r for r in pipeline65.fano_burstiness_by_type(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["ts"].notna()].copy()
    ev["m"] = ev["ts"].dt.floor("min")
    for etype, g in ev.groupby("event_type"):
        pm = g.groupby("m").size()
        span = int((pm.index.max() - pm.index.min()).total_seconds() // 60) + 1
        n = int(pm.sum())
        ssq = int((pm**2).sum())
        r = rows[etype]
        assert (r["active_minutes"], r["span_minutes"], r["n_events"]) == (len(pm), span, n)
        assert r["var_num_spanx"] == span * ssq - n * n
        assert abs(r["fano"] - (span * ssq - n * n) / span / n) < 1e-12
        # sparse traffic over a long span is sub-Poisson here: fano < 1 means
        # variance below mean; just pin nonnegativity + scale sanity
        assert r["fano"] >= 0
