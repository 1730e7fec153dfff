"""Python references for pipeline53 (round 4): prefix-filter set-similarity
join and bitmap distinct rollup."""

from __future__ import annotations

import re
from itertools import combinations

import pandas as pd

from messikinesisprovider_spark.operators import pipeline53

SF = "/root/testdata/sf0.001"


def _shingle_sets() -> dict[int, frozenset[str]]:
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    out = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        if text is None:
            continue
        ws = re.findall(r"[a-z]+", text.lower())
        out[doc_id] = frozenset(
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        )
    return out


def test_setsim_matches_brute_force_top1(spark):
    """The prefix filter must be LOSSLESS: results equal the O(n^2) scan."""
    got = {r["doc_id"]: r for r in pipeline53.setsim_prefix_filter_join(spark, SF).collect()}
    sets = _shingle_sets()
    t_num, t_den = pipeline53._T_NUM, pipeline53._T_DEN
    matches: dict[int, list[tuple]] = {}
    for a, b in combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        union = len(sa | sb)
        if t_den * inter >= t_num * union:
            matches.setdefault(a, []).append((inter, union, b))
            matches.setdefault(b, []).append((inter, union, a))
    assert set(got) == set(matches)
    for doc_id, cands in matches.items():
        # same ordering as the query: jaccard desc, inter desc, partner asc
        best = min(cands, key=lambda c: (-(c[0] / c[1]), -c[0], c[2]))
        r = got[doc_id]
        assert (r["inter"], r["union_sz"], r["best_match"]) == best
        assert r["n_matches"] == len(cands)
        assert abs(r["jaccard"] - best[0] / best[1]) < 1e-15
    # non-vacuous on the stock corpus
    assert len(matches) > 0


def test_setsim_prefix_length_rule():
    """ceil(t*sz) via integers: prefix keeps sz - ceil(t*sz) + 1 tokens."""
    t_num, t_den = pipeline53._T_NUM, pipeline53._T_DEN
    for sz in range(1, 200):
        p = sz - (t_num * sz + t_den - 1) // t_den + 1
        # pigeonhole: two sets of size sz sharing NO prefix token overlap in
        # at most (sz - p) rarest tokens each; jaccard is then < t
        assert 1 <= p <= sz
        max_inter = sz - p
        # jaccard bound when prefixes are disjoint (equal sizes, worst case)
        assert t_den * max_inter < t_num * (2 * sz - max_inter) or sz == 0


def test_bitmap_rollup_matches_pandas(spark):
    rows = {pd.Timestamp(r["week"]): r for r in pipeline53.bitmap_distinct_rollup(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["user_id"].notna() & ev["ts"].notna()].copy()
    ev["day"] = ev["ts"].dt.floor("D")
    ev["week"] = ev["ts"].dt.to_period("W-SUN").dt.start_time  # Monday start
    for week, grp in ev.groupby("week"):
        r = rows[pd.Timestamp(week)]
        assert r["weekly_distinct"] == grp["user_id"].nunique()
        daily = grp.groupby("day")["user_id"].nunique()
        assert r["n_days"] == len(daily)
        assert r["user_days"] == int(daily.sum())
        # merge property: weekly distinct <= sum of daily distincts
        assert r["weekly_distinct"] <= r["user_days"]
    assert set(rows) == set(pd.Timestamp(w) for w in ev["week"].unique())
