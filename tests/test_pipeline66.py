"""Python references for pipeline66 (round 4): consistent hashing and
churn labels."""

from __future__ import annotations

import hashlib

import pandas as pd

from messikinesisprovider_spark.operators import pipeline66

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _owner(ring, hv):
    for pos, node in ring:
        if hv <= pos:
            return node
    return ring[0][1]


def test_ring_minimal_disruption(spark):
    rows = {r["node"]: r for r in pipeline66.consistent_hash_ring_plan(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    ring = pipeline66._ring()
    ring2 = pipeline66._ring_without(pipeline66._DEPARTING)
    expect = {}
    for doc_id in docs["doc_id"]:
        hv = _h60(str(doc_id))
        own, own2 = _owner(ring, hv), _owner(ring2, hv)
        a = expect.setdefault(own, [0, 0])
        a[0] += 1
        a[1] += own != own2
    assert {k: tuple(v) for k, v in expect.items()} == {
        k: (r["n_docs"], r["n_moved"]) for k, r in rows.items()
    }
    # THE consistent-hashing property: only the departed node's docs move
    for node, r in rows.items():
        if node == pipeline66._DEPARTING:
            assert r["n_moved"] == r["n_docs"] > 0
        else:
            assert r["n_moved"] == 0
    # placement is reasonably balanced (virtual nodes doing their job):
    # no node owns more than 3x the fair share
    total = sum(r["n_docs"] for r in rows.values())
    assert max(r["n_docs"] for r in rows.values()) <= 3 * total / len(pipeline66._NODES)


def test_churn_labels_match_pandas(spark):
    rows = {pd.Timestamp(r["day"]): r for r in
            pipeline66.churn_label_daily(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["user_id"].notna() & ev["ts"].notna()].copy()
    ev["day"] = ev["ts"].dt.floor("D")
    um = ev[["user_id", "day"]].drop_duplicates()
    last_day = um["day"].max()
    expect = {}
    for day, grp in um.groupby("day"):
        users = set(grp["user_id"])
        nxt = set(um.loc[um["day"] == day + pd.Timedelta(days=1), "user_id"])
        if day == last_day:
            expect[day] = (len(users), 0, 0, None)
        else:
            churned = len(users - nxt)
            expect[day] = (len(users), len(users), churned, churned / len(users))
    assert set(rows) == set(expect)
    for day, (na, nl, nc, rate) in expect.items():
        r = rows[day]
        assert (r["n_active"], r["n_labeled"], r["n_churned"]) == (na, nl, nc)
        if rate is None:
            assert r["churn_rate"] is None
        else:
            assert abs(r["churn_rate"] - rate) < 1e-15
    # non-vacuous: at least one labeled week has real churn
    assert any(v[2] > 0 for v in expect.values())
