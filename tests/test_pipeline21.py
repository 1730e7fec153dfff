"""Semantic tests for pipeline21 (CUSUM changepoint, group-aware split)."""

import hashlib
from collections import Counter

from messikinesisprovider_spark.operators import pipeline21
from messikinesisprovider_spark.operators.relational import events_tbl

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_cusum_changepoint_matches_python(spark):
    evs = [
        (r["event_type"], r["ts"].hour)
        for r in events_tbl(spark, SF).collect()
        if r["ts"] is not None
    ]
    counts = Counter(evs)
    types = {et for et, _ in evs}
    got = {
        r["event_type"]: (r["changepoint_hour"], r["max_abs_cumdev24"], r["n_events"])
        for r in pipeline21.changepoint_cusum_hourly(spark, SF).collect()
    }
    assert set(got) == types
    for et in types:
        xs = [(h, counts[(et, h)]) for h in range(24) if (et, h) in counts]
        total = sum(x for _, x in xs)
        best = None
        cum24, k = 0, 0
        for h, x in xs:  # ascending hour
            cum24 += 24 * x
            k += 1
            dev = cum24 - k * total
            if best is None or (abs(dev), -h) > (best[1], -best[0]):
                best = (h, abs(dev))
        assert got[et] == (best[0], best[1], total)


def test_group_split_has_zero_leakage_and_exact_counts(spark):
    evs = [
        (r["user_id"], r["event_id"])
        for r in events_tbl(spark, SF).collect()
        if r["user_id"] is not None
    ]

    def fold(u):
        m = _h60(str(u)) % 100
        return "train" if m < 80 else ("val" if m < 90 else "test")

    agg = {}
    for u, eid in evs:
        f = fold(u)
        a = agg.setdefault(f, [0, set(), 0])
        a[0] += 1
        a[1].add(u)
        a[2] += eid
    rows = pipeline21.split_group_aware(spark, SF).collect()
    assert {r["fold"] for r in rows} == set(agg)
    for r in rows:
        n, users, chk = agg[r["fold"]]
        assert (r["n_events"], r["n_users"], r["id_checksum"]) == (n, len(users), chk)
        assert r["n_leaky_users"] == 0
    # folds partition the user set: no user appears in two folds
    all_sets = [agg[f][1] for f in agg]
    for i in range(len(all_sets)):
        for j in range(i + 1, len(all_sets)):
            assert not (all_sets[i] & all_sets[j])
