"""Semantic test for the user growth curve against a python reference."""

from collections import Counter

from messikinesisprovider_spark.operators import pipeline26
from messikinesisprovider_spark.operators.relational import events_tbl

SF = "/root/testdata/sf0.001"


def test_growth_curve_matches_python(spark):
    evs = [
        (r["user_id"], r["ts"].date())
        for r in events_tbl(spark, SF).collect()
        if r["user_id"] is not None and r["ts"] is not None
    ]
    by_day = {}
    first = {}
    for u, d in evs:
        by_day.setdefault(d, set()).add(u)
        if u not in first or d < first[u]:
            first[u] = d
    new_per_day = Counter(first.values())
    days = sorted(by_day)
    got = {r["day"].date(): r for r in pipeline26.user_growth_curve(spark, SF).collect()}
    assert set(got) == set(days)
    cum = 0
    for d in days:
        cum += new_per_day.get(d, 0)
        r = got[d]
        assert r["n_active"] == len(by_day[d])
        assert r["n_new"] == new_per_day.get(d, 0)
        assert r["n_cum"] == cum
    # the curve ends at the total distinct-user count and is monotone
    assert cum == len(first)
    curve = [got[d]["n_cum"] for d in days]
    assert curve == sorted(curve)
