"""Semantic tests for the event-analytics operators (operators/analytics.py).

The parity harness checks cross-engine value equality; these pin the
funnel/retention semantics against a straightforward pandas recomputation.
"""

from collections import defaultdict

import pandas as pd

from messikinesisprovider_spark.operators import analytics
from messikinesisprovider_spark.operators.relational import events_tbl

SF = "/root/testdata/sf0.001"


def _events(spark):
    return events_tbl(spark, SF).select("user_id", "event_type", "ts").toPandas()


def test_funnel_counts_match_pandas_reference(spark):
    got = {r["stage"]: r["n_users"] for r in analytics.funnel_conversion(spark, SF).collect()}
    ev = _events(spark)
    deadline = pd.Timedelta(days=analytics._FUNNEL_DAYS)
    n1 = n2 = n3 = 0
    for _, g in ev.groupby("user_id"):
        clicks = g.loc[g.event_type == "click", "ts"]
        if clicks.empty:
            continue
        n1 += 1
        t1 = clicks.min()
        views = g.loc[
            (g.event_type == "view") & (g.ts >= t1) & (g.ts <= t1 + deadline), "ts"
        ]
        if views.empty:
            continue
        n2 += 1
        t2 = views.min()
        buys = g.loc[
            (g.event_type == "purchase") & (g.ts >= t2) & (g.ts <= t1 + deadline), "ts"
        ]
        if not buys.empty:
            n3 += 1
    assert got == {1: n1, 2: n2, 3: n3}
    assert n1 >= n2 >= n3  # funnel monotonicity
    assert n1 > 0


def test_cohort_retention_matches_pandas_reference(spark):
    rows = analytics.cohort_retention(spark, SF).collect()
    got = {
        (r["cohort_week"], r["week_offset"]): (r["n_active_users"], r["n_cohort_users"])
        for r in rows
    }
    ev = _events(spark)
    week = lambda t: (t - pd.Timedelta(days=t.weekday())).normalize()
    first = ev.groupby("user_id")["ts"].min().map(week)
    sizes = first.value_counts()
    active = defaultdict(set)
    for _, r in ev.iterrows():
        cw = first[r.user_id]
        off = (week(r.ts) - cw).days // 7
        active[(cw, off)].add(r.user_id)
    want = {
        (pd.Timestamp(cw).to_pydatetime(), off): (len(users), int(sizes[cw]))
        for (cw, off), users in active.items()
    }
    assert got == want
    # offset 0 always contains the full cohort (first event is in-week)
    for (cw, off), (n_active, n_cohort) in got.items():
        if off == 0:
            assert n_active == n_cohort
        assert n_active <= n_cohort
