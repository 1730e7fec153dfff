"""Semantic tests for pipeline17 (linear attribution, SCD2 incremental
merge) against sequential python references."""

import datetime
from collections import Counter

from messikinesisprovider_spark.operators import pipeline17
from messikinesisprovider_spark.operators.relational import events_tbl

SF = "/root/testdata/sf0.001"


def _us(ts):
    return int(ts.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)


def test_attribution_matches_python(spark):
    evs = [
        (r["user_id"], _us(r["ts"]), r["ts"].hour, r["event_id"], r["event_type"])
        for r in events_tbl(spark, SF).collect()
        if r["user_id"] is not None and r["ts"] is not None
    ]
    purch = [(u, e, pid) for u, e, _, pid, et in evs if et == "purchase"]
    clicks = [(u, e, h, cid) for u, e, h, cid, et in evs if et == "click"]
    touches = []
    for u, tp, pid in purch:
        for cu, tc, h, cid in clicks:
            if cu == u and tc <= tp and tp - tc <= pipeline17._ATTR_WINDOW_US:
                touches.append((pid, cid, h))
    n_touch = Counter(pid for pid, _, _ in touches)
    agg = {}
    for pid, _, h in touches:
        a = agg.setdefault(h, [0, set(), 0, 0])
        a[0] += 1
        a[1].add(pid)
        a[2] += 1000 // n_touch[pid]
        a[3] += 1 if 1000 % n_touch[pid] != 0 else 0
    got = {r["click_hour"]: r for r in pipeline17.attribution_linear(spark, SF).collect()}
    assert set(got) == set(agg)
    for h, (nt, pids, credit, rounded) in agg.items():
        r = got[h]
        assert (r["n_touches"], r["n_conversions"], r["credit_pm"], r["n_rounded"]) == (
            nt, len(pids), credit, rounded,
        )
    # mass conservation: every attributed conversion's credit sums to
    # 1000 - remainder, i.e. total credit <= 1000 * |attributed purchases|
    total_credit = sum(a[2] for a in agg.values())
    attributed = {pid for pid, _, _ in touches}
    assert total_credit <= 1000 * len(attributed)
    assert total_credit >= 1000 * len(attributed) - sum(n_touch.values())


def test_scd2_incremental_equals_full_and_accounts(spark):
    row = pipeline17.scd2_incremental_merge(spark, SF).collect()[0]
    assert row["incremental_equals_full"] is True
    assert row["n_full"] == row["n_inc"] == row["n_match"]
    assert row["n_inc"] == row["n_recomputed"] + row["n_carried"]
    # the batch must touch a strict subset of users for the test to mean
    # anything (otherwise carried == 0 makes the check vacuous)
    assert row["n_affected_users"] > 0
    assert row["n_carried"] > 0
    assert row["n_recomputed"] > 0
