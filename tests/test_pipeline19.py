"""Semantic tests for pipeline19 (seasonal-naive backtest, trigram paths)
against sequential python references."""

from collections import Counter

from messikinesisprovider_spark.operators import pipeline19
from messikinesisprovider_spark.operators.relational import events_tbl

SF = "/root/testdata/sf0.001"


def test_snaive_backtest_matches_python(spark):
    evs = [
        (r["event_type"], r["ts"].hour, r["ts"].date())
        for r in events_tbl(spark, SF).collect()
        if r["ts"] is not None
    ]
    d0 = min(d for _, _, d in evs)
    d1 = max(d for _, _, d in evs)
    n_days = (d1 - d0).days
    hist, actual = Counter(), Counter()
    for et, hr, d in evs:
        if d < d1:
            hist[(et, hr)] += 1
        elif d == d1:
            actual[(et, hr)] += 1
    got = {
        (r["event_type"], r["hr"]): r
        for r in pipeline19.forecast_backtest_snaive(spark, SF).collect()
    }
    assert set(got) == set(hist) | set(actual)
    for key in got:
        r = got[key]
        h, a = hist.get(key, 0), actual.get(key, 0)
        fc = (1000 * h) // n_days
        assert (r["n_hist_days"], r["hist_total"], r["actual"]) == (n_days, h, a)
        assert r["forecast_milli"] == fc
        assert r["err_milli"] == fc - 1000 * a
        assert r["abs_err_milli"] == abs(fc - 1000 * a)


def test_trigram_paths_match_python(spark):
    evs = sorted(
        (
            (r["user_id"], r["ts"], r["event_id"], r["event_type"])
            for r in events_tbl(spark, SF).collect()
            if r["user_id"] is not None and r["ts"] is not None
        ),
        key=lambda t: (t[0], t[1], t[2]),
    )
    seq_by_user = {}
    for u, _, _, et in evs:
        seq_by_user.setdefault(u, []).append(et)
    tri = Counter()
    for s in seq_by_user.values():
        for i in range(2, len(s)):
            tri[(s[i - 2], s[i - 1], s[i])] += 1
    total = sum(tri.values())
    rows = sorted(
        ((t1, t2, t3, n, (1000 * n) // total) for (t1, t2, t3), n in tri.items()),
        key=lambda r: (-r[3], r[0], r[1], r[2]),
    )[: pipeline19._TRIGRAM_TOPK]
    got = [
        (r["t1"], r["t2"], r["t3"], r["n"], r["share_pm"])
        for r in pipeline19.event_trigram_paths(spark, SF).collect()
    ]
    assert got == rows
