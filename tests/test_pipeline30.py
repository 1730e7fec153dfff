"""Python references for pipeline30 (round 4): rolling WAU, zone-map
skipping audit, seasonal-residual anomalies."""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta

import pandas as pd

from messikinesisprovider_spark.operators import pipeline30

SF = "/root/testdata/sf0.001"


def _events():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["ts"] = pd.to_datetime(ev["ts"])
    return ev


def test_rolling_active_users_matches_pandas(spark):
    got = {
        pd.Timestamp(r["day"]): r["active_users_7d"]
        for r in pipeline30.rolling_active_users(spark, SF).collect()
    }
    ev = _events()
    ev = ev[ev["ts"].notna() & ev["user_id"].notna()]
    ud = {(u, d) for u, d in zip(ev["user_id"], ev["ts"].dt.date)}
    days = sorted({d for _, d in ud})
    expect = {}
    for anchor in days:
        lo = anchor - timedelta(days=pipeline30._RAU_WINDOW - 1)
        expect[pd.Timestamp(anchor)] = len({u for u, d in ud if lo <= d <= anchor})
    assert got == expect
    # rolling-7 must dominate the daily distinct count
    daily = defaultdict(set)
    for u, d in ud:
        daily[d].add(u)
    for d in days:
        assert got[pd.Timestamp(d)] >= len(daily[d])


def test_data_skipping_audit_matches_pandas(spark):
    rows = {r["threshold"]: r for r in pipeline30.data_skipping_minmax_audit(spark, SF).collect()}
    ev = _events()
    ev = ev[ev["ts"].notna() & ev["value"].notna()]
    zones = ev.groupby(ev["ts"].dt.date)["value"].agg(["max", "count"])
    assert sorted(rows) == [i * 10 for i in range(1, 10)]
    for q, r in rows.items():
        skippable = zones[zones["max"] <= q]
        assert r["n_zones"] == len(zones)
        assert r["n_skippable"] == len(skippable)
        assert r["rows_skipped"] == int(skippable["count"].sum())
    # skip fraction is monotone in the threshold
    sk = [rows[t]["n_skippable"] for t in sorted(rows)]
    assert sk == sorted(sk)


def test_seasonal_residual_counts_match_pandas(spark):
    got = {
        r["event_type"]: (r["n_events"], r["n_anomalies"])
        for r in pipeline30.anomaly_seasonal_residual(spark, SF).collect()
    }
    ev = _events()
    ev = ev[ev["ts"].notna() & ev["value"].notna()].copy()
    # replicate the engine's decimal(18,6) quantization of v
    ev["v"] = (ev["value"] * 1e6).round().astype("int64") / 1e6
    ev["hod"] = ev["ts"].dt.hour
    out = {}
    for t, g in ev.groupby("event_type"):
        season = g.groupby("hod")["v"].mean()
        mean = g["v"].mean()
        sd = ((g["v"] ** 2).mean() - mean * mean) ** 0.5
        resid = (g["v"] - g["hod"].map(season)).abs()
        out[t] = (len(g), int((resid > 3 * sd).sum()))
    for t, (n, na) in out.items():
        assert got[t][0] == n
        # float-replay tolerance: pandas means differ from the engines'
        # decimal-exact means at ulp level, so allow the count to move by
        # at most a hair's width of the distribution
        assert abs(got[t][1] - na) <= max(2, n // 1000), (t, got[t], (n, na))
    # anomalies exist somewhere or the fixture can't exercise the flag
    assert any(v[1] > 0 for v in got.values())
