"""Python references for pipeline46 (round 4): OHLC bars, TWAP, and the
zero-floored running balance (Lindley recursion)."""

from __future__ import annotations

import pandas as pd

from messikinesisprovider_spark.operators import pipeline46

SF = "/root/testdata/sf0.001"


def _events():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["ts"] = pd.to_datetime(ev["ts"])
    return ev


def test_ohlc_matches_pandas(spark):
    rows = {pd.Timestamp(r["day"]): r for r in pipeline46.ohlc_candlestick_daily(spark, SF).collect()}
    ev = _events()
    ev = ev[ev["value"].notna()]
    for day, grp in ev.groupby(ev["ts"].dt.normalize()):
        g = grp.sort_values(["ts", "event_id"])
        r = rows[pd.Timestamp(day)]
        assert r["open"] == g["value"].iloc[0]
        assert r["close"] == g["value"].iloc[-1]
        assert r["high"] == g["value"].max()
        assert r["low"] == g["value"].min()
        assert r["n_events"] == len(g)
        assert abs(r["volume"] - g["value"].sum()) < 1e-6
    assert len(rows) == ev["ts"].dt.normalize().nunique()


def test_twap_matches_python(spark):
    got = {r["user_id"]: r for r in pipeline46.twap_time_weighted_value(spark, SF).collect()}
    ev = _events()
    ev = ev[ev["value"].notna() & ev["user_id"].notna()]
    for uid, grp in ev.groupby("user_id"):
        g = grp.sort_values(["ts", "event_id"])
        cents = [round(v * 100) for v in g["value"]]
        us = [t.value // 1000 for t in g["ts"]]  # pandas ns -> us
        dts = [(us[i + 1] - us[i]) // 1000 for i in range(len(us) - 1)]
        if not dts or sum(dts) == 0:
            assert uid not in got
            continue
        r = got[uid]
        assert r["n_intervals"] == len(dts)
        assert r["span_ms"] == sum(dts)
        expect = sum(c * d for c, d in zip(cents, dts)) / sum(dts) / 100
        assert abs(r["twap"] - expect) < 1e-9
    # weighting is non-vacuous: twap differs from the plain mean somewhere
    plain = ev.groupby("user_id")["value"].mean()
    assert any(abs(got[u]["twap"] - plain[u]) > 1e-6 for u in got)


def test_running_balance_matches_literal_lindley_fold(spark):
    got = {r["user_id"]: r for r in pipeline46.running_balance_floor(spark, SF).collect()}
    ev = _events()
    ev = ev[ev["value"].notna() & ev["user_id"].notna()]
    floored_anywhere = False
    for uid, grp in ev.groupby("user_id"):
        g = grp.sort_values(["ts", "event_id"])
        bal, peak = 0.0, 0.0
        for _, row in g.iterrows():
            sign = 1 if row["event_type"] in ("purchase", "signup") else -1
            nxt = bal + sign * round(row["value"] * 1e6) / 1e6
            if nxt < 0:
                floored_anywhere = True
            bal = max(0.0, nxt)
            peak = max(peak, bal)
        r = got[uid]
        assert r["n_events"] == len(g)
        assert abs(r["final_balance"] - bal) < 1e-6, uid
        assert abs(r["peak_balance"] - peak) < 1e-6, uid
    # the clamp actually fired (otherwise this is just a prefix sum)
    assert floored_anywhere
