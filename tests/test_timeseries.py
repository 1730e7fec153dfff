"""Semantic tests for the time-series operators (operators/timeseries.py)."""

import math

import numpy as np
from pyspark.sql import functions as F

from messikinesisprovider_spark.operators import timeseries
from messikinesisprovider_spark.operators.relational import events_tbl

SF = "/root/testdata/sf0.001"


def test_gap_fill_dense_and_interpolated(spark):
    rows = timeseries.gap_fill_interpolate(spark, SF).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["event_type"], []).append(r)
    for et, rs in by_key.items():
        rs.sort(key=lambda r: r["hour"])
        # dense hourly spine: consecutive rows exactly one hour apart
        for a, b in zip(rs, rs[1:]):
            assert (b["hour"] - a["hour"]).total_seconds() == 3600
        # endpoints observed, every value filled
        assert not rs[0]["was_gap"] and not rs[-1]["was_gap"]
        assert all(r["v_filled"] is not None for r in rs)
        # each gap value lies on the segment between its observed neighbors
        for i, r in enumerate(rs):
            if not r["was_gap"]:
                continue
            j = i - 1
            while rs[j]["was_gap"]:
                j -= 1
            k = i + 1
            while rs[k]["was_gap"]:
                k += 1
            pv, nv = rs[j]["v_filled"], rs[k]["v_filled"]
            frac = (i - j) / (k - j)
            assert math.isclose(r["v_filled"], pv + (nv - pv) * frac, rel_tol=1e-9)


def test_rolling_zscore_matches_numpy(spark):
    got = {
        r["event_id"]: r for r in timeseries.rolling_zscore_anomaly(spark, SF).collect()
    }
    ev = (
        events_tbl(spark, SF)
        .select("event_id", "event_type", "ts", "value")
        .collect()
    )
    by_key = {}
    for r in ev:
        by_key.setdefault(r["event_type"], []).append(r)
    expected = {}
    w = timeseries.ZSCORE_WINDOW
    for et, rs in by_key.items():
        rs.sort(key=lambda r: (r["ts"], r["event_id"]))
        vals = np.array([r["value"] for r in rs])
        for i in range(w - 1, len(rs)):
            frame = vals[i - w + 1 : i + 1]
            mean, sd = frame.mean(), frame.std()  # population std, like E[x^2]-E[x]^2
            if sd > 0:
                z = (vals[i] - mean) / sd
                if abs(z) > timeseries.ZSCORE_THRESHOLD:
                    expected[rs[i]["event_id"]] = z
    assert set(got) == set(expected)
    for eid, z in expected.items():
        assert math.isclose(got[eid]["z"], z, rel_tol=1e-6)
