"""Python-reference tests for pipeline98 (Kaplan-Meier, Theil-Sen,
Mann-Kendall)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from messikinesisprovider_spark.operators.pipeline98 import (
    _TS_K,
    mann_kendall_trend,
    robust_theil_sen_slope,
    survival_kaplan_meier,
)

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# --------------------------------------------------------------------------
# survival_kaplan_meier
# --------------------------------------------------------------------------


def _py_km() -> pd.DataFrame:
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    first_ship = li.groupby("l_orderkey")["l_shipdate"].min()
    base = orders.set_index("o_orderkey")
    base["dur"] = (
        first_ship.dt.normalize() - base["o_orderdate"].dt.normalize()
    ).dt.days
    base = base.dropna(subset=["dur"])
    base["obs"] = (base["o_orderstatus"] == "F").astype(int)
    rows = []
    for prio, g in base.groupby("o_orderpriority"):
        counts = (
            g.groupby("dur")
            .agg(d=("obs", "sum"), c=("obs", "size"))
            .sort_index()
        )
        total = counts["c"].sum()
        surv = 1.0
        seen = 0
        for dur, row in counts.iterrows():
            n_risk = total - seen
            seen += row["c"]
            if row["d"] >= 1:
                surv = surv * (1.0 - row["d"] / float(n_risk))
                rows.append((prio, int(dur), int(row["d"]), int(n_risk), surv))
    return pd.DataFrame(
        rows, columns=["priority", "dur_days", "d_events", "n_risk", "survival"]
    )


def test_km_matches_python_reference(spark):
    got = (
        survival_kaplan_meier(spark, SF)
        .toPandas()
        .sort_values(["priority", "dur_days"])
        .reset_index(drop=True)
    )
    exp = _py_km().sort_values(["priority", "dur_days"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["priority"] == exp["priority"]).all()
    assert (got["dur_days"] == exp["dur_days"]).all()
    assert (got["d_events"] == exp["d_events"]).all()
    assert (got["n_risk"] == exp["n_risk"]).all()
    assert np.allclose(got["survival"], exp["survival"].round(6), atol=1e-9)


def test_km_survival_monotone_and_bounded(spark):
    got = survival_kaplan_meier(spark, SF).toPandas()
    assert ((got["survival"] > 0) | np.isclose(got["survival"], 0)).all()
    assert (got["survival"] <= 1.0).all()
    for _, g in got.groupby("priority"):
        s = g.sort_values("dur_days")["survival"].to_numpy()
        assert (np.diff(s) <= 1e-12).all()  # non-increasing step curve


# --------------------------------------------------------------------------
# robust_theil_sen_slope
# --------------------------------------------------------------------------


def _py_theil_sen() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["ts"].notna() & ev["value"].notna() & ev["event_type"].notna()]
    ev = ev.copy()
    ev["x"] = ev["ts"].astype("datetime64[us]").astype("int64") / 86400000000.0
    ev["hk"] = ev["event_id"].map(lambda i: _h60(f"ts|{int(i)}"))
    rows = []
    for etype, g in ev.groupby("event_type"):
        s = g.sort_values(["hk", "event_id"]).head(_TS_K).reset_index()
        slopes = []
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                if s["x"][j] != s["x"][i]:
                    slopes.append(
                        (
                            (s["value"][j] - s["value"][i])
                            / (s["x"][j] - s["x"][i]),
                            s["event_id"][i],
                            s["event_id"][j],
                        )
                    )
        slopes.sort()
        med = slopes[(len(slopes) + 1) // 2 - 1][0]
        rows.append((etype, len(s), len(slopes), round(med, 6)))
    return pd.DataFrame(rows, columns=["event_type", "n_points", "n_pairs", "ts_slope"])


def test_theil_sen_matches_python_reference(spark):
    got = (
        robust_theil_sen_slope(spark, SF)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    exp = _py_theil_sen().sort_values("event_type").reset_index(drop=True)
    assert (got["event_type"] == exp["event_type"]).all()
    assert (got["n_points"] == exp["n_points"]).all()
    assert (got["n_pairs"] == exp["n_pairs"]).all()
    assert np.allclose(got["ts_slope"], exp["ts_slope"], atol=1e-9)


def test_theil_sen_pair_bound(spark):
    got = robust_theil_sen_slope(spark, SF).toPandas()
    assert (got["n_points"] <= _TS_K).all()
    assert (got["n_pairs"] <= _TS_K * (_TS_K - 1) // 2).all()


# --------------------------------------------------------------------------
# mann_kendall_trend
# --------------------------------------------------------------------------


def _py_mk() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["ts"].notna() & ev["event_type"].notna()].copy()
    ev["day"] = ev["ts"].dt.normalize()
    rows = []
    for etype, g in ev.groupby("event_type"):
        daily = g.groupby("day").size().sort_index().to_numpy()
        n = len(daily)
        s = 0
        for i in range(n):
            for j in range(i + 1, n):
                s += int(np.sign(daily[j] - daily[i]))
        _, tie_counts = np.unique(daily, return_counts=True)
        tie_term = int(sum(t * (t - 1) * (2 * t + 5) for t in tie_counts if t > 1))
        var18 = n * (n - 1) * (2 * n + 5) - tie_term
        if var18 <= 0:
            z = 0.0
        elif s > 0:
            z = (s - 1) / math.sqrt(var18 / 18.0)
        elif s < 0:
            z = (s + 1) / math.sqrt(var18 / 18.0)
        else:
            z = 0.0
        rows.append((etype, n, s, var18, round(z, 6)))
    return pd.DataFrame(rows, columns=["event_type", "n_days", "s_stat", "var_s_x18", "z_stat"])


def test_mann_kendall_matches_python_reference(spark):
    got = (
        mann_kendall_trend(spark, SF)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    exp = _py_mk().sort_values("event_type").reset_index(drop=True)
    assert (got["event_type"] == exp["event_type"]).all()
    assert (got["n_days"] == exp["n_days"]).all()
    assert (got["s_stat"] == exp["s_stat"]).all()
    assert (got["var_s_x18"] == exp["var_s_x18"]).all()
    assert np.allclose(got["z_stat"], exp["z_stat"], atol=1e-9)
    # verdict consistent with z at the 5% two-sided threshold
    for _, r in got.iterrows():
        if r["trend"] == "increasing":
            assert r["z_stat"] > 1.959
        elif r["trend"] == "decreasing":
            assert r["z_stat"] < -1.959
