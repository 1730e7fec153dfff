"""Python-reference tests for pipeline99 (Shapley attribution, SPRT,
delta-method ratio SE)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from messikinesisprovider_spark.operators.pipeline99 import (
    _SH_CHANNELS,
    _SH_FULL,
    _SH_KFACT,
    ab_ratio_delta_method,
    ab_sprt_sequential,
    attribution_shapley_exact,
)

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _arm(uid: int) -> str:
    return "A" if _h60(f"arm|{uid}") % 2 == 0 else "B"


# --------------------------------------------------------------------------
# attribution_shapley_exact
# --------------------------------------------------------------------------


def _user_masks() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["user_id"].notna()]
    bit = dict(_SH_CHANNELS)
    rows = []
    for uid, g in ev.groupby("user_id"):
        mask = 0
        for t in g["event_type"].dropna():
            mask |= bit.get(t, 0)
        rows.append((int(uid), mask, int((g["event_type"] == "purchase").any())))
    return pd.DataFrame(rows, columns=["user_id", "mask", "conv"])


def _py_shapley() -> dict[str, int]:
    users = _user_masks()
    v = {
        s: int(users.loc[(users["mask"] & s) == users["mask"], "conv"].sum())
        for s in range(_SH_FULL + 1)
    }
    k = len(_SH_CHANNELS)
    fact = math.factorial
    phi = {}
    for name, bit in _SH_CHANNELS:
        total = 0
        for s in range(_SH_FULL + 1):
            if s & bit:
                continue
            w = fact(bin(s).count("1")) * fact(k - 1 - bin(s).count("1"))
            total += w * (v[s | bit] - v[s])
        phi[name] = total
    return phi


def test_shapley_matches_python_reference(spark):
    got = attribution_shapley_exact(spark, SF).toPandas().set_index("channel")
    exp = _py_shapley()
    assert set(got.index) == {n for n, _ in _SH_CHANNELS}
    for name, phi24 in exp.items():
        assert got.loc[name, "phi_x24"] == phi24
        assert abs(got.loc[name, "phi"] - round(phi24 / _SH_KFACT, 6)) < 1e-9


def test_shapley_efficiency_axiom(spark):
    """Shapley credits sum exactly to v(full coalition) - v(empty set)."""
    got = attribution_shapley_exact(spark, SF).toPandas()
    users = _user_masks()
    v_full = int(users["conv"].sum())
    v_empty = int(users.loc[users["mask"] == 0, "conv"].sum())
    assert got["phi_x24"].sum() == _SH_KFACT * (v_full - v_empty)


# --------------------------------------------------------------------------
# ab_sprt_sequential
# --------------------------------------------------------------------------


def _py_sprt() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["user_id"].notna() & ev["ts"].notna()].copy()
    ev["arm"] = ev["user_id"].map(lambda u: _arm(int(u)))
    ev["day"] = ev["ts"].dt.normalize()
    ev["conv"] = (ev["event_type"] == "purchase").astype(int)
    daily = (
        ev.groupby(["arm", "day"])
        .agg(trials=("conv", "size"), conv=("conv", "sum"))
        .reset_index()
        .sort_values(["arm", "day"])
    )
    daily["cum_trials"] = daily.groupby("arm")["trials"].cumsum()
    daily["cum_conv"] = daily.groupby("arm")["conv"].cumsum()
    lr1 = math.log(0.25 / 0.15)
    lr0 = math.log((1.0 - 0.25) / (1.0 - 0.15))
    daily["llr"] = daily["cum_conv"] * lr1 + (daily["cum_trials"] - daily["cum_conv"]) * lr0
    bound = math.log(19.0)
    daily["decision"] = np.where(
        daily["llr"] >= bound,
        "accept_h1",
        np.where(daily["llr"] <= -bound, "accept_h0", "continue"),
    )
    return daily


def test_sprt_matches_python_reference(spark):
    got = (
        ab_sprt_sequential(spark, SF)
        .toPandas()
        .sort_values(["arm", "day"])
        .reset_index(drop=True)
    )
    exp = _py_sprt().reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["cum_trials"].to_numpy() == exp["cum_trials"].to_numpy()).all()
    assert (got["cum_conv"].to_numpy() == exp["cum_conv"].to_numpy()).all()
    assert np.allclose(got["llr"], exp["llr"].round(6), atol=1e-9)
    assert (got["decision"].to_numpy() == exp["decision"].to_numpy()).all()


def test_sprt_cumulative_monotone(spark):
    got = ab_sprt_sequential(spark, SF).toPandas()
    for _, g in got.groupby("arm"):
        ct = g.sort_values("day")["cum_trials"].to_numpy()
        assert (np.diff(ct) > 0).all()


# --------------------------------------------------------------------------
# ab_ratio_delta_method
# --------------------------------------------------------------------------


def _py_delta() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["user_id"].notna()].copy()
    ev["xc"] = np.where(
        (ev["event_type"] == "purchase") & ev["value"].notna(),
        np.round(ev["value"] * 100),
        np.nan,
    )
    per_user = (
        ev.groupby("user_id")
        .agg(xc=("xc", lambda s: int(np.nansum(s))), y=("event_type", "size"))
        .reset_index()
    )
    per_user["arm"] = per_user["user_id"].map(lambda u: _arm(int(u)))
    rows = []
    for arm, g in per_user.groupby("arm"):
        n = len(g)
        x = g["xc"].to_numpy(dtype=float)
        y = g["y"].to_numpy(dtype=float)
        sx, sy = float(x.sum()), float(y.sum())
        r = sx / sy
        var_x = (float((x * x).sum()) - sx * sx / n) / (n - 1)
        cov = (float((x * y).sum()) - sx * sy / n) / (n - 1)
        var_y = (float((y * y).sum()) - sy * sy / n) / (n - 1)
        se = math.sqrt(
            (var_x - 2.0 * r * cov + r * r * var_y) / (n * (sy / n) * (sy / n))
        )
        rows.append((arm, n, round(r / 100.0, 6), round(se / 100.0, 6)))
    return pd.DataFrame(rows, columns=["arm", "n_users", "ratio", "se_delta"])


def test_delta_matches_python_reference(spark):
    got = (
        ab_ratio_delta_method(spark, SF)
        .toPandas()
        .sort_values("arm")
        .reset_index(drop=True)
    )
    exp = _py_delta().sort_values("arm").reset_index(drop=True)
    assert (got["arm"] == exp["arm"]).all()
    assert (got["n_users"] == exp["n_users"]).all()
    assert np.allclose(got["ratio"], exp["ratio"], atol=1e-6)
    assert np.allclose(got["se_delta"], exp["se_delta"], atol=1e-6)


def test_delta_se_positive(spark):
    got = ab_ratio_delta_method(spark, SF).toPandas()
    assert (got["se_delta"] > 0).all()
    assert (got["n_users"] >= 2).all()
