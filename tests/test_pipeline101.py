"""Python-reference tests for pipeline101 (linkage EM, randomized
response) and the streaming SPRT monitor (verified18)."""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pandas as pd

from messikinesisprovider_spark.operators.pipeline95 import _FS_M
from messikinesisprovider_spark.operators.pipeline101 import (
    _EM_FIELDS,
    _EM_LAMBDA0,
    _EM_U0,
    _RR_THRESH,
    er_em_mu_estimation,
    ldp_randomized_response,
)

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# --------------------------------------------------------------------------
# er_em_mu_estimation
# --------------------------------------------------------------------------


def _py_em():
    c = pd.read_parquet(f"{SF}/customer.parquet")
    c = c.assign(
        f_seg=c["c_mktsegment"],
        f_bal=np.floor(c["c_acctbal"] / 1000),
        f_cents=np.round(c["c_acctbal"] * 100).astype("int64") % 100,
    )
    patterns = Counter()
    for _, blk in c.groupby("c_nationkey"):
        rows = blk.sort_values("c_custkey").to_dict("records")
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                a, b = rows[i], rows[j]
                pat = (
                    4 * int(a["f_seg"] == b["f_seg"])
                    + 2 * int(a["f_bal"] == b["f_bal"])
                    + int(a["f_cents"] == b["f_cents"])
                )
                patterns[pat] += 1
    # E-step responsibilities from literal priors, M-step sums in
    # pattern order (the fold order both engines use)
    sums = {"sn": 0.0, "srn": 0.0}
    for f in _EM_FIELDS:
        sums[f"sma_{f}"] = 0.0
        sums[f"sua_{f}"] = 0.0
    for pat in sorted(patterns):
        n = patterns[pat]
        pm, pu = _EM_LAMBDA0, 1.0 - _EM_LAMBDA0
        for i, f in enumerate(_EM_FIELDS):
            bit = (pat >> (len(_EM_FIELDS) - 1 - i)) % 2
            pm *= _FS_M[f] if bit else round(1.0 - _FS_M[f], 6)
            pu *= _EM_U0[f] if bit else round(1.0 - _EM_U0[f], 6)
        r = pm / (pm + pu)
        sums["sn"] += n
        sums["srn"] += r * n
        for i, f in enumerate(_EM_FIELDS):
            bit = (pat >> (len(_EM_FIELDS) - 1 - i)) % 2
            sums[f"sma_{f}"] += r * n * bit
            sums[f"sua_{f}"] += (1.0 - r) * n * bit
    return patterns, sums


def test_em_matches_python_reference(spark):
    got = er_em_mu_estimation(spark, SF).toPandas().set_index("field")
    patterns, s = _py_em()
    assert set(got.index) == set(_EM_FIELDS)
    n_pairs = sum(patterns.values())
    lam = s["srn"] / s["sn"]
    for f in _EM_FIELDS:
        r = got.loc[f]
        assert r["n_pairs"] == n_pairs
        assert abs(r["m_prior"] - _FS_M[f]) < 1e-12
        assert abs(r["u_prior"] - _EM_U0[f]) < 1e-12
        assert abs(r["m_updated"] - round(s[f"sma_{f}"] / s["srn"], 6)) < 1e-9
        assert (
            abs(r["u_updated"] - round(s[f"sua_{f}"] / (s["sn"] - s["srn"]), 6))
            < 1e-9
        )
        assert abs(r["lambda_updated"] - round(lam, 6)) < 1e-9


def test_em_updates_are_probabilities(spark):
    got = er_em_mu_estimation(spark, SF).toPandas()
    for col in ["m_updated", "u_updated", "lambda_updated"]:
        assert ((got[col] >= 0) & (got[col] <= 1)).all()
    # agreement is likelier under the match class after one step
    assert (got["m_updated"] > got["u_updated"]).all()


# --------------------------------------------------------------------------
# ldp_randomized_response
# --------------------------------------------------------------------------


def _py_rr() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["ts"].notna()].copy()
    ev["day"] = ev["ts"].dt.normalize()
    ev["b"] = (ev["event_type"] == "purchase").astype(int)
    ev["truthful"] = ev["event_id"].map(lambda i: _h60(f"rr|{int(i)}") < _RR_THRESH)
    ev["y"] = np.where(ev["truthful"], ev["b"], 1 - ev["b"])
    g = (
        ev.groupby("day")
        .agg(n=("y", "size"), n_reported_yes=("y", "sum"), n_true=("b", "sum"))
        .reset_index()
    )
    g["pi_hat"] = ((g["n_reported_yes"] / g["n"] - 0.25) / 0.5).round(6)
    g["pi_true"] = (g["n_true"] / g["n"]).round(6)
    return g


def test_rr_matches_python_reference(spark):
    got = (
        ldp_randomized_response(spark, SF)
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    exp = _py_rr().sort_values("day").reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
    assert (
        got["n_reported_yes"].to_numpy() == exp["n_reported_yes"].to_numpy()
    ).all()
    assert np.allclose(got["pi_hat"], exp["pi_hat"], atol=1e-9)
    assert np.allclose(got["pi_true"], exp["pi_true"], atol=1e-9)


def test_rr_debiasing_beats_raw_reported_rate(spark):
    """The de-biased estimate tracks the true rate far better than the raw
    reported rate does (the whole point of the mechanism)."""
    got = ldp_randomized_response(spark, SF).toPandas()
    raw_err = np.abs(got["n_reported_yes"] / got["n"] - got["pi_true"])
    assert got["abs_err"].mean() < raw_err.mean()


# --------------------------------------------------------------------------
# streaming_sprt_monitor (verified18) — trace consistency vs the batch op
# --------------------------------------------------------------------------


def test_streaming_sprt_final_counts_match_batch_totals(spark):
    from messikinesisprovider_spark.streaming.verified18 import (
        _N_STAGES,
        streaming_sprt_monitor,
    )

    got = streaming_sprt_monitor(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["user_id"].notna() & ev["event_id"].notna()].copy()
    ev["arm"] = ev["user_id"].map(
        lambda u: "A" if _h60(f"arm|{int(u)}") % 2 == 0 else "B"
    )
    totals = ev.groupby("arm").agg(
        trials=("event_id", "size"),
        conv=("event_type", lambda s: int((s == "purchase").sum())),
    )
    final = got[got["checkpoint"] == _N_STAGES].set_index("arm")
    for arm in totals.index:
        assert final.loc[arm, "cum_trials"] == totals.loc[arm, "trials"]
        assert final.loc[arm, "cum_conv"] == totals.loc[arm, "conv"]
    # trace is monotone in trials per arm
    for _, g in got.groupby("arm"):
        ct = g.sort_values("checkpoint")["cum_trials"].to_numpy()
        assert (np.diff(ct) > 0).all()
