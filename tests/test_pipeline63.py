"""Python references for pipeline63 (round 4): stratified ATE and kappa."""

from __future__ import annotations

import numpy as np
import pandas as pd

from messikinesisprovider_spark.operators import pipeline63

SF = "/root/testdata/sf0.001"


def _stratum(clicks: int) -> str:
    if clicks == 0:
        return "0"
    if clicks <= 2:
        return "1-2"
    if clicks <= 5:
        return "3-5"
    return "6+"


def test_stratified_ate_matches_pandas(spark):
    rows = {r["stratum"]: r for r in pipeline63.causal_stratified_ate(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["user_id"].notna()].copy()
    ev["cents"] = np.where(
        (ev["event_type"] == "purchase") & ev["value"].notna(),
        np.floor(ev["value"] * 100 + 0.5),
        0,
    ).astype("int64")
    users = ev.groupby("user_id").agg(
        treated=("event_type", lambda s: int((s == "signup").any())),
        clicks=("event_type", lambda s: int((s == "click").sum())),
        cents=("cents", "sum"),
    )
    users["stratum"] = users["clicks"].map(_stratum)
    expect = {}
    wsum = wn = 0
    for st, g in users.groupby("stratum"):
        n1 = int(g["treated"].sum())
        n0 = len(g) - n1
        s1 = int(g.loc[g["treated"] == 1, "cents"].sum())
        s0 = int(g.loc[g["treated"] == 0, "cents"].sum())
        eff = None if n1 == 0 or n0 == 0 else (s1 * 10**6) // n1 - (s0 * 10**6) // n0
        expect[st] = (len(g), n1, n0, eff)
        if eff is not None:
            wsum += len(g) * eff
            wn += len(g)
    assert {k: v for k, v in rows.items() if k != "ALL"}.keys() == expect.keys()
    for st, (n, n1, n0, eff) in expect.items():
        r = rows[st]
        assert (r["n"], r["n_treated"], r["n_control"], r["effect_micro"]) == (n, n1, n0, eff)
    # Python // floors; SQL DIV truncates toward zero — integers here are
    # nonnegative sums so the two agree; the ALL row weights valid strata
    all_row = rows["ALL"]
    assert all_row["n"] == len(users)
    if wn:
        q, rm = divmod(wsum, wn)
        trunc = q if (wsum >= 0 or rm == 0) else q + 1  # emulate DIV
        assert all_row["effect_micro"] == trunc


def test_kappa_matches_sklearn_style_formula(spark):
    r = pipeline63.cohens_kappa_langid(spark, SF).collect()[0]
    from messikinesisprovider_spark.operators.text import text_lang_id

    pred = text_lang_id(spark, SF).toPandas()
    pred["labeled_lang"] = pred["labeled_lang"].fillna("unk")
    n = len(pred)
    agree = int((pred["labeled_lang"] == pred["predicted_lang"]).sum())
    rowc = pred["labeled_lang"].value_counts()
    colc = pred["predicted_lang"].value_counts()
    keys = set(rowc.index) | set(colc.index)
    sum_rc = sum(int(rowc.get(k, 0)) * int(colc.get(k, 0)) for k in keys)
    assert (r["n_total"], r["agree"], r["sum_rc"]) == (n, agree, sum_rc)
    assert r["kappa_num"] == agree * n - sum_rc
    assert r["kappa_den"] == n * n - sum_rc
    assert abs(r["kappa"] - (agree * n - sum_rc) / (n * n - sum_rc)) < 1e-15
    # kappa below raw accuracy (chance correction bites) and within [-1, 1]
    assert -1.0 <= r["kappa"] <= 1.0
    assert r["kappa"] <= agree / n + 1e-12
