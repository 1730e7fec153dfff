"""Python references for pipeline55 (round 4): gains/lift, LISTAGG, HLL
rollup, permutation test."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from messikinesisprovider_spark.operators import pipeline55

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_gains_lift_matches_pandas(spark):
    rows = {r["decile"]: r for r in pipeline55.cumulative_gains_lift(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["user_id"].notna()]
    users = ev.groupby("user_id").agg(
        score=("event_type", lambda s: int((s == "click").sum())),
        pos=("event_type", lambda s: int((s == "purchase").any())),
    ).reset_index()
    users = users.sort_values(["score", "user_id"], ascending=[False, True]).reset_index(drop=True)
    n, k = len(users), 10
    base, rem = divmod(n, k)
    sizes = [base + 1 if i < rem else base for i in range(k)]
    deciles = np.repeat(np.arange(1, k + 1), sizes)
    users["decile"] = deciles[: len(users)]
    tp, tu = users["pos"].sum(), len(users)
    cum_u = cum_p = 0
    for d in range(1, k + 1):
        grp = users[users["decile"] == d]
        if grp.empty:
            assert d not in rows
            continue
        cum_u += len(grp)
        cum_p += int(grp["pos"].sum())
        r = rows[d]
        assert (r["n_users"], r["n_pos"], r["cum_users"], r["cum_pos"]) == (
            len(grp), int(grp["pos"].sum()), cum_u, cum_p,
        )
        if tp:
            assert abs(r["lift"] - (cum_p * tu) / (cum_u * tp)) < 1e-12
    # gains are monotone and lift decays to 1.0 at the last decile
    assert rows[max(rows)]["cum_pos"] == tp
    assert abs(rows[max(rows)]["lift"] - 1.0) < 1e-12


def test_listagg_roster_matches_pandas(spark):
    rows = {r["nation"]: r for r in pipeline55.listagg_order_report(spark, SF).collect()}
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    nk = dict(zip(nation["n_nationkey"], nation["n_name"]))
    for key, grp in cust.groupby("c_nationkey"):
        top = grp.sort_values(["c_acctbal", "c_name"], ascending=[False, True]).head(5)
        r = rows[nk[key]]
        assert r["n_listed"] == len(top)
        assert r["roster"] == ",".join(top["c_name"])


def test_hll_rollup_within_tolerance(spark):
    rows = {r["key"]: r for r in pipeline55.hll_union_rollup(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["user_id"].notna()]
    for etype, grp in ev.groupby("event_type"):
        r = rows[etype]
        assert r["n_exact"] == grp["user_id"].nunique()
        assert bool(r["hll_within_tol"])
    assert rows["ALL"]["n_exact"] == ev["user_id"].nunique()
    assert bool(rows["ALL"]["hll_within_tol"])


def test_permutation_test_matches_hash_replay(spark):
    rows = {r["resample"]: r for r in pipeline55.permutation_test_hash(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna() & ev["event_type"].isin(["purchase", "click"])].copy()
    ev["cents"] = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    obs = rows[-1]
    g1 = ev[ev["event_type"] == "purchase"]["cents"]
    g2 = ev[ev["event_type"] == "click"]["cents"]
    assert (obs["n1"], obs["n2"]) == (len(g1), len(g2))
    assert abs(obs["mean_diff"] - (g1.sum() / len(g1) - g2.sum() / len(g2))) < 1e-9
    # replay one resample from the portable hash
    b = 3
    flags = ev["event_id"].map(lambda i: _h60(f"pm|{i}|{b}") % 2 == 0)
    s1, n1 = ev.loc[flags, "cents"].sum(), int(flags.sum())
    s2, n2 = ev.loc[~flags, "cents"].sum(), int((~flags).sum())
    r = rows[b]
    assert (r["n1"], r["n2"]) == (n1, n2)
    assert abs(r["mean_diff"] - (s1 / n1 - s2 / n2)) < 1e-9
    # all 32 resamples present (both groups non-empty at this SF)
    assert len(rows) == pipeline55._PERM_B + 1
