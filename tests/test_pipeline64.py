"""Python references for pipeline64 (round 4): applyInArrow digest and
bot-rate flags."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from messikinesisprovider_spark.operators import pipeline64

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_arrow_digest_matches_pandas(spark):
    rows = {r["bucket"]: r for r in pipeline64.applyinarrow_group_digest(spark, SF).collect()}
    li = pd.read_parquet(f"{SF}/lineitem.parquet").copy()
    li["bucket"] = li["l_orderkey"].map(lambda k: _h60(str(k)) % pipeline64._N_BUCKETS)
    li["cents"] = np.floor(li["l_extendedprice"] * (1 - li["l_discount"]) * 100 + 0.5).astype("int64")
    li["term"] = (li["l_orderkey"] * 31 + li["l_linenumber"]) % pipeline64._CK_MOD
    for b, g in li.groupby("bucket"):
        r = rows[b]
        assert r["n_rows"] == len(g)
        assert r["revenue_cents"] == int(g["cents"].sum())
        assert r["key_digest"] == int(g["term"].sum()) % pipeline64._CK_MOD
    assert len(rows) == li["bucket"].nunique()


def test_bot_flags_match_pandas(spark):
    got = {r["user_id"]: r for r in pipeline64.bot_rate_flagging(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["user_id"].notna() & ev["ts"].notna()].copy()
    ev["m"] = ev["ts"].dt.floor("min")
    pm = ev.groupby(["user_id", "m"]).size()
    per = pm.groupby("user_id").agg(["sum", "max", "size"])
    n_total, n_users = int(per["sum"].sum()), len(per)
    expect = {}
    for uid, (n, mx, mins) in per.iterrows():
        burst = mx >= 2
        heavy = n * n_users > 2 * n_total
        if burst or heavy:
            expect[uid] = (n, mx, mins, burst, heavy)
    assert set(got) == set(expect)
    for uid, (n, mx, mins, burst, heavy) in expect.items():
        r = got[uid]
        assert (r["n_events"], r["max_per_min"], r["active_minutes"]) == (n, mx, mins)
        assert (r["burst_flag"], r["heavy_flag"]) == (burst, heavy)
    # the gate is selective: flags a real minority, not everyone
    assert 0 < len(expect) < n_users
