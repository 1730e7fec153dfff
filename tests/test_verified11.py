"""Non-vacuity + reference checks for the oracle-verified stateful
high-watermark topology (streaming/verified11.py)."""

from __future__ import annotations

import pandas as pd

from messikinesisprovider_spark.streaming import verified11

SF = "/root/testdata/sf0.001"


def test_stateful_hwm_matches_python_and_regressions_fire(spark):
    rows = {
        r["user_id"]: r
        for r in verified11.streaming_stateful_high_watermark(spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["user_id"].notna() & ev["event_id"].notna()]
    total_reg = 0
    for uid, grp in ev.groupby("user_id"):
        ids = sorted(int(i) for i in grp["event_id"])
        evens = [i for i in ids if i % 2 == 0]
        odds = [i for i in ids if i % 2 == 1]
        reg = sum(1 for i in odds if evens and i <= max(evens))
        r = rows[uid]
        assert r["n_seen"] == len(ids)
        assert r["high_water_seq"] == max(ids)
        assert r["n_regressions"] == reg, uid
        total_reg += reg
    assert set(rows) == set(ev["user_id"].unique())
    # the replay pass actually regressed below the pass-1 high water —
    # the state crossed the checkpoint boundary non-vacuously
    assert total_reg > 0
