"""TCK for the chained stateful streaming rollup (verified12)."""

from __future__ import annotations

import pandas as pd

from messikinesisprovider_spark.streaming import verified12

SF = "/root/testdata/sf0.001"


def test_chained_rollup_conserves_and_excludes_sentinel(spark):
    out = verified12.streaming_chained_window_rollup(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["ts"].notna() & ev["event_type"].notna()].copy()
    # sentinel never appears: its windows are still open when the query stops
    assert "sentinel" not in set(out["event_type"])
    # conservation through BOTH stateful levels: every event is counted once
    assert int(out["n_events"].sum()) == len(ev)
    # hour granularity is bounded by the day
    assert (out["n_hours"] >= 1).all() and (out["n_hours"] <= 24).all()
    # per-(day, type) equality with the batch rollup
    ev["day"] = ev["ts"].dt.floor("D")
    ev["hour"] = ev["ts"].dt.floor("h")
    ref = (
        ev.groupby(["day", "event_type"])
        .agg(n_hours=("hour", "nunique"), n_events=("hour", "size"))
        .reset_index()
    )
    got = out.rename(columns={"day": "day"}).sort_values(["day", "event_type"]).reset_index(drop=True)
    ref = ref.sort_values(["day", "event_type"]).reset_index(drop=True)
    assert len(got) == len(ref)
    assert (got["n_events"].to_numpy() == ref["n_events"].to_numpy()).all()
    assert (got["n_hours"].to_numpy() == ref["n_hours"].to_numpy()).all()
