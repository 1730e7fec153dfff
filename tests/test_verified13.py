"""TCK for the two-source streaming union (verified13)."""

from __future__ import annotations

import pandas as pd

from messikinesisprovider_spark.streaming import verified13

SF = "/root/testdata/sf0.001"


def test_union_two_logs_conserves_and_routes(spark):
    out = verified13.streaming_union_two_logs(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["ts"].notna() & ev["event_type"].notna()].copy()
    # conservation across BOTH sources through the shared checkpoint
    assert int(out["n_messages"].sum()) == len(ev)
    # routing: source A carries exactly the purchases
    a_total = int(out.loc[out["src"] == "A", "n_messages"].sum())
    assert a_total == int((ev["event_type"] == "purchase").sum())
    # both sources actually emitted (the union is non-vacuous)
    assert set(out["src"]) == {"A", "B"}
    # per-(hour, src) equality with the batch rollup
    ev["hour"] = ev["ts"].dt.floor("h")
    ev["src"] = (ev["event_type"] == "purchase").map({True: "A", False: "B"})
    ref = ev.groupby(["hour", "src"]).size()
    got = out.set_index([out["window_start"].map(pd.Timestamp), "src"])["n_messages"]
    assert len(got) == len(ref)
    for (hour, src), n in ref.items():
        assert got[(pd.Timestamp(hour), src)] == n
