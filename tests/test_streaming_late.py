"""TCK for streaming_late_drop_audit (round 4): real drops happen, and they
follow the probed boundary rule (window.end <= watermark drops; end == wm
is the knife edge) — replicated by a python replay over the raw events."""

from __future__ import annotations

import hashlib
from collections import Counter
from datetime import timedelta

import pandas as pd

from messikinesisprovider_spark.streaming.verified8 import (
    _LATE_AGE_H,
    _LATE_MOD,
    streaming_late_drop_audit,
)

SF = "/root/testdata/sf0.001"


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _python_replay(sf):
    ev = pd.read_parquet(f"{sf}/events.parquet")[["event_id", "ts"]].dropna(subset=["ts"])
    ev["ts"] = pd.to_datetime(ev["ts"])
    mx = ev["ts"].max()
    cutoff = mx - timedelta(hours=_LATE_AGE_H)
    late = ev[
        ev["event_id"].notna()
        & (ev["event_id"].map(lambda x: h60(str(int(x))) % _LATE_MOD == 0))
        & (ev["ts"] < cutoff)
    ]
    ontime = ev.drop(late.index)
    wm = ontime["ts"].max() - timedelta(hours=1)
    kept_late = late[late["ts"].dt.floor("h") + timedelta(hours=1) > wm]
    counts = Counter()
    for ts in pd.concat([ontime["ts"], kept_late["ts"]]):
        counts[ts.floor("h")] += 1
    n_dropped = len(late) - len(kept_late)
    return counts, n_dropped, len(late)


def test_late_rows_really_drop_and_match_replay(spark):
    got = {
        pd.Timestamp(r["window_start"]): r["n_messages"]
        for r in streaming_late_drop_audit(spark, SF).collect()
    }
    expect, n_dropped, n_late = _python_replay(SF)
    # the audit is only meaningful if the fixture exercises both paths
    assert n_late > 0, "no late rows at this SF — the audit is vacuous"
    assert n_dropped > 0, "no row hit the drop rule — the audit is vacuous"
    assert got == dict(expect)
    # conservation: emitted + dropped == all non-null-ts events
    ev = pd.read_parquet(f"{SF}/events.parquet")
    assert sum(got.values()) + n_dropped == int(ev["ts"].notna().sum())
