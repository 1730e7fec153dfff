"""Python-reference tests for pipeline86 (time-decay attribution, sorted-
neighborhood blocking, array surface 2)."""

from __future__ import annotations

from collections import defaultdict

import pandas as pd

from messikinesisprovider_spark.operators.pipeline86 import (
    _ATD_WINDOW_US,
    _DAY_US,
    _SNM_WINDOW,
    array_functions_2,
    attribution_time_decay,
    blocking_sorted_neighborhood,
)

SF = "/root/testdata/sf0.001"


def test_time_decay_attribution_matches_python(spark):
    rows = {r["click_hour"]: r for r in attribution_time_decay(spark, SF).collect()}
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    ).dropna(subset=["user_id", "ts"])
    purchases = ev[ev.event_type == "purchase"]
    clicks = ev[ev.event_type == "click"]
    by_user = dict(tuple(clicks.groupby("user_id")))
    per_hour = defaultdict(lambda: [0, set(), 0, 0])  # touches, pids, credit, rounded
    us = pd.Timedelta(microseconds=1)
    for p in purchases.itertuples():
        cs = by_user.get(p.user_id)
        if cs is None:
            continue
        touches = []
        for c in cs.itertuples():
            d_us = int((p.ts - c.ts) / us)
            if 0 <= d_us <= _ATD_WINDOW_US:
                w = 1 << (7 - min(d_us // _DAY_US, 7))
                touches.append((c.ts.hour, w))
        sw = sum(w for _, w in touches)
        for hr, w in touches:
            acc = per_hour[hr]
            acc[0] += 1
            acc[1].add(p.event_id)
            acc[2] += (1000 * w) // sw
            acc[3] += 1 if (1000 * w) % sw != 0 else 0
    assert set(rows) == set(per_hour)
    for hr, (nt, pids, credit, rounded) in per_hour.items():
        r = rows[hr]
        assert (r["n_touches"], r["n_conversions"], r["credit_pm"], r["n_rounded"]) == (
            nt,
            len(pids),
            credit,
            rounded,
        )


def test_sorted_neighborhood_candidates(spark):
    out = blocking_sorted_neighborhood(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"]).dropna(
        subset=["text"]
    )
    docs["bkey"] = docs["text"].str.lower().str.strip().str.slice(0, 12)
    ordered = docs.sort_values(["bkey", "doc_id"]).reset_index(drop=True)
    n = len(ordered)
    expect = set()
    for i in range(n):
        for k in range(1, _SNM_WINDOW + 1):
            if i + k < n:
                expect.add(
                    (ordered["doc_id"][i], ordered["doc_id"][i + k], k)
                )
    got = {(r.doc_a, r.doc_b, r.neighbor_dist) for r in out.itertuples()}
    assert got == expect
    # pair volume is exactly the O(N*w) bound
    assert len(out) == sum(min(_SNM_WINDOW, n - 1 - i) for i in range(n))


def test_array_functions_2_semantics(spark):
    out = array_functions_2(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"]).dropna(
        subset=["text"]
    )
    sample = docs.head(40)
    by_id = {r.doc_id: r for r in out.itertuples()}
    for d in sample.itertuples():
        ts = [t for t in d.text.lower().split(" ") if t]
        r = by_id[d.doc_id]
        top5 = sorted(ts, reverse=True)[:5]
        assert r.top5_desc == "|".join(top5)
        longs = [t for t in ts if len(t) >= 6]
        assert r.n_long == len(longs)
        assert r.flat_len == len(top5) + len(longs)
        assert r.pos_spark == (ts.index("spark") + 1 if "spark" in ts else 0)
        assert r.n_distinct == len(set(ts))
