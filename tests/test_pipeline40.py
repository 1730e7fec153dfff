"""Python-reference test for interval_union_coverage."""

from __future__ import annotations

import pandas as pd

from messikinesisprovider_spark.operators.pipeline40 import (
    _IV_US,
    interval_union_coverage,
)

SF = "/root/testdata/sf0.001"


def _merge(intervals: list[tuple[int, int]]) -> list[tuple[int, int]]:
    out: list[list[int]] = []
    for s, e in intervals:
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return [(s, e) for s, e in out]


def test_interval_union_matches_python_sweep(spark):
    got = {r["user_id"]: r for r in interval_union_coverage(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["ts"].notna() & ev["user_id"].notna()].copy()
    ev["s"] = ev["ts"].astype("int64")
    if str(ev["ts"].dtype).endswith("ns]"):
        ev["s"] //= 1000
    for uid, grp in ev.groupby("user_id"):
        iv = sorted((int(s), int(s) + _IV_US) for s in grp["s"])
        merged = _merge(iv)
        covered = sum(e - s for s, e in merged)
        row = got[uid]
        assert row["n_segments"] == len(merged)
        assert row["n_events"] == len(grp)
        assert row["covered_us"] == covered
        assert row["coverage_permille"] == (1000 * covered) // (len(grp) * _IV_US)
        # union length can never exceed the sum of the parts
        assert covered <= len(grp) * _IV_US


def test_overlaps_are_nonvacuous(spark):
    """The fixture really exercises merging: some user has fewer segments
    than events (i.e., at least one overlap merged)."""
    rows = interval_union_coverage(spark, SF).collect()
    assert any(r["n_segments"] < r["n_events"] for r in rows)
