"""Python-reference tests for pipeline36: XmR control chart and the
mapInArrow digest stage."""

from __future__ import annotations

import hashlib
from decimal import Decimal

import pandas as pd
import pytest

from messikinesisprovider_spark.operators.pipeline36 import (
    arrow_batch_hash,
    spc_control_chart,
)

SF = "/root/testdata/sf0.001"


def test_spc_matches_python_reference(spark):
    out = {r["event_type"]: r for r in spc_control_chart(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["ts"].notna() & ev["event_type"].notna() & ev["value"].notna()].copy()
    ev["day"] = ev["ts"].dt.date
    ev["v6"] = (ev["value"] * 10**6).round().astype("int64")
    for et, grp in ev.groupby("event_type"):
        daily = grp.groupby("day")["v6"].sum().sort_index()
        xs = [int(v) for v in daily]
        mrs = [abs(a - b) for a, b in zip(xs[1:], xs)]
        mean_x = (float(sum(xs)) / 1e6) / len(xs)
        got = out[et]
        assert got["n_days"] == len(xs)
        assert got["mean_x"] == pytest.approx(mean_x, rel=1e-12)
        if mrs:
            mean_mr = (float(sum(mrs)) / 1e6) / len(mrs)
            assert got["mean_mr"] == pytest.approx(mean_mr, rel=1e-12)
            ucl, lcl = mean_x + 2.66 * mean_mr, mean_x - 2.66 * mean_mr
            viol = sum(1 for x in xs if x / 1e6 > ucl or x / 1e6 < lcl)
            assert got["n_violations"] == viol
            assert got["lcl"] < got["mean_x"] < got["ucl"]


def test_arrow_hash_matches_hashlib(spark):
    rows = {r["source"]: r for r in arrow_batch_hash(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs["text"].notna()].copy()
    docs["source"] = docs["source"].fillna("")
    for source, grp in docs.groupby("source"):
        digests = [hashlib.md5(t.encode()).hexdigest() for t in grp["text"]]
        got = rows[source]
        assert got["n_docs"] == len(grp)
        assert got["total_bytes"] == sum(len(t.encode()) for t in grp["text"])
        assert got["n_distinct_digests"] == len(set(digests))
        assert got["digest_checksum"] == sum(int(d[:15], 16) % 1000003 for d in digests)
