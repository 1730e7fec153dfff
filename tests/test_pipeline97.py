"""Tests for pipeline97 (Efraimidis-Spirakis weighted sampling) and
verified17 (full-outer stream-stream join)."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from messikinesisprovider_spark.operators.pipeline97 import (
    _ES_K,
    sample_weighted_topk_es,
)

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_es_sample_matches_python_replay(spark):
    got = {}
    for r in sample_weighted_topk_es(spark, SF).collect():
        got.setdefault(r["source"], []).append(
            (r["rk"], r["doc_id"], r["weight"], r["es_key"])
        )
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs["n_chars"] > 0]
    expected = {}
    for source, grp in docs.groupby("source"):
        keyed = []
        for _, r in grp.iterrows():
            u = (_h60(f"es:{int(r['doc_id'])}") + 0.5) / 2**60
            keyed.append((math.log(u) / int(r["n_chars"]), int(r["doc_id"]),
                          int(r["n_chars"])))
        keyed.sort(key=lambda t: (-t[0], t[1]))
        expected[source] = [
            (i + 1, d, w, round(k, 6)) for i, (k, d, w) in enumerate(keyed[:_ES_K])
        ]
    assert set(got) == set(expected)
    for source in expected:
        assert [(a, b, c) for a, b, c, _ in got[source]] == [
            (a, b, c) for a, b, c, _ in expected[source]
        ]
        for (_, _, _, kg), (_, _, _, ke) in zip(got[source], expected[source]):
            assert abs(kg - ke) < 1e-6


def test_es_sample_is_weighted_and_exactly_k(spark):
    """Every source yields exactly k rows, and across the two SFs the
    selection is weight-biased: the mean selected weight exceeds the mean
    corpus weight (heavier docs are more likely to win)."""
    docs = pd.read_parquet(f"{SF01}/documents.parquet")
    docs = docs[docs["n_chars"] > 0]
    rows = sample_weighted_topk_es(spark, SF01).collect()
    per_source: dict[str, int] = {}
    for r in rows:
        per_source[r["source"]] = per_source.get(r["source"], 0) + 1
    assert set(per_source.values()) == {_ES_K}
    assert set(per_source) == set(docs["source"].unique())
    sel_mean = sum(r["weight"] for r in rows) / len(rows)
    corpus_mean = docs["n_chars"].mean()
    assert sel_mean > corpus_mean


def test_stream_stream_full_matches_batch_and_flushes_both_sides(spark):
    """Full outer = the batch full interval join; unmatched rows exist on
    BOTH sides (null-padded purchases are the half the left join cannot
    produce)."""
    from messikinesisprovider_spark.operators.relational import events_tbl
    from messikinesisprovider_spark.streaming.verified17 import (
        streaming_stream_stream_full,
    )

    out = streaming_stream_stream_full(spark, SF).toPandas()
    assert len(out) > 0
    unmatched_clicks = out[out["purchase_event_id"].isna()]
    unmatched_purchases = out[out["click_event_id"].isna()]
    assert len(unmatched_clicks) > 0
    assert len(unmatched_purchases) > 0

    ev = events_tbl(spark, SF).toPandas()
    clicks = ev[(ev["event_type"] == "click") & ev["user_id"].notna()]
    purchases = ev[(ev["event_type"] == "purchase") & ev["user_id"].notna()]
    expected = set()
    matched_p = set()
    for _, c in clicks.iterrows():
        hits = purchases[
            (purchases["user_id"] == c["user_id"])
            & (purchases["ts"] >= c["ts"])
            & (purchases["ts"] <= c["ts"] + pd.Timedelta(days=7))
        ]
        if len(hits) == 0:
            expected.add((int(c["event_id"]), None))
        else:
            for _, p in hits.iterrows():
                expected.add((int(c["event_id"]), int(p["event_id"])))
                matched_p.add(int(p["event_id"]))
    for pid in set(purchases["event_id"].astype(int)) - matched_p:
        expected.add((None, pid))
    got = {
        (
            None if pd.isna(r["click_event_id"]) else int(r["click_event_id"]),
            None if pd.isna(r["purchase_event_id"]) else int(r["purchase_event_id"]),
        )
        for _, r in out.iterrows()
    }
    assert got == expected
