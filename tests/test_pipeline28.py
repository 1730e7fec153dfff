"""Python references for pipeline28 (round 4): AGMS join-size sketch,
threshold sweep, aggregate IVM."""

from __future__ import annotations

import hashlib
import statistics
from collections import Counter

import pandas as pd

from messikinesisprovider_spark.operators import pipeline28

SF = "/root/testdata/sf0.001"


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_agms_counters_match_python_and_estimate_is_sane(spark):
    rows = pipeline28.sketch_agms_join_size(spark, SF).collect()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["user_id"].notna() & ev["event_type"].isin(["click", "purchase"])]
    a = Counter(ev[ev["event_type"] == "click"]["user_id"])
    b = Counter(ev[ev["event_type"] == "purchase"]["user_id"])
    true_size = sum(a[u] * b[u] for u in a.keys() & b.keys())

    def sign(seed: int, user) -> int:
        return 1 - 2 * (h60(f"s{seed}|{int(user)}") % 2)

    assert len(rows) == pipeline28._AGMS_SEEDS
    ests = []
    for r in rows:
        xa = sum(sign(r["seed"], u) * n for u, n in a.items())
        xb = sum(sign(r["seed"], u) * n for u, n in b.items())
        assert (r["xa"], r["xb"]) == (xa, xb)
        assert r["est_join_size"] == xa * xb
        assert r["true_join_size"] == true_size
        ests.append(r["est_join_size"])
    # AGMS is unbiased; the 16-seed median should land within a small
    # multiple of the truth on this corpus (generous bound, not flaky)
    assert true_size > 0
    med = statistics.median(ests)
    assert 0 < med < 5 * true_size
    assert abs(statistics.mean(ests) - true_size) < true_size  # within 2x


def test_threshold_sweep_monotone_and_conserving(spark):
    rows = {r["threshold"]: r for r in pipeline28.threshold_sweep_quality(spark, SF).collect()}
    assert sorted(rows) == [i * 100 for i in range(1, 10)]
    n_docs = {r["n_docs"] for r in rows.values()}
    assert len(n_docs) == 1  # every threshold evaluated over the same corpus
    kept = [rows[t]["n_kept"] for t in sorted(rows)]
    chars = [rows[t]["kept_chars"] for t in sorted(rows)]
    # raising the threshold can only shrink the kept set
    assert kept == sorted(kept, reverse=True)
    assert chars == sorted(chars, reverse=True)
    assert kept[0] <= next(iter(n_docs))


def test_ivm_merge_verifies_against_rebuild(spark):
    rows = pipeline28.ivm_agg_maintenance(spark, SF).collect()
    assert rows, "non-empty corpus must produce at least one state group"
    for r in rows:
        # the in-plan verdict: every merged group equals the full rebuild
        assert r["n_verified"] == r["n_groups"], r
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["user_id"].notna()]
    assert sum(r["n_rows"] for r in rows) == len(ev)  # row conservation
