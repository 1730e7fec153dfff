"""Python references for pipeline44 (round 4): histogram split finder,
exact weighted median, largest-remainder apportionment."""

from __future__ import annotations

import hashlib

import pandas as pd

from messikinesisprovider_spark.operators import pipeline44

SF = "/root/testdata/sf0.001"


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_tree_split_histogram_matches_pandas(spark):
    rows = {r["threshold"]: r for r in pipeline44.tree_split_histogram(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()]
    y = (ev["event_type"] == "purchase").astype(int)
    best, best_score = None, None
    for t in pipeline44._SPLIT_THRESHOLDS:
        left = ev["value"] < t
        nl, pl = int(left.sum()), int(y[left].sum())
        nr, pr = int((~left).sum()), int(y[~left].sum())
        r = rows[t]
        assert (r["n_left"], r["pos_left"], r["n_right"], r["pos_right"]) == (nl, pl, nr, pr)
        score = (0.0 if nl == 0 else (pl * pl + (nl - pl) ** 2) / nl) + (
            0.0 if nr == 0 else (pr * pr + (nr - pr) ** 2) / nr
        )
        assert abs(r["purity"] - score) < 1e-9
        if best_score is None or score > best_score:
            best, best_score = t, score
    assert [t for t, r in rows.items() if r["is_best"]] == [best]


def test_weighted_median_matches_python(spark):
    got = {
        r["event_type"]: (r["total_weight"], r["weighted_median"])
        for r in pipeline44.weighted_median_exact(spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()]
    for et, grp in ev.groupby("event_type"):
        items = sorted(
            (float(v), int(i), h60(f"wm|{i}") % 4 + 1)
            for v, i in zip(grp["value"], grp["event_id"])
        )
        totw = sum(w for _, _, w in items)
        cum = 0
        for v, _, w in items:
            cum += w
            if 2 * cum >= totw:
                assert got[et] == (totw, v), et
                break
    assert set(got) == set(ev["event_type"].unique())


def test_apportion_quota_sums_to_n_and_matches_hamilton(spark):
    rows = {r["source"]: r for r in pipeline44.apportion_largest_remainder(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    counts = docs["source"].fillna("<null>").value_counts().to_dict()
    total = sum(counts.values())
    n = pipeline44._APPORTION_N
    base = {s: (n * c) // total for s, c in counts.items()}
    rem = {s: (n * c) % total for s, c in counts.items()}
    leftover = n - sum(base.values())
    order = sorted(counts, key=lambda s: (-rem[s], -counts[s], s))
    quota = dict(base)
    for s in order[:leftover]:
        quota[s] += 1
    assert {s: r["quota"] for s, r in rows.items()} == quota
    assert {s: r["base_quota"] for s, r in rows.items()} == base
    assert sum(r["quota"] for r in rows.values()) == n
    # non-vacuous: the remainder rule actually promoted someone
    assert any(rows[s]["quota"] != rows[s]["base_quota"] for s in rows)
