"""Python references for pipeline50 (round 4): exact KS statistic,
hash bootstrap."""

from __future__ import annotations

import hashlib

import pandas as pd

from messikinesisprovider_spark.operators import pipeline50

SF = "/root/testdata/sf0.001"


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_ks_statistic_matches_python(spark):
    r = pipeline50.ks_test_drift_exact(spark, SF).collect()[0]
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()]
    g1 = sorted(ev[ev["event_type"] == "purchase"]["value"])
    g2 = sorted(ev[ev["event_type"] != "purchase"]["value"])
    n1, n2 = len(g1), len(g2)
    assert (r["n1"], r["n2"]) == (n1, n2)
    values = sorted(set(g1) | set(g2))
    best = None
    import bisect
    for v in values:
        c1 = bisect.bisect_right(g1, v)
        c2 = bisect.bisect_right(g2, v)
        d = abs(c1 * n2 - c2 * n1)
        key = (-d, v)
        if best is None or key < best:
            best = key
    d_num, at_value = -best[0], best[1]
    assert r["d_num"] == d_num
    assert r["at_value"] == at_value
    assert abs(r["ks_d"] - d_num / (n1 * n2)) < 1e-15
    assert 0 < r["ks_d"] < 1


def test_bootstrap_matches_python_and_brackets_mean(spark):
    rows = {r["resample"]: r for r in pipeline50.bootstrap_mean_ci_hash(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()]
    cents = {int(i): round(v * 100) for i, v in zip(ev["event_id"], ev["value"])}
    means = []
    for b in range(pipeline50._BOOT_B):
        num = den = 0
        for i, c in cents.items():
            m = {0: 0, 3: 2}.get(h60(f"bs|{i}|{b}") % 4, 1)
            num += m * c
            den += m
        assert rows[b]["n_eff"] == den
        assert abs(rows[b]["mean_value"] - num / den / 100) < 1e-12
        means.append(num / den / 100)
    assert len(rows) == pipeline50._BOOT_B
    # resample means vary and bracket the point estimate
    point = ev["value"].map(lambda v: round(v * 100)).sum() / len(ev) / 100
    assert min(means) < point < max(means)
    assert len(set(round(m, 9) for m in means)) > 1
