"""Python references for pipeline45 (round 4): DiD estimator, Benford
audit, winsorized/trimmed means."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from messikinesisprovider_spark.operators import pipeline45

SF = "/root/testdata/sf0.001"


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _events():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["ts"] = pd.to_datetime(ev["ts"])
    return ev


def test_diff_in_diff_matches_pandas(spark):
    r = pipeline45.diff_in_diff_estimate(spark, SF).collect()[0]
    ev = _events()
    ev = ev[ev["value"].notna() & ev["user_id"].notna()]
    boundary = pd.Timestamp(pipeline45._DID_BOUNDARY)
    treated = ev["user_id"].map(lambda u: h60(f"trt|{u}") % 2 == 1)
    post = ev["ts"] >= boundary
    means = {}
    for t in (0, 1):
        for p in (0, 1):
            cell = ev[(treated == bool(t)) & (post == bool(p))]
            tag = f"{'t' if t else 'c'}{'_post' if p else '_pre'}"
            assert r[f"n_{tag}"] == len(cell)
            m = cell["value"].sum() / len(cell)
            assert abs(r[f"mean_{tag}"] - m) < 1e-9, tag
            means[(t, p)] = r[f"mean_{tag}"]
    did = (means[(1, 1)] - means[(1, 0)]) - (means[(0, 1)] - means[(0, 0)])
    assert abs(r["did_estimate"] - did) < 1e-12
    # all four cells populated — the 2x2 design is non-vacuous
    assert min(r[f"n_{t}"] for t in ("c_pre", "c_post", "t_pre", "t_post")) > 0


def test_benford_matches_python_first_digits(spark):
    rows = {r["digit"]: r for r in pipeline45.benford_first_digit_audit(spark, SF).collect()}
    ev = _events()
    vals = ev["value"][(ev["value"].notna()) & (ev["value"] > 0) & (ev["value"] < 1e6)]
    digits = [int(str(float(v)).lstrip("0.").lstrip("0")[0]) for v in vals]
    counts = pd.Series(digits).value_counts().to_dict()
    n = sum(counts.values())
    assert sorted(rows) == sorted(counts)
    for d, r in rows.items():
        assert r["n_obs"] == counts[d]
        assert abs(r["obs_share"] - counts[d] / n) < 1e-12
        p = math.log10(1 + 1 / d)
        assert r["benford_share"] == p
        assert abs(r["chi2_term"] - (counts[d] - n * p) ** 2 / (n * p)) < 1e-9


def test_winsorized_trimmed_matches_python(spark):
    got = {r["event_type"]: r for r in pipeline45.winsorized_trimmed_mean(spark, SF).collect()}
    ev = _events()
    ev = ev[ev["value"].notna()]
    for et, grp in ev.groupby("event_type"):
        vals = [v for v, _ in sorted(zip(grp["value"], grp["event_id"]), key=lambda t: (t[0], t[1]))]
        n = len(vals)
        k = n // pipeline45._TRIM_PCT
        r = got[et]
        assert (r["n"], r["k_trimmed"]) == (n, k)
        mid = vals[k : n - k]
        assert abs(r["trimmed_mean"] - sum(mid) / len(mid)) < 1e-9
        lo, hi = vals[k], vals[n - k - 1]
        wins = [min(max(v, lo), hi) for v in vals]
        assert abs(r["winsorized_mean"] - sum(wins) / n) < 1e-9
        assert k > 0  # trimming actually happened at this SF
