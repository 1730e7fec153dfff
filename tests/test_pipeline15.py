"""Semantic tests for pipeline15 (k-means Lloyd step, per-group OLS,
chi-square drift bins) against sequential python references."""

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

from messikinesisprovider_spark.operators import pipeline15
from messikinesisprovider_spark.operators.relational import events_tbl, tbl

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _q6(x: float) -> int:
    # round half away from zero at 1e-6 resolution — the engines' round()
    return int(Decimal(x * 1000000.0).quantize(Decimal(1), rounding=ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# kmeans_lloyd_step
# ---------------------------------------------------------------------------


def _kmeans_ref(spark):
    rows = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in tbl(spark, SF, "embeddings").collect()
        if r["embedding"] is not None and len(r["embedding"]) == 64
    ]
    cent = sorted(rows, key=lambda t: (_h60(str(t[0])), t[0]))[: pipeline15.N_KMEANS_CELLS]
    out = {}
    for vid, v in rows:
        best = None
        for cid, cv in cent:
            d = 0.0
            for i in range(64):
                d += (cv[i] - v[i]) * (cv[i] - v[i])  # same ascending fold
            if best is None or (d, cid) < best[:2]:
                best = (d, cid, cv)
        _, cid, cv = best
        for i in range(64):
            key = (cid, i + 1)
            n, s, oldq = out.get(key, (0, 0, _q6(cv[i])))
            out[key] = (n + 1, s + _q6(v[i]), oldq)
    return out


def test_kmeans_step_matches_python(spark):
    ref = _kmeans_ref(spark)
    got = pipeline15.kmeans_lloyd_step(spark, SF).collect()
    assert len(got) == len(ref)
    for r in got:
        n, s, oldq = ref[(r["cid"], r["dim"])]
        assert (r["n_members"], r["sum_q6"], r["old_q6"]) == (n, s, oldq)
        assert r["new_coord"] == s / (n * 1000000.0)
        assert r["delta"] == r["new_coord"] - oldq / 1000000.0
    # every corpus vector lands in exactly one cell: member mass conserved
    n_vectors = sum(n for (cid, dim), (n, _, _) in ref.items() if dim == 1)
    total = len([r for r in got if r["dim"] == 1])
    assert total == pipeline15.N_KMEANS_CELLS or total == len(
        {cid for (cid, _) in ref}
    )
    assert sum(r["n_members"] for r in got if r["dim"] == 1) == n_vectors


# ---------------------------------------------------------------------------
# ols_per_group
# ---------------------------------------------------------------------------


def test_ols_matches_python_moments(spark):
    evs = [
        (r["event_type"], r["ts"].hour, r["value"])
        for r in events_tbl(spark, SF).collect()
        if r["value"] is not None and r["ts"] is not None
    ]
    groups = {}
    for et, x, y in evs:
        g = groups.setdefault(et, [0, 0, 0, Decimal(0), Decimal(0)])
        g[0] += 1
        g[1] += x
        g[2] += x * x
        g[3] += Decimal(y).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        g[4] += Decimal(x * y).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    got = {r["event_type"]: r for r in pipeline15.ols_per_group(spark, SF).collect()}
    assert set(got) == set(groups)
    for et, (n, sx, sxx, sy, sxy) in groups.items():
        r = got[et]
        assert r["n"] == n
        assert r["sum_x"] == float(sx)
        assert abs(r["sum_y"] - float(sy)) < 1e-9
        nd, sxf, sxxf, syf, sxyf = float(n), float(sx), float(sxx), float(sy), float(sxy)
        if n >= 2 and nd * sxxf - sxf * sxf > 0:
            slope = (nd * sxyf - sxf * syf) / (nd * sxxf - sxf * sxf)
            assert abs(r["slope"] - slope) < 1e-12
            assert abs(r["intercept"] - (syf - slope * sxf) / nd) < 1e-12
        else:
            assert r["slope"] is None


# ---------------------------------------------------------------------------
# drift_chisquare_bins
# ---------------------------------------------------------------------------


def test_drift_bins_match_python(spark):
    evs = [
        (r["event_type"], r["value"], r["ts"])
        for r in events_tbl(spark, SF).collect()
        if r["value"] is not None and r["ts"] is not None
    ]
    import datetime

    def us(ts):
        return int(ts.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)

    times = [us(t) for _, _, t in evs]
    lo, hi = min(times), max(times)
    counts = {}
    for et, v, t in evs:
        b = int(min(max(math.floor(v / pipeline15._BIN_WIDTH), 0.0), pipeline15._N_BINS - 1))
        ref = 1 if us(t) * 2 < lo + hi else 0
        k = (et, b)
        nr, nc = counts.get(k, (0, 0))
        counts[k] = (nr + ref, nc + (1 - ref))
    t_ref, t_cur = {}, {}
    for (et, b), (nr, nc) in counts.items():
        t_ref[et] = t_ref.get(et, 0) + nr
        t_cur[et] = t_cur.get(et, 0) + nc
    got = {
        (r["event_type"], r["bin"]): r
        for r in pipeline15.drift_chisquare_bins(spark, SF).collect()
    }
    assert set(got) == set(counts)
    for (et, b), (nr, nc) in counts.items():
        r = got[(et, b)]
        assert (r["n_ref"], r["n_cur"], r["t_ref"], r["t_cur"]) == (
            nr, nc, t_ref[et], t_cur[et],
        )
        if nr > 0 and t_ref[et] > 0 and t_cur[et] > 0:
            num = float(nc) * t_ref[et] - float(nr) * t_cur[et]
            assert r["chi2_contrib"] == num * num / (float(nr) * t_cur[et] * t_ref[et])
        else:
            assert r["chi2_contrib"] is None
    # the two windows partition the corpus
    assert sum(nr + nc for nr, nc in counts.values()) == len(evs)
