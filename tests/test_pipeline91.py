"""Independent-reference tests for the round-8 pipeline91 operators."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from messikinesisprovider_spark.operators import pipeline91

SF = "/root/testdata/sf0.001"

_SIX = Decimal("1.000000")


def _dec6(x: float) -> Decimal:
    # both engines CAST the double to DECIMAL(18,6) before summing
    return Decimal(x).quantize(_SIX, rounding=ROUND_HALF_UP)


def _digest(values, k):
    """Deterministic scaled-rank digest: values pre-sorted with tiebreak."""
    n = len(values)
    cents = {}
    for rn0, x in enumerate(values):
        cl = k * rn0 // n
        cnt, s = cents.get(cl, (0, Decimal(0)))
        cents[cl] = (cnt + 1, s + _dec6(x))
    return cents


def test_quantile_digest_matches_python_replay(spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li = li[li["l_extendedprice"].notna() & li["l_shipdate"].notna()]
    li = li.assign(s=pd.to_datetime(li["l_shipdate"]).dt.month)
    got = {
        r["l_returnflag"]: r
        for r in pipeline91.sketch_quantile_digest_merge(spark, SF).collect()
    }
    assert set(got) == set(li["l_returnflag"].unique())
    for g, gdf in li.groupby("l_returnflag"):
        row = got[g]
        assert row["n_rows"] == len(gdf)
        # level-1 digests per month, merged by union + weight re-cluster
        cents = []  # (mean, s, cl, cnt, sum)
        for s, sdf in gdf.groupby("s"):
            vals = sdf.sort_values(
                ["l_extendedprice", "l_orderkey", "l_linenumber"]
            )["l_extendedprice"].tolist()
            for cl, (cnt, tot) in _digest(vals, pipeline91._QD_K1).items():
                cents.append((float(tot) / cnt, int(s), cl, cnt, tot))
        cents.sort(key=lambda c: (c[0], c[1], c[2]))
        ntot = sum(c[3] for c in cents)
        mcents = {}
        cum = 0
        for mean, s, cl, cnt, tot in cents:
            mcl = pipeline91._QD_K2 * cum // ntot
            c0, s0 = mcents.get(mcl, (0, Decimal(0)))
            mcents[mcl] = (c0 + cnt, s0 + tot)
            cum += cnt
        assert row["n_centroids_merged"] == len(mcents)
        mlist = sorted(
            ((float(tot) / cnt, cnt) for cnt, tot in mcents.values()),
            key=lambda c: c[0],
        )
        for p in pipeline91._QD_PCTS:
            target = (p * ntot + 99) // 100
            cum = 0
            est = None
            for mean, cnt in mlist:
                cum += cnt
                if cum >= target:
                    est = mean
                    break
            # Both engines ROUND a double by scaling (floor(x*1e6 + 0.5));
            # Python round() is half-even over the exact binary value and
            # disagrees one ulp below the midpoint — replicate the engines.
            est6 = math.floor(est * 1e6 + 0.5) / 1e6
            assert row[f"est_p{p}_merged"] == pytest.approx(est6, abs=1e-9)
        # the tolerance assertion really holds (the oracle hardcodes TRUE)
        assert row["merged_within_tol"] is True
        assert row["direct_within_tol"] is True
        for p in pipeline91._QD_PCTS:
            exact = row[f"exact_p{p}"]
            for suffix in ("merged", "direct"):
                assert abs(row[f"est_p{p}_{suffix}"] - exact) <= (
                    pipeline91._QD_TOL * abs(exact)
                )


def _unit_vecs(sf):
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    vecs = {}
    for r in emb.itertuples():
        v = [float(x) for x in r.embedding]
        n = math.sqrt(sum(x * x for x in v))
        if n > 0:
            vecs[r.vec_id] = (v, n)
    return vecs


def test_contamination_embedding_recall_floor_and_replay(spark):
    vecs = _unit_vecs(SF)
    thr = pipeline91.EMBED_COS_THRESHOLD
    n_eval = pipeline91._N_EVAL

    def cos(a, b):
        (va, na), (vb, nb) = vecs[a], vecs[b]
        return sum(x * y for x, y in zip(va, vb)) / (na * nb)

    # brute-force ground truth: corpus vectors with >= 1 eval match
    brute = {}
    for c in vecs:
        if c < n_eval:
            continue
        best = None
        for q in vecs:
            if q >= n_eval:
                continue
            s = cos(c, q)
            if s >= thr and (best is None or (-s, q) < (-best[1], best[0])):
                best = (q, s)
        if best:
            brute[c] = best
    got = {
        r["corpus_id"]: (r["eval_id"], r["cos_sim"])
        for r in pipeline91.contamination_check_embedding(spark, SF).collect()
    }
    assert brute, "no contaminated vectors at this SF — the check is vacuous"
    # the exact broadcast scan is recall 1.0 AND precision 1.0: exact match
    assert set(got) == set(brute)
    for c, (q, s) in got.items():
        bq, bs = brute[c]
        assert q == bq
        assert s == pytest.approx(round(bs, 6), abs=1e-9)
