"""Python-reference tests for pipeline96 (Walsh-Hadamard perceptual hash,
DP noisy release, Hill tail estimator)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from messikinesisprovider_spark.operators.pipeline96 import (
    _DP_EPS,
    _GRID,
    _HILL_K,
    _WH_NCOEF,
    _WH_W,
    _walsh_matrix,
    dp_noisy_count_release,
    image_whash_spectral_dedup,
    token_zipf_hill,
)

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# --------------------------------------------------------------------------
# image_whash_spectral_dedup
# --------------------------------------------------------------------------


def test_walsh_matrix_is_orthogonal_and_sequency_ordered():
    s = np.asarray(_walsh_matrix())
    assert s.shape == (8, 8)
    assert set(np.unique(s)) <= {-1, 1}
    assert (s @ s.T == 8 * np.eye(8, dtype=int)).all()
    changes = [(np.diff(row) != 0).sum() for row in s]
    assert changes == sorted(changes)  # sequency order
    assert (s[0] == 1).all()  # DC row first


def _py_whash(text: str) -> str:
    px = np.array([ord(c) for c in text[:_GRID]], dtype=np.int64)
    w = np.asarray(_WH_W, dtype=np.int64)
    coefs = w @ px
    med = int(np.sort(coefs)[(_WH_NCOEF - 1) // 2])
    return "".join("1" if int(c) > med else "0" for c in coefs)


def test_whash_matches_python_reference(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    eligible = docs[
        docs["text"].notna()
        & docs["text"].map(
            lambda t: isinstance(t, str)
            and len(t) >= _GRID
            and all(0x20 <= ord(c) <= 0x7E for c in t)
        )
    ]
    clusters: dict[str, list[int]] = {}
    for _, r in eligible.iterrows():
        clusters.setdefault(_py_whash(r["text"]), []).append(int(r["doc_id"]))
    expected = {
        h: (len(ids), min(ids), sum(i % 1000003 for i in ids))
        for h, ids in clusters.items()
        if len(ids) > 1
    }
    got = {
        r["whash"]: (r["n_docs"], r["canonical_doc"], r["member_checksum"])
        for r in image_whash_spectral_dedup(spark, SF).collect()
    }
    assert got == expected
    assert expected  # fixture is non-vacuous


# --------------------------------------------------------------------------
# dp_noisy_count_release
# --------------------------------------------------------------------------


def _laplace(u: float) -> float:
    return -(1.0 / _DP_EPS) * math.copysign(1.0, u - 0.5) * math.log(
        1.0 - 2.0 * abs(u - 0.5)
    )


def test_dp_noise_matches_python_replay(spark):
    rows = dp_noisy_count_release(spark, SF).collect()
    assert len(rows) > 50
    n_within = 0
    for r in rows:
        day = r["day"].strftime("%Y-%m-%d")
        u = (_h60(f"{r['event_type']}:{day}") + 0.5) / 2**60
        noise = _laplace(u)
        assert abs(r["noisy_count"] - round(r["true_count"] + noise, 6)) < 1e-9
        assert abs(r["abs_err"] - round(abs(noise), 6)) < 1e-9
        assert r["within_t95"] == (abs(noise) <= math.log(20.0))
        n_within += int(r["within_t95"])
    # the seeded noise really is Laplace-shaped: ~95% inside the t95 bound
    assert n_within / len(rows) > 0.85


def test_dp_release_is_idempotent_and_nontrivial(spark):
    a = {(r["event_type"], r["day"]): r["noisy_count"]
         for r in dp_noisy_count_release(spark, SF).collect()}
    b = {(r["event_type"], r["day"]): r["noisy_count"]
         for r in dp_noisy_count_release(spark, SF).collect()}
    assert a == b  # replay-safe: same groups -> same noise
    errs = [r["abs_err"] for r in dp_noisy_count_release(spark, SF).collect()]
    assert max(errs) > 0.01  # noise is actually applied


# --------------------------------------------------------------------------
# token_zipf_hill
# --------------------------------------------------------------------------


def test_hill_matches_pandas_reference(spark):
    got = {r["source"]: r for r in token_zipf_hill(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs["text"].notna()]
    expected = {}
    for source, grp in docs.groupby("source"):
        freq: dict[str, int] = {}
        for t in grp["text"]:
            for tok in t.split(" "):
                if tok:
                    freq[tok] = freq.get(tok, 0) + 1
        ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
        if len(ranked) <= _HILL_K:
            continue
        f_tail = ranked[_HILL_K][1]
        s = sum(math.log(n / f_tail) for _, n in ranked[:_HILL_K])
        expected[source] = (_HILL_K, f_tail, round(_HILL_K / s, 6))
    assert set(got) == set(expected)
    assert expected
    for source, (k, f_tail, alpha) in expected.items():
        r = got[source]
        assert r["k_used"] == k
        assert r["f_tail"] == f_tail
        assert abs(r["alpha_hill"] - alpha) < 1e-6
        assert r["alpha_hill"] > 0
