"""Tests for pipeline94 (b-bit minwise hashing, Li & König WWW'10).

Pins the three claims: (1) the candidate set and the full 64-value
estimator are bit-for-bit those of ``dedup_minhash_lsh`` (same signatures,
same 16x4 banding, same threshold filter) — the b-bit column is a strict
extension of the production query; (2) the de-biased estimator is the
exact rational (A-16)/48 clamped at 0, replayed in python from the
collected signatures; (3) on the fixture the b=2 estimator tracks the
full estimator within the binomial error you'd accept before switching
the signature store to 16 bytes/doc.
"""

from __future__ import annotations

from messikinesisprovider_spark.operators.dedup import (
    _N_HASHES,
    dedup_minhash_lsh,
    minhash_signatures,
)
from messikinesisprovider_spark.operators.pipeline94 import (
    _BBIT,
    _BMASK,
    dedup_minhash_bbit,
)
from messikinesisprovider_spark.operators.relational import tbl

SF = "/root/testdata/sf0.001"


def test_same_pairs_and_full_estimator_as_lsh(spark):
    """(doc_a, doc_b, est_full) must equal dedup_minhash_lsh's output —
    the audit rides on the production candidate set, it doesn't invent one."""
    bbit = sorted(
        (r["doc_a"], r["doc_b"], r["est_full"])
        for r in dedup_minhash_bbit(spark, SF).collect()
    )
    lsh = sorted(
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in dedup_minhash_lsh(spark, SF).collect()
    )
    assert bbit == lsh
    assert len(bbit) > 0


def test_debiased_estimator_python_replay(spark):
    """agree_bbit and est_bbit replayed from the collected signatures."""
    assert _BBIT == 2 and _BMASK == 3
    sigs = {
        r["doc_id"]: r["sig"]
        for r in minhash_signatures(tbl(spark, SF, "documents")).collect()
    }
    denom = _N_HASHES - _N_HASHES // 4  # 48
    rows = dedup_minhash_bbit(spark, SF).collect()
    assert rows
    for r in rows:
        sa, sb = sigs[r["doc_a"]], sigs[r["doc_b"]]
        agree_full = sum(1 for x, y in zip(sa, sb) if x == y)
        agree_bbit = sum(1 for x, y in zip(sa, sb) if x & _BMASK == y & _BMASK)
        assert r["agree_full"] == agree_full
        assert r["agree_bbit"] == agree_bbit
        expect = round(max(agree_bbit - _N_HASHES // 4, 0) / denom, 6)
        assert abs(r["est_bbit"] - expect) < 1e-12
        assert 0.0 <= r["est_bbit"] <= 1.0


def test_bbit_tracks_full_estimator(spark):
    """Fidelity: mean |est_bbit - est_full| over the candidate set stays
    inside the b=2 binomial noise floor (sd ~ sqrt(3/4 * 1/4 / 48) ~ 0.06
    per pair at J=0); the audit exists to measure exactly this number."""
    rows = dedup_minhash_bbit(spark, SF).collect()
    devs = [abs(r["est_bbit"] - r["est_full"]) for r in rows]
    assert sum(devs) / len(devs) < 0.10
    # and the estimator is not degenerate: it separates near-dups from the floor
    hi = [r["est_bbit"] for r in rows if r["est_full"] >= 0.9]
    lo = [r["est_bbit"] for r in rows if r["est_full"] <= 0.3]
    if hi and lo:
        assert min(hi) > max(lo)
