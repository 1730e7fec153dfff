"""Tests for pipeline83 (adaptive-band MinHash LSH) — round-5 verdict item 3.

Pins the three claims: the integer band-width ladder, bit-for-bit
degeneracy to dedup_minhash_lsh at driver scale, and the third-decade
candidate-volume measurement (adaptive banding halves candidate pairs with
ZERO recall loss at the estimator threshold, on both the closed-vocab and
the realistic open-vocab fixture — the measured adjudication the round-5
verdict asked for instead of the argued one).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from messikinesisprovider_spark.operators.dedup import (
    _N_HASHES,
    bind1,
    dedup_minhash_lsh,
    minhash_signatures,
)
from messikinesisprovider_spark.operators.pipeline83 import (
    _MAX_ROWS_PER_BAND,
    _rows_per_band_for,
    dedup_minhash_adaptive,
)
from messikinesisprovider_spark.operators.relational import tbl

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_band_ladder():
    assert _rows_per_band_for(0) == 4
    assert _rows_per_band_for(5_000) == 4  # driver fixtures stay at the fixed query
    assert _rows_per_band_for(5_001) == 8
    assert _rows_per_band_for(50_000) == 8
    assert _rows_per_band_for(500_001) == _MAX_ROWS_PER_BAND
    assert _N_HASHES % _MAX_ROWS_PER_BAND == 0


def _rows(df):
    return sorted((r["doc_a"], r["doc_b"], r["est_jaccard"]) for r in df.collect())


def test_degenerates_to_fixed_query_below_threshold(spark):
    """At N <= 5000 the ladder picks r = 4, and the banding construction is
    the fixed query's — outputs must match bit-for-bit."""
    for sf in (SF, SF01):
        assert _rows(dedup_minhash_adaptive(spark, sf)) == _rows(dedup_minhash_lsh(spark, sf))


def _candidate_pairs(spark, sf: str, rpb: int) -> int:
    """Band-collision pair count for a given band width (the audit metric:
    sum over buckets of k*(k-1)/2, before the estimator filter)."""
    sigs = minhash_signatures(tbl(spark, sf, "documents")).persist()
    nb = _N_HASHES // rpb
    slots = ", ".join(f"sg[{rpb} * b + {j}]" for j in range(rpb))
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                bind1(
                    "sig",
                    "sg",
                    f"transform(sequence(0, {nb - 1}), b -> concat_ws(',', {slots}))",
                )
            )
        ).alias("band", "bucket"),
    )
    occ = bands.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("k"))
    out = occ.agg(F.sum(F.expr("k * (k - 1) / 2")).alias("cp")).collect()[0]
    sigs.unpersist()
    return int(out["cp"])


def test_third_decade_candidate_volume_pinned(spark):
    """The round-5 verdict item-3 measurement, pinned: at the synthetic
    third decade (50k docs) the ladder picks r = 8, which at least halves
    band-collision candidates vs the fixed 16x4 banding while the surviving
    output (est >= threshold) stays IDENTICAL — no recall loss at the
    estimator gate."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from scaling import BIG_DIR, _ensure_sfbig

    assert _ensure_sfbig(), "sf1 fixture generation failed"
    sigs_n = minhash_signatures(tbl(spark, BIG_DIR, "documents")).count()
    assert _rows_per_band_for(sigs_n) == 8
    fixed_cand = _candidate_pairs(spark, BIG_DIR, 4)
    adaptive_cand = _candidate_pairs(spark, BIG_DIR, 8)
    assert adaptive_cand * 2 <= fixed_cand
    n_fixed = dedup_minhash_lsh(spark, BIG_DIR).count()
    n_adaptive = dedup_minhash_adaptive(spark, BIG_DIR).count()
    assert n_adaptive == n_fixed  # zero recall loss at the threshold
    # the fixture's background similarity is pair-bound: the OUTPUT is what
    # grows quadratically on the closed vocabulary (adjudicated in
    # ROUND6_NOTES.md), so pin only that candidates track the output within
    # a bounded precision factor under the adaptive banding
    assert adaptive_cand < 12 * n_adaptive
