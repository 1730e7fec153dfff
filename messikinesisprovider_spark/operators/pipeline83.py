"""Round 6 additions, part 4: adaptive-band MinHash LSH (the scale path for
``dedup_minhash_lsh`` — round-5 verdict item 3).

The audit this round measured the fixed 16-bands x 4-rows banding across
three decades (see SCALING.md / ROUND6_NOTES.md): candidate-pair volume is
~1.4e-5 * N²/2 at every decade — the per-pair band-collision probability
(b * J̄^r for background Jaccard J̄ ≈ 0.03 on this corpus) is a constant of
the DATA, not of the corpus size, so candidates grow QUADRATICALLY
(2.1k → 173k → 16.9M pairs at 500 → 5k → 50k docs) even though the
MAX_BAND_BUCKET skew cap never bites (max bucket 117 < 1000 — the collisions
are spread across many small buckets, which a size cap cannot see).

The fix is the same integer threshold ladder knn_graph_adaptive /
semdedup_adaptive use, applied to the BAND WIDTH r (rows per band): the
background collision probability falls geometrically in r (J̄^r), so one
ladder step per ~decade holds expected random candidates ~constant while
true near-duplicates (J >= 0.8) stay detectable:

    r = 4, b = 16  for N <=   5,000   (EXACTLY dedup_minhash_lsh)
    r = 8, b =  8  for N <= 500,000   (J=0.9 recall 0.98; J=0.8 recall 0.77)
    r = 16, b = 4  beyond             (J=0.9 recall 0.57 per pass)

This is the real production trade: at corpus scale the S-curve MUST sharpen
or the candidate join drowns — systems that keep recall instead add hashes
(128/256) and keep r high; the signature stays 64 wide here so the ladder
degenerates bit-for-bit to the fixed query at driver scale (test-pinned).
Measured on the synthetic decades: 16.9M candidates (fixed) -> 57 (adaptive,
r=8) at 50k docs, with every surviving pair still estimator-checked against
the same MINHASH_EST_THRESHOLD.

The DuckDB oracle replicates the ENTIRE pipeline including the width
choice (a CASE over COUNT(*) of the signature table — the same count the
Spark side uses), so the driver verifies the sizing decision itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import (
    _A_SQL,
    _B_SQL,
    _H_MOD,
    _MERSENNE_P,
    _N_HASHES,
    _SHINGLES_DUCK,
    MAX_BAND_BUCKET,
    MINHASH_EST_THRESHOLD,
    bind1,
    h60_duck,
    minhash_signatures,
)
from .relational import tbl

# (threshold, rows_per_band): smallest r whose threshold covers N.
_BAND_LADDER = [(5_000, 4), (500_000, 8)]
_MAX_ROWS_PER_BAND = 16


def _rows_per_band_for(n: int) -> int:
    for limit, r in _BAND_LADDER:
        if n <= limit:
            return r
    return _MAX_ROWS_PER_BAND


_RPB_CASE_SQL = (
    "CASE "
    + " ".join(f"WHEN n <= {limit} THEN {r}" for limit, r in _BAND_LADDER)
    + f" ELSE {_MAX_ROWS_PER_BAND} END"
)

_MINHASH_ADAPTIVE_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, UNNEST(list_distinct({_SHINGLES_DUCK})) AS g FROM documents
),
hv AS (
  SELECT doc_id, {h60_duck('g')} % {_H_MOD} AS h FROM sh
),
idx AS (SELECT UNNEST(range(0, {_N_HASHES})) AS i),
sig AS (
  SELECT doc_id, idx.i,
         MIN((list_extract({_A_SQL}, idx.i + 1) * hv.h
              + list_extract({_B_SQL}, idx.i + 1)) % {_MERSENNE_P}) AS s
  FROM hv CROSS JOIN idx
  GROUP BY doc_id, idx.i
),
w AS (
  SELECT {_RPB_CASE_SQL} AS r
  FROM (SELECT COUNT(DISTINCT doc_id) AS n FROM sig)
),
bandv AS (
  SELECT doc_id, i // w.r AS band,
         string_agg(s::VARCHAR, ',' ORDER BY i) AS bucket
  FROM sig CROSS JOIN w GROUP BY doc_id, i // w.r
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bandv a JOIN bandv b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
est AS (
  SELECT p.doc_a, p.doc_b,
         SUM(CASE WHEN sa.s = sb.s THEN 1 ELSE 0 END) * 1.0 / {_N_HASHES} AS e
  FROM pairs p
  JOIN sig sa ON sa.doc_id = p.doc_a
  JOIN sig sb ON sb.doc_id = p.doc_b AND sb.i = sa.i
  GROUP BY p.doc_a, p.doc_b
)
SELECT doc_a, doc_b, CAST(ROUND(e, 6) AS DOUBLE) AS est_jaccard
FROM est WHERE e >= {MINHASH_EST_THRESHOLD}
"""


@register(
    "dedup_minhash_adaptive",
    oracle=_MINHASH_ADAPTIVE_ORACLE,
    description="MinHash LSH with ADAPTIVE band width: rows-per-band grows "
    "with corpus size (integer ladder 4/8/16 over the 64-hash signature) so "
    "background candidate collisions stay ~constant instead of quadratic; "
    "degenerates to dedup_minhash_lsh's exact output at N<=5000; the width "
    "choice is replicated in the oracle",
    tags=("dedup", "minhash", "lsh", "scale", "extension"),
)
def dedup_minhash_adaptive(
    spark: SparkSession, sf_dir: str, max_bucket_size: int = MAX_BAND_BUCKET
) -> DataFrame:
    """Identical plan shape to dedup_minhash_lsh (persisted signature table,
    slim banded self-join behind the skew cap, estimator re-attach) with one
    difference: the band width is a function of the corpus size, chosen by
    integer comparisons on the signature-table count — the same count the
    oracle's ladder CTE computes, so the engines can never disagree at a
    boundary. The count is an index-build metadata read on a table that is
    persisted and reused twice anyway."""
    d = tbl(spark, sf_dir, "documents")
    sigs = minhash_signatures(d).persist()
    n = sigs.count()  # index-build metadata read (persisted, reused below)
    rpb = _rows_per_band_for(n)
    n_bands = _N_HASHES // rpb
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                bind1(
                    "sig",
                    "sg",
                    f"transform(sequence(0, {n_bands - 1}), "
                    f"b -> concat_ws(',', "
                    + ", ".join(f"sg[{rpb} * b + {j}]" for j in range(rpb))
                    + "))",
                )
            )
        ).alias("band", "bucket"),
    )
    hot_buckets = (
        bands.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") > max_bucket_size)
        .select("band", "bucket")
    )
    bands = bands.join(F.broadcast(hot_buckets), ["band", "bucket"], "left_anti")
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    cand = pairs.join(sa, "doc_a").join(sb, "doc_b")
    est = (
        F.expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))")
        * F.lit(1.0)
        / F.lit(_N_HASHES)
    )
    return (
        cand.withColumn("est_jaccard", F.round(est, 6).cast("double"))
        .filter(F.col("est_jaccard") >= MINHASH_EST_THRESHOLD)
        .select("doc_a", "doc_b", "est_jaccard")
    )
