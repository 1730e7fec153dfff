"""Round 8 additions, part 4: b-bit minwise hashing.

``dedup_minhash_bbit`` (Li & König, WWW'10 "b-Bit Minwise Hashing"): store
only the lowest b=2 bits of each of the 64 minhash values — 16 bytes/doc
instead of 512, the storage-bound signature path at 100 TB (the text twin
of ``embedding_binary_quantize_recall``'s 1-bit embeddings). Two-bit
collisions happen by chance 1/4 of the time, so the unbiased estimator
de-biases the agreement fraction:

    J_hat = (A/64 - 1/4) / (1 - 1/4) = (A - 16) / 48   (clamped at 0)

Candidates come from the SAME 16x4 banding as ``dedup_minhash_lsh`` (so
the b-bit estimator is evaluated against the full 64-value estimator on an
identical pair set — the fidelity audit a team runs before switching the
production store to b bits); both estimators ride in the output as exact
integer agreement counts plus one-division doubles, and the oracle
replicates signatures, banding, clipping and both estimators bit-for-bit.

Reference parity note: the reference engine (SURVEY.md §0) has no
analytics surface; this extends the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import (
    MAX_BAND_BUCKET,
    MINHASH_EST_THRESHOLD,
    _A_SQL,
    _B_SQL,
    _H_MOD,
    _MERSENNE_P,
    _N_BANDS,
    _N_HASHES,
    _ROWS_PER_BAND,
    _SHINGLES_DUCK,
    bind1,
    h60_duck,
    minhash_signatures,
)
from .relational import tbl

_BBIT = 2
_BMASK = (1 << _BBIT) - 1  # s % 4 == s & 3


_BBIT_ORACLE = f"""
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
bandv AS (
  SELECT doc_id, i // {_ROWS_PER_BAND} AS band,
         string_agg(s::VARCHAR, ',' ORDER BY i) AS bucket
  FROM sig GROUP BY doc_id, i // {_ROWS_PER_BAND}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bandv a JOIN bandv b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
est AS (
  SELECT p.doc_a, p.doc_b,
         CAST(SUM(CASE WHEN sa.s = sb.s THEN 1 ELSE 0 END) AS BIGINT) AS agree_full,
         CAST(SUM(CASE WHEN sa.s % {_BMASK + 1} = sb.s % {_BMASK + 1}
                  THEN 1 ELSE 0 END) AS BIGINT) AS agree_bbit
  FROM pairs p
  JOIN sig sa ON sa.doc_id = p.doc_a
  JOIN sig sb ON sb.doc_id = p.doc_b AND sb.i = sa.i
  GROUP BY p.doc_a, p.doc_b
)
SELECT doc_a, doc_b, agree_full, agree_bbit,
       CAST(ROUND(agree_full / {_N_HASHES}.0, 6) AS DOUBLE) AS est_full,
       CAST(ROUND(GREATEST(agree_bbit - {_N_HASHES // 4}, 0)
                  / {_N_HASHES - _N_HASHES // 4}.0, 6) AS DOUBLE) AS est_bbit
FROM est WHERE agree_full / {_N_HASHES}.0 >= {MINHASH_EST_THRESHOLD}
"""


@register(
    "dedup_minhash_bbit",
    oracle=_BBIT_ORACLE,
    description=f"b-bit minwise hashing (b={_BBIT}, Li & König WWW'10): "
    f"lowest {_BBIT} bits of each of {_N_HASHES} minhash values — 16 "
    "bytes/doc — with the de-biased estimator (A-16)/48 evaluated against "
    "the full 64-value estimator on the SAME banded candidate pairs; the "
    "fidelity audit before compressing the signature store",
    tags=("dedup", "minhash", "compression", "extension"),
)
def dedup_minhash_bbit(
    spark: SparkSession, sf_dir: str, max_bucket_size: int = MAX_BAND_BUCKET
) -> DataFrame:
    """Same persisted-signature + slim-band-join plan as dedup_minhash_lsh
    (hot buckets anti-joined out above the cap); the b-bit agreement is one
    extra zip_with over the already-fetched signature pair — at 100 TB the
    point is that SEARCH runs on the 16-byte signatures while this audit
    keeps the full values only long enough to measure the fidelity."""
    d = tbl(spark, sf_dir, "documents")
    sigs = minhash_signatures(d).persist()
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                bind1(
                    "sig",
                    "sg",
                    f"transform(sequence(0, {_N_BANDS - 1}), "
                    f"b -> concat_ws(',', sg[{_ROWS_PER_BAND}*b], sg[{_ROWS_PER_BAND}*b+1], "
                    f"sg[{_ROWS_PER_BAND}*b+2], sg[{_ROWS_PER_BAND}*b+3]))",
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
    agree_full = F.expr(
        "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))"
    ).cast("long")
    agree_bbit = F.expr(
        f"size(filter(zip_with(sig_a, sig_b, (x, y) -> x % {_BMASK + 1} = y % {_BMASK + 1}), v -> v))"
    ).cast("long")
    out = cand.select(
        "doc_a",
        "doc_b",
        agree_full.alias("agree_full"),
        agree_bbit.alias("agree_bbit"),
    )
    est_full = F.round(F.col("agree_full") / F.lit(float(_N_HASHES)), 6).cast("double")
    est_bbit = F.round(
        F.greatest(F.col("agree_bbit") - F.lit(_N_HASHES // 4), F.lit(0))
        / F.lit(float(_N_HASHES - _N_HASHES // 4)),
        6,
    ).cast("double")
    return (
        out.withColumn("est_full", est_full)
        .withColumn("est_bbit", est_bbit)
        .filter(F.col("agree_full") / F.lit(float(_N_HASHES)) >= MINHASH_EST_THRESHOLD)
    )
