"""Round-3b operators: embedding-LSH dedup, incremental MinHash dedup, and
a KMV distinct sketch — registered AFTER sampling3/verified3 (append-only
registry order).

All three are exactly oracle-checked: hash-seeded machinery uses the
portable 60-bit md5 hash (dedup.h60_spark/h60_duck) or integer hyperplane
literals embedded in the SQL, so DuckDB replicates candidate generation —
not just the final answer — and the compare holds regardless of recall.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import JACCARD_THRESHOLD, h60_duck, h60_spark, minhash_signatures
from .dedup import EMBED_COS_THRESHOLD
from .relational import events_tbl, spread, tbl

# ---------------------------------------------------------------------------
# Embedding near-dup at scale: random-hyperplane LSH + exact cosine rescore.
# ---------------------------------------------------------------------------

# 16 hyperplanes with small INTEGER coefficients (a Rademacher-style random
# projection): integer literals keep the oracle SQL compact and make the
# dot products deterministic in both engines (same IEEE ops, same fold
# order). 16 sign bits → 4 chunks of 4 bits; candidates share >= 1 chunk.
_N_PLANES = 16
_EMBED_DIM = 64
_PLANE_CHUNKS = 4
_BITS_PER_CHUNK = _N_PLANES // _PLANE_CHUNKS

_rng = np.random.default_rng(777)
_PLANES = _rng.integers(-3, 4, size=(_N_PLANES, _EMBED_DIM))
# avoid all-zero rows (degenerate plane)
for _i in range(_N_PLANES):
    if not _PLANES[_i].any():
        _PLANES[_i, 0] = 1


def _plane_dot_spark(p: np.ndarray) -> str:
    # x[i] are floats; integer coefficients multiply exactly. Skip zero
    # coefficients to shorten the expression; addition order is ascending
    # dimension in BOTH engines (explicit chain here, matching the oracle).
    terms = [
        f"(CAST(v[{i}] AS DOUBLE) * {int(c)})" for i, c in enumerate(p) if c != 0
    ]
    return " + ".join(terms)


def _plane_dot_duck(p: np.ndarray) -> str:
    terms = [f"(v[{i + 1}] * {int(c)})" for i, c in enumerate(p) if c != 0]
    return " + ".join(terms)


def _sig_expr_spark() -> str:
    bits = [
        f"(CASE WHEN {_plane_dot_spark(_PLANES[b])} > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(_N_PLANES)
    ]
    return " + ".join(bits)


def _sig_expr_duck() -> str:
    bits = [
        f"(CASE WHEN {_plane_dot_duck(_PLANES[b])} > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(_N_PLANES)
    ]
    return " + ".join(bits)


_EMBED_LSH_ORACLE = f"""
WITH e0 AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
),
e AS (SELECT * FROM e0 WHERE nrm > 0),
sig AS (SELECT vec_id, v, nrm, {_sig_expr_duck()} AS sig FROM e),
chunks AS (
  SELECT vec_id, sig, r.c, (sig >> ({_BITS_PER_CHUNK} * r.c)) & {(1 << _BITS_PER_CHUNK) - 1} AS cv
  FROM sig CROSS JOIN (SELECT UNNEST(range(0, {_PLANE_CHUNKS})) AS c) r
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM chunks a JOIN chunks b ON a.c = b.c AND a.cv = b.cv AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b,
       CAST(ROUND(list_sum(list_transform(range(1, {_EMBED_DIM + 1}),
                  i -> ea.v[i] * eb.v[i])) / (ea.nrm * eb.nrm), 6) AS DOUBLE) AS cos_sim
FROM cand c
JOIN e ea ON ea.vec_id = c.vec_a
JOIN e eb ON eb.vec_id = c.vec_b
WHERE list_sum(list_transform(range(1, {_EMBED_DIM + 1}),
              i -> ea.v[i] * eb.v[i])) / (ea.nrm * eb.nrm) >= {EMBED_COS_THRESHOLD}
"""


@register(
    "dedup_embedding_lsh",
    oracle=_EMBED_LSH_ORACLE,
    description="Embedding near-dup at scale: 16-bit random-hyperplane LSH "
    "(4x4 chunk banding) candidates, exact-cosine rescore at the same "
    "threshold as the O(n^2) baseline",
    tags=("dedup", "embedding", "lsh", "extension"),
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path the O(n²) `dedup_embedding_cosine` guard points at:
    candidate volume is controlled by the 4-bit chunk buckets (≈ n²/16 per
    chunk under a random signature model, and far less when the data
    clusters), and only candidates pay the exact-cosine rescore. The
    hyperplanes are integer literals replicated verbatim in the oracle, so
    DuckDB reproduces the EXACT candidate set — the compare doesn't depend
    on LSH recall. tests/test_extensions.py additionally measures recall
    against the exact baseline.

    Scale: signature computation is one scan (expression-only); the
    candidate join shuffles slim (chunk, bucket) rows; the rescore joins
    vectors back for candidate pairs only.
    """
    e = tbl(spark, sf_dir, "embeddings")
    withn = spread(e).select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
        F.expr(
            "sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (acc, x) -> acc + x))"
        ).alias("nrm"),
    ).filter(F.col("nrm") > 0)  # cosine undefined for zero-norm vectors
    sigs = withn.select("vec_id", F.expr(_sig_expr_spark()).alias("sig")).persist()
    chunks = sigs.select(
        "vec_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {_PLANE_CHUNKS - 1}), "
                f"c -> shiftright(sig, {_BITS_PER_CHUNK} * c) & {(1 << _BITS_PER_CHUNK) - 1})"
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
    ea = withn.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    eb = withn.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    dot = F.expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, p) -> acc + p)")
    cos = dot / (F.col("na") * F.col("nb"))
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .filter(cos >= EMBED_COS_THRESHOLD)
        .select("vec_a", "vec_b", F.round(cos, 6).cast("double").alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# Incremental MinHash dedup: new ingest batch vs the historical corpus.
# ---------------------------------------------------------------------------

from .dedup import (  # noqa: E402  (shared constants of the minhash pipeline)
    _A_SQL,
    _B_SQL,
    _H_MOD,
    _MERSENNE_P,
    _N_HASHES,
    _ROWS_PER_BAND,
    _SHINGLES_DUCK,
    MINHASH_EST_THRESHOLD,
)

_INC_MINHASH_ORACLE = f"""
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
  SELECT DISTINCT n.doc_id AS new_doc, h.doc_id AS hist_doc
  FROM bandv n JOIN bandv h
    ON n.band = h.band AND n.bucket = h.bucket
  WHERE n.doc_id % 5 = 0 AND h.doc_id % 5 != 0
),
est AS (
  SELECT p.new_doc, p.hist_doc,
         SUM(CASE WHEN sa.s = sb.s THEN 1 ELSE 0 END) * 1.0 / {_N_HASHES} AS e
  FROM pairs p
  JOIN sig sa ON sa.doc_id = p.new_doc
  JOIN sig sb ON sb.doc_id = p.hist_doc AND sb.i = sa.i
  GROUP BY p.new_doc, p.hist_doc
)
SELECT new_doc, CAST(COUNT(*) AS BIGINT) AS n_hist_matches,
       MIN(hist_doc) AS first_match,
       CAST(ROUND(MAX(e), 6) AS DOUBLE) AS max_est_jaccard
FROM est WHERE e >= {MINHASH_EST_THRESHOLD}
GROUP BY new_doc
"""


@register(
    "dedup_incremental_minhash",
    oracle=_INC_MINHASH_ORACLE,
    description="Incremental near-dup gate: new ingest batch (doc_id%5=0) "
    "LSH-banded against the historical corpus signature table; per new doc "
    "the matched-history verdict",
    tags=("dedup", "minhash", "incremental", "extension"),
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production shape of corpus-scale NEAR-dup (the fuzzy twin of
    `dedup_incremental_exact`): history keeps a compact signature/band
    table (in production: materialized once, appended per ingest); each new
    batch bands its own signatures and joins new-bands x hist-bands — cost
    proportional to the BATCH, never all-pairs. Output is the per-new-doc
    verdict a drop/keep gate consumes. The oracle replicates the whole
    pipeline (portable hash + literal hash family), so the compare is
    exact.
    """
    d = tbl(spark, sf_dir, "documents")
    sigs = minhash_signatures(d).persist()
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {_N_HASHES // _ROWS_PER_BAND - 1}), "
                f"b -> concat_ws(',', sig[{_ROWS_PER_BAND}*b], sig[{_ROWS_PER_BAND}*b+1], "
                f"sig[{_ROWS_PER_BAND}*b+2], sig[{_ROWS_PER_BAND}*b+3]))"
            )
        ).alias("band", "bucket"),
    )
    new_b = bands.filter(F.col("doc_id") % 5 == 0).alias("n")
    hist_b = bands.filter(F.col("doc_id") % 5 != 0).alias("h")
    pairs = (
        new_b.join(
            hist_b,
            (F.col("n.band") == F.col("h.band")) & (F.col("n.bucket") == F.col("h.bucket")),
        )
        .select(F.col("n.doc_id").alias("new_doc"), F.col("h.doc_id").alias("hist_doc"))
        .dropDuplicates(["new_doc", "hist_doc"])
    )
    sa = sigs.select(F.col("doc_id").alias("new_doc"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("hist_doc"), F.col("sig").alias("sig_b"))
    est = (
        F.expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))")
        * F.lit(1.0)
        / F.lit(_N_HASHES)
    )
    scored = (
        pairs.join(sa, "new_doc")
        .join(sb, "hist_doc")
        .withColumn("e", est)
        .filter(F.col("e") >= MINHASH_EST_THRESHOLD)
    )
    return scored.groupBy("new_doc").agg(
        F.count(F.lit(1)).alias("n_hist_matches"),
        F.min("hist_doc").alias("first_match"),
        F.round(F.max("e"), 6).cast("double").alias("max_est_jaccard"),
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch with the portable hash.
# ---------------------------------------------------------------------------

_KMV_K = 64
_H60_SPACE = float(1 << 60)


@register(
    "sketch_kmv_distinct",
    oracle=f"""
    WITH h AS (
      -- user_id IS NOT NULL on both sides: a NULL hash would sort
      -- differently between engines (Spark NULLS FIRST vs DuckDB NULLS LAST)
      SELECT DISTINCT event_type, {h60_duck('CAST(user_id AS VARCHAR)')} AS hv
      FROM events WHERE user_id IS NOT NULL
    ),
    ranked AS (
      SELECT event_type, hv,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rnk,
             COUNT(*) OVER (PARTITION BY event_type) AS n_distinct
      FROM h
    )
    SELECT event_type,
           CAST(n_distinct AS BIGINT) AS n_exact,
           CAST(hv AS BIGINT) AS kth_min,
           CAST(CASE WHEN n_distinct <= {_KMV_K} THEN n_distinct * 1.0
                ELSE ({_KMV_K} - 1) * {_H60_SPACE} / hv END AS DOUBLE) AS est_kmv
    FROM ranked
    WHERE rnk = CASE WHEN n_distinct < {_KMV_K} THEN n_distinct ELSE {_KMV_K} END
    """,
    description=f"KMV (k={_KMV_K} minimum hash values) distinct-count sketch "
    "per event_type, with the exact count alongside — portable hash, exact "
    "cross-engine compare",
    tags=("sketch", "approx", "extension"),
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable distinct sketch whose state is just k integers: keep the
    k smallest hash values per group; estimate (k-1) * |hash space| / kth_min.
    Unlike HLL (engine-specific registers), KMV over the portable hash is
    bit-reproducible in DuckDB, so the sketch itself is oracle-checked — the
    estimator error model is then a measurable property, not a trust-me.
    At scale the per-group state is bounded (k values) and merges by
    keep-k-smallest-of-union; here the k-th minimum comes from a partitioned
    window over the DISTINCT hash set (group-keyed shuffle, no global sort).
    """
    from pyspark.sql.window import Window as W

    ev = events_tbl(spark, sf_dir)
    h = (
        ev.filter(F.col("user_id").isNotNull())
        .select(
            "event_type",
            F.expr(h60_spark("CAST(user_id AS STRING)")).alias("hv"),
        )
        .dropDuplicates(["event_type", "hv"])
    )
    w = W.partitionBy("event_type").orderBy("hv")
    ranked = h.select(
        "event_type",
        "hv",
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).alias("n_distinct"),
    )
    kth = ranked.filter(
        F.col("rnk")
        == F.when(F.col("n_distinct") < _KMV_K, F.col("n_distinct")).otherwise(
            F.lit(_KMV_K)
        )
    )
    est = F.when(
        F.col("n_distinct") <= _KMV_K, F.col("n_distinct") * F.lit(1.0)
    ).otherwise(F.lit(float(_KMV_K - 1)) * F.lit(_H60_SPACE) / F.col("hv"))
    return kth.select(
        "event_type",
        F.col("n_distinct").cast("bigint").alias("n_exact"),
        F.col("hv").cast("bigint").alias("kth_min"),
        est.cast("double").alias("est_kmv"),
    )
