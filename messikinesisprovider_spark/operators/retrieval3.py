"""Retrieval / substring-dedup / model-scoring operators (round 3c).

Three more LLM-pipeline primitives, all expression-only (no row UDFs in the
hot path) and all with bit-exact DuckDB oracles:

- ``bm25_topk``: inverted-index BM25 ranking (tf, df, length normalization,
  top-k). Score arithmetic is scaled-integer rational (the classic
  ``(N-df+0.5)/(df+0.5)`` idf without the log, k1=1.2 / b=0.75 folded into
  one integer fraction), so Spark's shuffle aggregation and DuckDB agree
  bit-for-bit — a production deployment would swap the rational idf for
  ``F.ln`` at the one marked line, keeping the identical plan shape.
- ``dedup_winnowing_overlap``: substring-level near-duplicate pairs via
  winnowing fingerprint Jaccard (Schleimer/Wilkerson/Aiken, the MOSS
  algorithm) — catches partial overlap/containment that whole-document
  MinHash misses. Candidate generation is bucketed by fingerprint with a
  hot-fingerprint document-frequency cap, mirroring the shingle-cap guard in
  dedup_ngram_jaccard; the only shuffles are on the fingerprint key.
- ``quality_hashed_linear``: fastText-shaped linear quality scorer over
  feature-hashed word bigrams. Weights are derived from the portable 60-bit
  hash (a stand-in for a learned weight table that keeps the oracle exact);
  the plumbing — bigram featurization, hash-bucketing, per-doc additive
  score, keep/drop gate — is the production shape and stays entirely inside
  whole-stage codegen.

Reference parity note: the reference engine (a Kinesis-protocol streaming
provider) has no retrieval surface; these extend the batch analytics side
the way its users run corpus curation, per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import tbl
from .text import WINNOW_K, WINNOW_W, _WINNOW_ORACLE, winnowing_fingerprints

# ---------------------------------------------------------------------------
# BM25 top-k
# ---------------------------------------------------------------------------

BM25_QUERY_TERMS = ("spark", "vector", "hash")
BM25_TOPK = 50

# Tokenization shared by all three operators: lowercase, split on single
# spaces, drop empties. Spark `filter(split(...))` and DuckDB `list_filter(
# string_split(...))` produce identical token lists for any input.
_TOKS_SPARK = "filter(split(lower(text), ' '), t -> t <> '')"
_TOKS_DUCK = "list_filter(string_split(lower(text), ' '), t -> t <> '')"


def _terms_sql(quote: str = "'") -> str:
    return ", ".join(f"{quote}{t}{quote}" for t in BM25_QUERY_TERMS)


# Scaled-integer BM25 with k1 = 1.2, b = 0.75 and rational idf:
#   idf      = (N - df + 0.5) / (df + 0.5)            -> *1e3, integer div
#   tf_part  = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
# Multiplying tf_part through by 10*avgdl (avgdl in milli-tokens so the
# numbers stay integral and corpus-size-independent):
#   tf_part  = 22*tf*avgdl_m / (10*tf*avgdl_m + 3*avgdl_m + 9000*dl)  -> *1e6
# Operating envelope for int64 (pinned by the overflow test): per-term
# tf × avgdl <= 4e8 token² (e.g. tf <= 400k at a 1k-token average doc) and
# corpus size N <= 4e9 documents; beyond that widen the two products to
# DECIMAL(38,0). The 1e-3 idf quantization is far below any rank-relevant
# score gap.
_BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents
),
docs AS (
  SELECT doc_id, len(toks) AS dl, toks FROM toks
),
corpus AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS total_tokens FROM docs
),
avg_dl AS (
  SELECT n_docs, (total_tokens * 1000) // n_docs AS avgdl_m FROM corpus
),
tf AS (
  SELECT doc_id, t, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(toks) AS t FROM docs)
  WHERE t IN ({_terms_sql()})
  GROUP BY doc_id, t
),
df AS (
  SELECT t, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY t
),
scored AS (
  SELECT tf.doc_id,
         SUM(
           CAST(((2 * (a.n_docs - df.df) + 1) * 1000) // (2 * df.df + 1) AS BIGINT)
           * CAST((22 * tf.tf * a.avgdl_m * 1000000)
                  // (10 * tf.tf * a.avgdl_m + 3 * a.avgdl_m + 9000 * d.dl) AS BIGINT)
         ) AS score_scaled
  FROM tf
  JOIN df ON df.t = tf.t
  JOIN docs d ON d.doc_id = tf.doc_id
  CROSS JOIN avg_dl a
  GROUP BY tf.doc_id
)
SELECT doc_id, CAST(score_scaled AS BIGINT) AS score_scaled
FROM scored
ORDER BY score_scaled DESC, doc_id
LIMIT {BM25_TOPK}
"""


@register(
    "bm25_topk",
    oracle=_BM25_ORACLE,
    description=f"BM25 top-{BM25_TOPK} over query terms {BM25_QUERY_TERMS} "
    "(scaled-integer rational idf; bit-exact cross-engine)",
    tags=("retrieval", "bm25", "text", "extension"),
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index scoring as three hash aggregations + one broadcast.

    Plan shape at scale: tokenize+explode (map-side), tf groupBy on
    (doc_id, term) — the only large shuffle; df is a 3-row aggregate and the
    corpus totals a 1-row aggregate, both broadcast back. Top-k is
    TakeOrderedAndProject (no global window/sort). Swap the idf factor for
    ``F.ln`` where marked to get textbook BM25 at the cost of float
    cross-engine drift.
    """
    scored = bm25_scored(spark, sf_dir)
    return (
        scored.select("doc_id", F.col("score_scaled").cast("bigint").alias("score_scaled"))
        .orderBy(F.col("score_scaled").desc(), "doc_id")
        .limit(BM25_TOPK)
    )


def bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BM25-scored document set (doc_id, score_scaled) before top-k —
    shared by bm25_topk and the RRF hybrid fusion (pipeline7)."""
    d = tbl(spark, sf_dir, "documents")
    docs = d.select("doc_id", F.expr(_TOKS_SPARK).alias("toks")).select(
        "doc_id", F.size("toks").alias("dl"), "toks"
    )
    corpus = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
    ).select("n_docs", F.expr("(total_tokens * 1000) div n_docs").alias("avgdl_m"))
    tf = (
        docs.select("doc_id", "dl", F.explode("toks").alias("t"))
        .filter(F.col("t").isin(*BM25_QUERY_TERMS))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    df_t = tf.groupBy("t").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(df_t), "t")
        .crossJoin(F.broadcast(corpus))
        # idf * tf_part, both pre-scaled by 1e6 via integer division.
        # Production variant: replace the idf factor with
        # round(ln((n_docs - df + 0.5) / (df + 0.5) + 1) * 1e6).
        .withColumn(
            "part",
            F.expr(
                "((2 * (n_docs - df) + 1) * 1000 div (2 * df + 1))"
                " * ((22 * tf * avgdl_m * 1000000)"
                "    div (10 * tf * avgdl_m + 3 * avgdl_m + 9000 * dl))"
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("part").alias("score_scaled"))
    )
    return scored


# ---------------------------------------------------------------------------
# Winnowing-fingerprint near-duplicate pairs (substring-level dedup)
# ---------------------------------------------------------------------------

WINNOW_DF_CAP = 128  # fingerprints shared by more docs than this are boilerplate
WINNOW_JACCARD_T = 0.25


# The oracle reuses text_winnowing's exact replication of the rolling
# Karp-Rabin hash + rightmost-min windowing (text.py), then pairs documents
# through the same capped fingerprint buckets. `sel` below is the final CTE
# of _WINNOW_ORACLE (doc_id, h, idx); we re-open it as fingerprint sets.
_WINNOW_CTES = _WINNOW_ORACLE.split(")\nSELECT d.doc_id")[0] + ")"

_WINNOW_OVERLAP_ORACLE = f"""
{_WINNOW_CTES},
fp AS (SELECT DISTINCT doc_id, h FROM sel),
sizes AS (SELECT doc_id, COUNT(*) AS n_fp FROM fp GROUP BY doc_id),
hot AS (SELECT h FROM fp GROUP BY h HAVING COUNT(*) > {WINNOW_DF_CAP}),
cold AS (SELECT fp.doc_id, fp.h FROM fp WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.h = fp.h)),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM cold a JOIN cold b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT p.doc_a, p.doc_b, p.n_shared,
       ROUND(CAST(p.n_shared AS DOUBLE) / (sa.n_fp + sb.n_fp - p.n_shared), 6) AS jaccard
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
WHERE CAST(p.n_shared AS DOUBLE) / (sa.n_fp + sb.n_fp - p.n_shared) >= {WINNOW_JACCARD_T}
"""


@register(
    "dedup_winnowing_overlap",
    oracle=_WINNOW_OVERLAP_ORACLE,
    description=f"Substring-level near-dup pairs: winnowing (k={WINNOW_K}, w={WINNOW_W}) "
    f"fingerprint Jaccard >= {WINNOW_JACCARD_T}, hot-fingerprint cap {WINNOW_DF_CAP}",
    tags=("dedup", "winnowing", "fingerprint", "extension"),
)
def dedup_winnowing_overlap(
    spark: SparkSession, sf_dir: str, df_cap: int = WINNOW_DF_CAP
) -> DataFrame:
    """Partial-overlap/containment detection MinHash cannot express: two
    documents sharing any sufficiently long substring (>= K+W-1 chars) share
    a winnowed fingerprint, and the pair's fingerprint-set Jaccard measures
    how much of their *content* overlaps, not how similar their full texts
    are.

    Scale shape: candidate generation is an equi self-join on the
    fingerprint value — shuffle on `h` only, no all-pairs stage. Fingerprints
    above the document-frequency cap (boilerplate: headers, licence blocks)
    are dropped from pairing via a broadcast anti-join, the same quadratic
    guard as dedup_ngram_jaccard's hot-shingle cap; per-doc set sizes are
    computed before the cap so capped boilerplate lowers, never raises, the
    reported Jaccard.
    """
    d = tbl(spark, sf_dir, "documents")
    # Persist the fingerprint table: the self-join reads it twice and the
    # size/hot aggregates once more — without materialization each consumer
    # recomputes the winnowing UDF. Same production shape as MinHash
    # signatures: fingerprints are written out once, joined thereafter.
    fps = winnowing_fingerprints(d).select(
        "doc_id", F.array_distinct("fps").alias("fps")
    ).persist()
    docfp = fps.select("doc_id", F.explode("fps").alias("h"))
    sizes = fps.select("doc_id", F.size("fps").alias("n_fp"))
    hot = (
        docfp.groupBy("h")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") > df_cap)
        .select("h")
    )
    cold = docfp.join(F.broadcast(hot), "h", "left_anti")
    a = cold.alias("a")
    b = cold.alias("b")
    pairs = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("n_b"))
    jac = F.col("n_shared").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_shared")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= WINNOW_JACCARD_T)
        .select("doc_a", "doc_b", "n_shared", F.round(jac, 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# Feature-hashed linear quality scorer
# ---------------------------------------------------------------------------

_HL_BUCKETS = 2001  # weight w(h) = (h % 2001) - 1000 in [-1000, 1000]


_HASHED_LINEAR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents
),
bigrams AS (
  SELECT doc_id,
         UNNEST(list_transform(range(0, GREATEST(0, len(toks) - 1)),
                               i -> toks[i + 1] || ' ' || toks[i + 2])) AS bg
  FROM toks
),
feat AS (
  SELECT doc_id, ({h60_duck('bg')} % {_HL_BUCKETS}) - 1000 AS w FROM bigrams
),
scored AS (
  SELECT doc_id, SUM(w) AS score FROM feat GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(s.score, 0) AS BIGINT) AS score,
       COALESCE(s.score, 0) > 0 AS keep
FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
"""


@register(
    "quality_hashed_linear",
    oracle=_HASHED_LINEAR_ORACLE,
    description="Feature-hashed bigram linear quality scorer (fastText-shaped) "
    "with keep/drop gate; pure codegen expressions",
    tags=("quality", "text", "model-scoring", "extension"),
)
def quality_hashed_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The plan a learned linear quality filter compiles to at 100 TB:
    bigram featurization and hash-bucketing as codegen expressions, one
    map-side-combined groupBy on doc_id, no model server and no Python in
    the loop. Weights here are hash-derived ((h mod 2001) - 1000) so the
    DuckDB oracle is bit-exact; a trained model ships its weight table as a
    broadcast map lookup in the same plan.
    """
    d = tbl(spark, sf_dir, "documents")
    bigrams = (
        d.select("doc_id", F.expr(_TOKS_SPARK).alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "CASE WHEN size(toks) >= 2 THEN "
                    "transform(sequence(0, size(toks) - 2), "
                    "i -> concat(toks[i], ' ', toks[i+1])) "
                    "ELSE array() END"
                )
            ).alias("bg"),
        )
    )
    scored = bigrams.select(
        "doc_id", F.expr(f"({h60_spark('bg')} % {_HL_BUCKETS}) - 1000").alias("w")
    ).groupBy("doc_id").agg(F.sum("w").alias("score"))
    return (
        d.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("score", F.lit(0)).cast("bigint").alias("score"),
            (F.coalesce("score", F.lit(0)) > 0).alias("keep"),
        )
    )
