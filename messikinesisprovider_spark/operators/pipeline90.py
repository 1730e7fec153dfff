"""Round 7 additions, part 3: binary embedding quantization, proximity
retrieval, and token-budget corpus sharding.

- ``embedding_binary_quantize_recall``: 1-bit (sign) quantization of the
  64-d embeddings into two 32-bit words, Hamming-distance top-k per query,
  with the exact cosine attached for recall auditing. Binary quantization
  is the production memory/speed path for billion-vector search (32x
  smaller than float32, XOR+popcount distance); the words are built by an
  integer fold so ANSI mode can never overflow (two 32-bit words, not one
  64-bit accumulate).
- ``bm25_phrase_proximity``: proximity-aware retrieval — for the corpus'
  two most frequent terms (chosen deterministically from the data), score
  each document containing both by pair frequency over (1 + min token
  distance). The min-distance join is bounded by per-document term
  frequency, never corpus size.
- ``shard_token_budget_pack``: sequential token-budget sharding — docs in
  doc_id order, running token estimate (n_chars/4, integer), shard index =
  floor(preceding-tokens / budget). This is the layout step a training run
  uses to cut a corpus into ~equal-token shards while preserving order
  (corpus_shard_plan is the hash twin: parallel-friendly, order-free);
  the global running sum uses the two-pass range ranking, no
  single-partition window.

Reference parity note: the reference engine (SURVEY.md §0) has no
analytics surface; these extend the batch side per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .relational import tbl
from .similarity import N_QUERIES, _unit_vectors

# ---------------------------------------------------------------------------
# embedding_binary_quantize_recall
# ---------------------------------------------------------------------------

_BQ_TOPK = 5

# v >= 0 -> bit 1. Word 1 = dims 1..32, word 2 = dims 33..64 (1-indexed in
# DuckDB, 0-indexed in Spark); fold acc*2+bit stays within 32 bits so ANSI
# overflow checking never fires.
_BQ_WORD_DUCK = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), range({lo}, {hi})), "
    "(acc, i) -> acc * 2 + CASE WHEN v[i] >= 0 THEN 1 ELSE 0 END)"
)
_BQ_WORD_SPARK = (
    "aggregate(sequence({lo}, {hi}), 0L, "
    "(acc, i) -> acc * 2L + CASE WHEN v[i] >= 0 THEN 1L ELSE 0L END)"
)

_BQ_ORACLE = f"""
WITH e0 AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
),
e AS (SELECT * FROM e0 WHERE nrm > 0),
b AS (
  SELECT vec_id, v, nrm,
         {_BQ_WORD_DUCK.format(lo=1, hi=33)} AS w1,
         {_BQ_WORD_DUCK.format(lo=33, hi=65)} AS w2
  FROM e
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(bit_count(CAST(xor(q.w1, c.w1) AS BIGINT))
            + bit_count(CAST(xor(q.w2, c.w2) AS BIGINT)) AS BIGINT) AS hamming,
         CAST(ROUND(list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i]))
                    / (q.nrm * c.nrm), 6) AS DOUBLE) AS cos_sim
  FROM b q JOIN b c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, hamming, cos_sim, rnk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY hamming, neighbor_id) AS BIGINT) AS rnk
  FROM scored
) WHERE rnk <= {_BQ_TOPK}
"""


@register(
    "embedding_binary_quantize_recall",
    oracle=_BQ_ORACLE,
    description=f"1-bit (sign) embedding quantization into two 32-bit words; "
    f"Hamming top-{_BQ_TOPK} per query via XOR+popcount with exact cosine "
    "attached — the 32x-compressed search path next to embedding_quantize_int8",
    tags=("similarity", "quantization", "ann", "extension"),
)
def embedding_binary_quantize_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization is one codegen'd fold per vector (no shuffle); the
    Hamming scan is two XOR+popcount ops per pair — at 100 TB the words
    live as two BIGINT columns (16 bytes/vector vs 512), the query side is
    broadcast, and the exact-cosine rerank touches ONLY the Hamming top-k:
    the pair shuffle into the per-query window carries (ids, hamming) — 24
    bytes — and the survivors (n_queries x k rows) are broadcast back
    against the embedding table to fetch both vectors for the rerank
    (round-7 verdict item 6; previously the cosine was computed for every
    scanned pair below the window)."""
    e = _unit_vectors(tbl(spark, sf_dir, "embeddings"))
    b = e.select(
        "vec_id",
        "v",
        "nrm",
        F.expr(_BQ_WORD_SPARK.format(lo=0, hi=31)).alias("w1"),
        F.expr(_BQ_WORD_SPARK.format(lo=32, hi=63)).alias("w2"),
    )
    q = b.select("vec_id", "w1", "w2").filter(F.col("vec_id") < N_QUERIES).alias("q")
    c = b.select("vec_id", "w1", "w2").alias("c")
    hamming = (
        F.bit_count(F.col("q.w1").bitwiseXOR(F.col("c.w1")))
        + F.bit_count(F.col("q.w2").bitwiseXOR(F.col("c.w2")))
    ).cast("long")
    scored = c.join(
        F.broadcast(q), F.col("c.vec_id") != F.col("q.vec_id")
    ).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        hamming.alias("hamming"),
    )
    w = W.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    topk = scored.withColumn("rnk", F.row_number().over(w).cast("long")).filter(
        F.col("rnk") <= _BQ_TOPK
    )
    vecs = b.select("vec_id", "v", "nrm")
    qv = F.broadcast(vecs.filter(F.col("vec_id") < N_QUERIES)).alias("qv")
    cv = vecs.alias("cv")
    cos = F.round(
        F.expr("aggregate(zip_with(qv.v, cv.v, (x, y) -> x * y), 0D, (acc, p) -> acc + p)")
        / (F.col("qv.nrm") * F.col("cv.nrm")),
        6,
    ).cast("double")
    return (
        F.broadcast(topk)
        .join(qv, F.col("query_id") == F.col("qv.vec_id"))
        .join(cv, F.col("neighbor_id") == F.col("cv.vec_id"))
        .select("query_id", "neighbor_id", "hamming", cos.alias("cos_sim"), "rnk")
    )


# ---------------------------------------------------------------------------
# bm25_phrase_proximity
# ---------------------------------------------------------------------------

_PROX_TOPK = 20

_PROX_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS w,
         UNNEST(range(1, 1 + len(string_split(text, ' ')))) AS p
  FROM documents WHERE text IS NOT NULL
),
top2 AS (
  SELECT w, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w) AS r
  FROM toks GROUP BY w
),
ta AS (SELECT doc_id, p FROM toks WHERE w = (SELECT w FROM top2 WHERE r = 1)),
tb AS (SELECT doc_id, p FROM toks WHERE w = (SELECT w FROM top2 WHERE r = 2)),
prox AS (
  SELECT ta.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(MIN(abs(ta.p - tb.p)) AS BIGINT) AS min_dist
  FROM ta JOIN tb USING (doc_id)
  GROUP BY ta.doc_id
)
SELECT doc_id, n_pairs, min_dist,
       CAST(ROUND(CAST(n_pairs AS DOUBLE) / (1.0 + CAST(min_dist AS DOUBLE)), 6)
            AS DOUBLE) AS prox_score
FROM prox
ORDER BY prox_score DESC, doc_id
LIMIT {_PROX_TOPK}
"""


@register(
    "bm25_phrase_proximity",
    oracle=_PROX_ORACLE,
    description="Proximity-aware retrieval: for the corpus' two most frequent "
    "terms, score docs containing both by pair count over (1 + min token "
    f"distance); top-{_PROX_TOPK} — the phrase/nearness refinement next to bm25_topk",
    tags=("text", "retrieval", "extension"),
)
def bm25_phrase_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positions come from one posexplode (the inverted-index-with-positions
    layout); the per-document distance join is bounded by per-doc term
    frequency. At 100 TB the term filter hits the posting lists of exactly
    two terms — a partition-pruned fraction of the index, never the corpus."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("p0", "w")
    ).select("doc_id", "w", (F.col("p0") + 1).cast("long").alias("p"))
    # global rank via the two-pass range ranking (never a partitionless
    # window, even on a micro-table — the verify-skill convention)
    from .ranking import global_row_number

    counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    ranked_w, _ = global_row_number(counts, [F.col("n").desc(), F.col("w")], rn_col="r")
    top2 = ranked_w.filter(F.col("r") <= 2)
    # 2-row dimension: broadcast-join the term filter into the token scan
    ta = toks.join(
        F.broadcast(top2.filter(F.col("r") == 1).select("w")), "w"
    ).select("doc_id", F.col("p").alias("pa"))
    tb = toks.join(
        F.broadcast(top2.filter(F.col("r") == 2).select("w")), "w"
    ).select("doc_id", F.col("p").alias("pb"))
    prox = (
        ta.join(tb, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.min(F.abs(F.col("pa") - F.col("pb"))).cast("long").alias("min_dist"),
        )
    )
    return (
        prox.select(
            "doc_id",
            "n_pairs",
            "min_dist",
            F.round(
                F.col("n_pairs").cast("double")
                / (F.lit(1.0) + F.col("min_dist").cast("double")),
                6,
            ).cast("double").alias("prox_score"),
        )
        .orderBy(F.col("prox_score").desc(), "doc_id")
        .limit(_PROX_TOPK)
    )


# ---------------------------------------------------------------------------
# shard_token_budget_pack
# ---------------------------------------------------------------------------

_PACK_BUDGET = 20_000  # tokens per shard


_PACK_ORACLE = f"""
WITH d AS (
  SELECT doc_id, (coalesce(n_chars, 0) + 3) // 4 AS toks
  FROM documents
),
c AS (
  SELECT doc_id, toks,
         CAST(COALESCE(SUM(toks) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS before
  FROM d
)
SELECT CAST(before // {_PACK_BUDGET} AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(toks) AS BIGINT) AS tokens,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc,
       CAST(MAX(doc_id) AS BIGINT) AS last_doc
FROM c GROUP BY 1
"""


@register(
    "shard_token_budget_pack",
    oracle=_PACK_ORACLE,
    description=f"Sequential token-budget sharding: docs in doc_id order, "
    f"shard = floor(preceding-token-sum / {_PACK_BUDGET}) — the order-"
    "preserving layout twin of corpus_shard_plan's hash sharding",
    tags=("curation", "layout", "extension"),
)
def shard_token_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The running token sum is the two-pass range-partitioned ranking
    (per-partition partials + driver-side integer offsets), so the global
    prefix sum never funnels through one partition — the same plan that
    assigns byte offsets when writing sharded training data at 100 TB."""
    from .ranking import global_row_number

    d = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        ((F.coalesce(F.col("n_chars"), F.lit(0)) + 3) / 4).cast("long").alias("toks"),
    )
    ranked, _ = global_row_number(
        d, [F.col("doc_id")], rn_col="rn", running_sums={"toks": "cum"}
    )
    return (
        ranked.select(
            "doc_id", "toks", (F.col("cum") - F.col("toks")).alias("before")
        )
        .groupBy(F.expr(f"before DIV {_PACK_BUDGET}").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("toks").cast("long").alias("tokens"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        )
    )
