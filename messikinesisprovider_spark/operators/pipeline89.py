"""Round 7 additions, part 2: late-interaction retrieval, MMR
diversification, unigram-LM vocabulary pruning, and one rank-1 ALS round.

- ``colbert_maxsim_retrieval``: late-interaction scoring (ColBERT,
  Khattab & Zaharia, SIGIR 2020 arXiv:2004.12832): documents are
  MULTI-vector (4 consecutive embedding rows form one mv-doc), and
  score(q, d) = sum over query vectors of max over doc vectors of cosine.
  The max is exact; the sum of the 4 per-query-vector maxima uses the
  proven value-sorted sequential fold, so ranking is oracle-exact.
- ``mmr_diversified_topk``: Maximal Marginal Relevance re-ranking
  (Carbonell & Goldstein, SIGIR 1998): 3 greedy picks unrolled over the
  top-20 cosine candidates, each step argmax of rel - 0.5 * max-sim to
  the already-picked set. The candidate set is bounded (top-k from the
  retrieval stage), so the unrolled steps are micro-joins regardless of
  corpus size — at 100 TB only the candidate generation (ANN) scales.
- ``tokenizer_vocab_prune``: the prune half of unigram-LM tokenizer
  training (SentencePiece, Kudo arXiv:1804.10959): score candidate
  pieces (character 2..4-grams) by exact integer saved-length
  (freq * (len-1)), drop the bottom quartile by global rank
  (two-pass range ranking — no single-partition window), report the
  kept/pruned boundary per piece length.
- ``als_rank1_round``: one full alternating-least-squares round on the
  implicit user x event_type count matrix at rank 1 (Koren/Bell/Volinsky,
  IEEE Computer 2009). With unit item-factor init, the closed-form
  updates collapse to exact INTEGER sums — u_i = rowsum_i / K and
  v_j = K * sum_i(r_ij * rowsum_i) / sum_i(rowsum_i^2) — so the whole
  round is integer-exact with one double division per item at the end.

Reference parity note: the reference engine (SURVEY.md §0) has no
analytics surface; these extend the batch side per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .relational import events_tbl, spread, tbl
from .similarity import _DOT, _unit_vectors

# ---------------------------------------------------------------------------
# colbert_maxsim_retrieval
# ---------------------------------------------------------------------------

_MV_WIDTH = 4  # embedding rows per multi-vector document
_MV_QUERIES = 2  # mv-docs 0..1 are the queries
_MV_TOPK = 5

_COLBERT_ORACLE = f"""
WITH e0 AS (
  SELECT vec_id, vec_id // {_MV_WIDTH} AS mvdoc, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
),
e AS (SELECT * FROM e0 WHERE nrm > 0),
q AS (SELECT * FROM e WHERE mvdoc < {_MV_QUERIES}),
c AS (SELECT * FROM e WHERE mvdoc >= {_MV_QUERIES}),
pair AS (
  SELECT q.mvdoc AS query_doc, q.vec_id AS qvec, c.mvdoc AS cand_doc,
         MAX(CAST(ROUND(list_sum(list_transform(range(1, 65),
                 i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 6) AS DOUBLE)) AS maxsim
  FROM q JOIN c ON true
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT query_doc, cand_doc,
         list_sum(list_sort(list(maxsim))) AS score,
         CAST(COUNT(*) AS BIGINT) AS n_qvecs
  FROM pair GROUP BY 1, 2
)
SELECT query_doc, cand_doc, score, n_qvecs, rnk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_doc
               ORDER BY score DESC, cand_doc) AS BIGINT) AS rnk
  FROM scored
) WHERE rnk <= {_MV_TOPK}
"""


@register(
    "colbert_maxsim_retrieval",
    oracle=_COLBERT_ORACLE,
    description=f"Late-interaction (ColBERT MaxSim) retrieval over multi-vector "
    f"docs ({_MV_WIDTH} vectors each): score = sum over query vectors of max doc-"
    f"vector cosine; top-{_MV_TOPK} per query, exact value-sorted fold",
    tags=("similarity", "retrieval", "multivector", "extension"),
)
def colbert_maxsim_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MaxSim = a vector-pair cosine join, MAX per (query-vector, doc), then
    an order-fixed sum of the per-query-vector maxima. At 100 TB the q x c
    pair join is replaced by per-query-vector ANN candidate generation (the
    sim_ann_* family) feeding the same MAX/SUM reduction — the scoring plan
    here is exactly that reduction, with the bounded query set broadcast."""
    e = _unit_vectors(tbl(spark, sf_dir, "embeddings")).withColumn(
        "mvdoc", F.expr(f"vec_id DIV {_MV_WIDTH}")
    )
    q = e.filter(F.col("mvdoc") < _MV_QUERIES).alias("q")
    c = e.filter(F.col("mvdoc") >= _MV_QUERIES).alias("c")
    cos = F.round(F.expr(_DOT) / (F.col("q.nrm") * F.col("c.nrm")), 6).cast("double")
    pair = (
        c.join(F.broadcast(q))
        .select(
            F.col("q.mvdoc").alias("query_doc"),
            F.col("q.vec_id").alias("qvec"),
            F.col("c.mvdoc").alias("cand_doc"),
            cos.alias("sim"),
        )
        .groupBy("query_doc", "qvec", "cand_doc")
        .agg(F.max("sim").alias("maxsim"))
    )
    scored = pair.groupBy("query_doc", "cand_doc").agg(
        F.expr(
            "aggregate(array_sort(collect_list(maxsim)), 0D, (acc, x) -> acc + x)"
        ).alias("score"),
        F.count(F.lit(1)).cast("long").alias("n_qvecs"),
    )
    w = W.partitionBy("query_doc").orderBy(F.col("score").desc(), "cand_doc")
    return scored.withColumn("rnk", F.row_number().over(w).cast("long")).filter(
        F.col("rnk") <= _MV_TOPK
    )


# ---------------------------------------------------------------------------
# mmr_diversified_topk
# ---------------------------------------------------------------------------

_MMR_CAND = 20
_MMR_LAMBDA_NUM = 1  # penalty weight 0.5 = 1/2 (dyadic: exact scaling)

_MMR_ORACLE = f"""
WITH e0 AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
),
e AS (SELECT * FROM e0 WHERE nrm > 0),
qv AS (SELECT * FROM e WHERE vec_id = 0),
cand0 AS (
  SELECT c.vec_id, c.v, c.nrm,
         CAST(ROUND(list_sum(list_transform(range(1, 65),
             i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 6) AS DOUBLE) AS rel
  FROM e c JOIN qv q ON c.vec_id <> q.vec_id
),
cand AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY rel DESC, vec_id) AS rr FROM cand0
  ) WHERE rr <= {_MMR_CAND}
),
p1 AS (SELECT * FROM cand WHERE rr = 1),
s2 AS (
  SELECT c.vec_id, c.v, c.nrm, c.rel,
         c.rel - 0.5 * CAST(ROUND(list_sum(list_transform(range(1, 65),
             i -> p.v[i] * c.v[i])) / (p.nrm * c.nrm), 6) AS DOUBLE) AS mmr
  FROM cand c JOIN p1 p ON c.vec_id <> p.vec_id
),
p2 AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY mmr DESC, vec_id) AS r2 FROM s2
  ) WHERE r2 = 1
),
s3 AS (
  SELECT c.vec_id, c.rel,
         c.rel - 0.5 * GREATEST(
           CAST(ROUND(list_sum(list_transform(range(1, 65),
               i -> p.v[i] * c.v[i])) / (p.nrm * c.nrm), 6) AS DOUBLE),
           CAST(ROUND(list_sum(list_transform(range(1, 65),
               i -> p2.v[i] * c.v[i])) / (p2.nrm * c.nrm), 6) AS DOUBLE)) AS mmr
  FROM cand c JOIN p1 p ON c.vec_id <> p.vec_id
  JOIN p2 ON c.vec_id <> p2.vec_id
),
p3 AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY mmr DESC, vec_id) AS r3 FROM s3
  ) WHERE r3 = 1
)
SELECT CAST(1 AS BIGINT) AS rnk, vec_id, rel, rel AS mmr_score FROM p1
UNION ALL
SELECT CAST(2 AS BIGINT), vec_id, rel, mmr FROM p2
UNION ALL
SELECT CAST(3 AS BIGINT), vec_id, rel, mmr FROM p3
"""


@register(
    "mmr_diversified_topk",
    oracle=_MMR_ORACLE,
    description="Maximal Marginal Relevance re-ranking (Carbonell 1998): 3 "
    f"greedy picks unrolled over the top-{_MMR_CAND} cosine candidates, "
    "penalty 0.5 * max-sim to the picked set — the RAG diversification stage",
    tags=("similarity", "retrieval", "rerank", "extension"),
)
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate generation is the scaling term (top-k retrieval — here
    brute-force cosine, at 100 TB an ANN index); the greedy MMR loop itself
    touches only the bounded candidate set, so the unrolled picks are
    micro-joins against 1-row broadcast picks, independent of corpus size.

    The windows inside the micro-steps rank the <= 20-row candidate table
    (constant-bounded), partitioned by a literal-free single group — ranked
    via orderBy on the bounded set instead to avoid the single-partition
    window on anything data-sized."""
    e = _unit_vectors(tbl(spark, sf_dir, "embeddings"))
    qv = e.filter(F.col("vec_id") == 0).alias("q")
    c0 = e.filter(F.col("vec_id") != 0).alias("c")
    rel = F.round(F.expr(_DOT) / (F.col("q.nrm") * F.col("c.nrm")), 6).cast("double")
    cand = (
        c0.join(F.broadcast(qv))
        .select(F.col("c.vec_id").alias("vec_id"), F.col("c.v").alias("v"),
                F.col("c.nrm").alias("nrm"), rel.alias("rel"))
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(_MMR_CAND)
    )
    # the candidate table is <= 20 rows: cache-free local iterations via
    # broadcast micro-joins; sims use the same fold/round convention
    def sim(a: str, b: str) -> F.Column:
        return F.round(
            F.expr(f"aggregate(zip_with({a}.v, {b}.v, (x, y) -> x * y), 0D, (acc, p) -> acc + p)")
            / (F.col(f"{a}.nrm") * F.col(f"{b}.nrm")),
            6,
        ).cast("double")

    p1 = cand.orderBy(F.col("rel").desc(), "vec_id").limit(1).alias("p")
    s2 = (
        cand.alias("c")
        .join(F.broadcast(p1), F.col("c.vec_id") != F.col("p.vec_id"))
        .select(
            F.col("c.vec_id").alias("vec_id"), F.col("c.v").alias("v"),
            F.col("c.nrm").alias("nrm"), F.col("c.rel").alias("rel"),
            (F.col("c.rel") - F.lit(0.5) * sim("c", "p")).alias("mmr"),
        )
    )
    p2 = s2.orderBy(F.col("mmr").desc(), "vec_id").limit(1).alias("p2")
    s3 = (
        cand.alias("c")
        .join(F.broadcast(p1), F.col("c.vec_id") != F.col("p.vec_id"))
        .join(F.broadcast(p2), F.col("c.vec_id") != F.col("p2.vec_id"))
        .select(
            F.col("c.vec_id").alias("vec_id"),
            F.col("c.rel").alias("rel"),
            (
                F.col("c.rel")
                - F.lit(0.5) * F.greatest(sim("c", "p"), sim("c", "p2"))
            ).alias("mmr"),
        )
    )
    p3 = s3.orderBy(F.col("mmr").desc(), "vec_id").limit(1)
    out1 = p1.select(
        F.lit(1).cast("long").alias("rnk"), "vec_id", "rel", F.col("rel").alias("mmr_score")
    )
    out2 = p2.select(F.lit(2).cast("long").alias("rnk"), "vec_id", "rel", F.col("mmr").alias("mmr_score"))
    out3 = p3.select(F.lit(3).cast("long").alias("rnk"), "vec_id", "rel", F.col("mmr").alias("mmr_score"))
    return out1.unionByName(out2).unionByName(out3)


# ---------------------------------------------------------------------------
# tokenizer_vocab_prune
# ---------------------------------------------------------------------------

_PRUNE_KEEP_NUM, _PRUNE_KEEP_DEN = 3, 4  # keep top 3/4 by saved-length score

_PRUNE_ORACLE = f"""
WITH words AS (
  SELECT UNNEST(string_split(text, ' ')) AS w
  FROM documents WHERE text IS NOT NULL
),
pieces AS (
  SELECT piece, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (
    SELECT UNNEST(
      flatten(list_transform([2, 3, 4],
        l -> list_transform(range(1, 1 + greatest(0, length(w) - l + 1)),
               i -> substr(w, i, l))))) AS piece
    FROM words
  ) GROUP BY piece
),
scored AS (
  SELECT piece, freq, freq * (length(piece) - 1) AS score FROM pieces
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, piece) AS rn,
         COUNT(*) OVER () AS n_total
  FROM scored
)
SELECT CAST(length(piece) AS BIGINT) AS piece_len,
       CAST(COUNT(*) FILTER (WHERE rn * {_PRUNE_KEEP_DEN} <= n_total * {_PRUNE_KEEP_NUM}) AS BIGINT) AS n_kept,
       CAST(COUNT(*) FILTER (WHERE rn * {_PRUNE_KEEP_DEN} > n_total * {_PRUNE_KEEP_NUM}) AS BIGINT) AS n_pruned,
       CAST(MIN(score) FILTER (WHERE rn * {_PRUNE_KEEP_DEN} <= n_total * {_PRUNE_KEEP_NUM}) AS BIGINT) AS min_kept_score,
       CAST(MAX(score) AS BIGINT) AS max_score
FROM ranked GROUP BY 1
"""


@register(
    "tokenizer_vocab_prune",
    oracle=_PRUNE_ORACLE,
    description="Unigram-LM tokenizer vocabulary prune step (SentencePiece, "
    "Kudo arXiv:1804.10959): candidate 2..4-gram pieces scored by exact "
    "integer saved-length (freq * (len-1)), bottom quartile pruned by global "
    "rank; per-length kept/pruned report",
    tags=("text", "tokenizer", "extension"),
)
def tokenizer_vocab_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Piece mining is explode + map-side-combined count (the BPE-family
    plan); the global prune rank uses the two-pass range ranking so no
    single-partition window touches the piece table. The integer
    saved-length score stands in for the log-likelihood loss (the ranking
    it induces is what the prune step consumes; logs are not portable
    cross-engine)."""
    from .ranking import global_row_number

    # spread(): the 2..4-gram piece explode is CPU-bound map work and the
    # single-file test table scans as ONE partition (gated: skipped at real split
    # counts).
    docs = spread(tbl(spark, sf_dir, "documents")).filter(F.col("text").isNotNull())
    words = docs.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
    pieces = (
        words.select(
            F.explode(
                # Spark's sequence(1, 0) DESCENDS ([1, 0]) instead of being
                # empty, so short words need an explicit CASE guard to match
                # DuckDB's empty range(1, 1) semantics.
                F.expr(
                    "flatten(transform(array(2, 3, 4), "
                    "l -> CASE WHEN length(w) >= l THEN "
                    "transform(sequence(1, length(w) - l + 1), "
                    "i -> substring(w, i, l)) ELSE array() END))"
                )
            ).alias("piece")
        )
        .groupBy("piece")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    scored = pieces.select(
        "piece", "freq", (F.col("freq") * (F.length("piece") - 1)).alias("score")
    )
    ranked, n_total = global_row_number(
        scored, [F.col("score").desc(), F.col("piece")], rn_col="rn"
    )
    kept = F.col("rn") * _PRUNE_KEEP_DEN <= F.lit(n_total * _PRUNE_KEEP_NUM)
    return ranked.groupBy(F.length("piece").cast("long").alias("piece_len")).agg(
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(~kept, 1).otherwise(0)).cast("long").alias("n_pruned"),
        F.min(F.when(kept, F.col("score"))).cast("long").alias("min_kept_score"),
        F.max("score").cast("long").alias("max_score"),
    )


# ---------------------------------------------------------------------------
# als_rank1_round
# ---------------------------------------------------------------------------

_ALS_ORACLE = """
WITH r AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
k AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k FROM r),
rowsum AS (SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS rs FROM r GROUP BY 1),
s2 AS (SELECT CAST(SUM(rs * rs) AS BIGINT) AS s2 FROM rowsum),
s1 AS (
  SELECT r.event_type, CAST(SUM(r.cnt * w.rs) AS BIGINT) AS s1,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM r JOIN rowsum w USING (user_id) GROUP BY 1
)
SELECT s1.event_type, s1.n_users, s1.s1, s2.s2, k.k,
       ROUND(CAST(k.k * s1.s1 AS DOUBLE) / CAST(s2.s2 AS DOUBLE), 6) AS item_factor
FROM s1 CROSS JOIN s2 CROSS JOIN k
"""


@register(
    "als_rank1_round",
    oracle=_ALS_ORACLE,
    description="One full rank-1 ALS round on the implicit user x event_type "
    "count matrix (Koren et al. 2009): unit init collapses both closed-form "
    "updates to exact integer sums — one double division per item at the end",
    tags=("ml", "recommendation", "iterative", "extension"),
)
def als_rank1_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """u_i = rowsum_i / K (exact rational), then
    v_j = K * sum_i(r_ij * rowsum_i) / sum_i(rowsum_i^2): two shuffles on
    user_id (the ratings groupBy and the rowsum join) and two 1-row scalar
    broadcasts (K and the denominator) — the per-round plan an implicit-ALS
    recommender runs at any scale; further rounds repeat it with the
    derived factors as weights."""
    ev = spread(events_tbl(spark, sf_dir)).filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    r = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    k = r.agg(F.count_distinct("event_type").cast("long").alias("k"))
    rowsum = r.groupBy("user_id").agg(F.sum("cnt").cast("long").alias("rs"))
    s2 = rowsum.agg(F.sum(F.col("rs") * F.col("rs")).cast("long").alias("s2"))
    s1 = (
        r.join(rowsum, "user_id")
        .groupBy("event_type")
        .agg(
            F.sum(F.col("cnt") * F.col("rs")).cast("long").alias("s1"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        )
    )
    return (
        s1.crossJoin(F.broadcast(s2))
        .crossJoin(F.broadcast(k))
        .select(
            "event_type",
            "n_users",
            "s1",
            "s2",
            "k",
            F.round(
                (F.col("k") * F.col("s1")).cast("double") / F.col("s2").cast("double"),
                6,
            ).alias("item_factor"),
        )
    )
