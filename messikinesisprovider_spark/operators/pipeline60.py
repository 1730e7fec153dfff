"""Round 4 additions, part 35: Matryoshka truncation recall.

``embedding_matryoshka_recall`` — the eval behind Matryoshka
Representation Learning deployments: how much ANN quality survives when
vectors are truncated to a prefix (here dims 1..8 of 64) to cut index
memory 8x?  For each query vector, exact cosine top-K is computed at
FULL dimension and at the truncated prefix, and the per-query overlap
(recall@K of the truncated ranking against the full one) is the
integer statistic.

Determinism is the sim_topk_bruteforce convention: sequential
`aggregate(zip_with(...))` folds (bit-identical to DuckDB's list_sum
ordering), cosine rounded to 6 decimals, neighbor-id tiebreaks,
zero-norm vectors excluded identically at each dimensionality (a vector
can be zero in the prefix while nonzero overall).  Both rankings ride
the same broadcast-query join; the overlap is an inner join of two
top-K sets, all integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .relational import tbl
from .similarity import N_QUERIES, TOP_K

_TRUNC = 8  # prefix dims kept (of 64)

_DOT_FULL = "aggregate(zip_with(q.v, c.v, (x, y) -> x * y), 0D, (acc, p) -> acc + p)"
_DOT_TRUNC = (
    f"aggregate(zip_with(slice(q.v, 1, {_TRUNC}), slice(c.v, 1, {_TRUNC}), "
    "(x, y) -> x * y), 0D, (acc, p) -> acc + p)"
)

_MATRYOSHKA_ORACLE = f"""
WITH e0 AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm,
         sqrt(list_sum(list_transform(range(1, {_TRUNC} + 1),
                                      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))
           AS nrm8
  FROM embeddings
),
e AS (SELECT * FROM e0 WHERE nrm > 0 AND nrm8 > 0),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(ROUND(list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i]))
                    / (q.nrm * c.nrm), 6) AS DOUBLE) AS cos_full,
         CAST(ROUND(list_sum(list_transform(range(1, {_TRUNC} + 1), i -> q.v[i] * c.v[i]))
                    / (q.nrm8 * c.nrm8), 6) AS DOUBLE) AS cos_trunc
  FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
),
full_k AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos_full DESC, neighbor_id) AS r
    FROM scored) WHERE r <= {TOP_K}
),
trunc_k AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos_trunc DESC, neighbor_id) AS r
    FROM scored) WHERE r <= {TOP_K}
)
SELECT f.query_id,
       CAST({TOP_K} AS BIGINT) AS k,
       CAST(COALESCE(o.overlap, 0) AS BIGINT) AS overlap_at_k,
       CAST(COALESCE(o.overlap, 0) AS DOUBLE) / {TOP_K} AS recall_at_k
FROM (SELECT DISTINCT query_id FROM full_k) f
LEFT JOIN (
  SELECT a.query_id, COUNT(*) AS overlap
  FROM full_k a JOIN trunc_k b
    ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id
  GROUP BY a.query_id
) o ON o.query_id = f.query_id
"""


@register(
    "embedding_matryoshka_recall",
    oracle=_MATRYOSHKA_ORACLE,
    description=f"Matryoshka truncation eval: exact cosine top-{TOP_K} at "
    f"full 64 dims vs the {_TRUNC}-dim prefix, per-query overlap/recall as "
    "integers — the MRL deployment question (how much ANN quality survives "
    "an 8x memory cut); sequential-fold dot products, 6-decimal rounding, "
    "zero-norm exclusion at each dimensionality",
    tags=("similarity", "evaluation", "embedding", "extension"),
)
def embedding_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        tbl(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.expr("CAST(embedding AS array<double>)").alias("v"),
        )
        .select(
            "vec_id",
            "v",
            F.expr(
                "sqrt(aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, p) -> acc + p))"
            ).alias("nrm"),
            F.expr(
                f"sqrt(aggregate(zip_with(slice(v, 1, {_TRUNC}), slice(v, 1, {_TRUNC}), "
                "(x, y) -> x * y), 0D, (acc, p) -> acc + p))"
            ).alias("nrm8"),
        )
        .filter((F.col("nrm") > 0) & (F.col("nrm8") > 0))
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).alias("q")
    c = e.alias("c")
    scored = c.join(F.broadcast(q), F.col("c.vec_id") != F.col("q.vec_id")).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        F.round(F.expr(_DOT_FULL) / (F.col("q.nrm") * F.col("c.nrm")), 6)
        .cast("double")
        .alias("cos_full"),
        F.round(F.expr(_DOT_TRUNC) / (F.col("q.nrm8") * F.col("c.nrm8")), 6)
        .cast("double")
        .alias("cos_trunc"),
    )

    def topk(order_col: str) -> DataFrame:
        w = W.partitionBy("query_id").orderBy(F.col(order_col).desc(), "neighbor_id")
        return (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= TOP_K)
            .select("query_id", "neighbor_id")
        )

    full_k = topk("cos_full")
    trunc_k = topk("cos_trunc").withColumnRenamed("neighbor_id", "nb")
    overlap = (
        full_k.join(
            trunc_k,
            (full_k.query_id == trunc_k.query_id) & (full_k.neighbor_id == trunc_k.nb),
        )
        .groupBy(full_k.query_id)
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    queries = full_k.select("query_id").distinct()
    return queries.join(overlap, "query_id", "left").select(
        "query_id",
        F.lit(TOP_K).cast("long").alias("k"),
        F.coalesce(F.col("overlap"), F.lit(0)).cast("long").alias("overlap_at_k"),
        (F.coalesce(F.col("overlap"), F.lit(0)).cast("double") / TOP_K).alias("recall_at_k"),
    )
