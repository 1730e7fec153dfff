"""Text → embedding (feature hashing) and embedding pooling.

A 100 TB pipeline needs a cheap, deterministic text vectorizer for recall
stages before any model-based embedding: feature hashing (the "hashing
trick") — each token's hash picks a bucket and a sign, normalized to unit
length. Runs as one Arrow-vectorized stage; no vocabulary, no shuffle, no
model weights. Pooling (mean of unit vectors per group, renormalized) then
gives source/cluster-level centroids for blocking or diversity sampling.

Tokens are hashed with the portable 60-bit md5 hash (dedup.h60_spark /
h60_duck), so the registered query's output — per-source pooled INTEGER
vector invariants — has an exact DuckDB oracle; tests additionally verify
determinism, unit norms, and that near-duplicate texts land closer than
unrelated ones.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import spread, tbl

EMBED_DIM = 64


def hashed_text_embeddings(d: DataFrame, dim: int = EMBED_DIM, normalize: bool = True) -> DataFrame:
    """doc_id, vec: array<double> — hashed bag-of-tokens.

    normalize=True (default) scales to unit length; normalize=False keeps the
    raw signed bucket counts (exact small integers in doubles), which pool
    and compare exactly across engines."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    @pandas_udf(ArrayType(DoubleType()))
    def embed(token_hashes: pd.Series) -> pd.Series:
        out = []
        for hs in token_hashes:
            if hs is None:  # NULL text -> zero vector (no token contributions)
                out.append(np.zeros(dim))
                continue
            h = np.asarray(hs, dtype=np.int64).astype(np.uint64)
            if len(h) == 0:
                out.append(np.zeros(dim))
                continue
            bucket = (h % np.uint64(dim)).astype(np.int64)
            sign = np.where((h >> np.uint64(32)) & np.uint64(1), 1.0, -1.0)
            v = np.zeros(dim)
            np.add.at(v, bucket, sign)
            if not normalize:
                out.append(v)
                continue
            n = np.linalg.norm(v)
            out.append(v / n if n > 0 else v)
        return pd.Series(out)

    hashed = spread(d).select(
        "doc_id", F.expr(f"transform(split(text, ' '), t -> {h60_spark('t')})").alias("th")
    )
    return hashed.select("doc_id", embed("th").alias("vec"))


# The oracle reproduces the feature-hashing pipeline exactly: same 60-bit
# token hash, same bucket (h % dim) and sign (bit 32), pooled per source.
# Outputs are integer invariants (sums of ±1 contributions), so the compare
# is exact — no cross-engine float-summation-order concerns.
_POOL_ORACLE = f"""
WITH tok AS (SELECT doc_id, UNNEST(str_split(text, ' ')) AS t FROM documents),
th AS (SELECT doc_id, {h60_duck('t')} AS h FROM tok),
contrib AS (
  SELECT d.source, CAST(th.h % {EMBED_DIM} AS INT) AS bucket,
         CASE WHEN (th.h >> 32) & 1 = 1 THEN 1 ELSE -1 END AS sgn
  FROM th JOIN documents d USING (doc_id)
),
pooled AS (
  SELECT source, bucket, CAST(SUM(sgn) AS BIGINT) AS x
  FROM contrib GROUP BY source, bucket
),
nd AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source)
-- driven from nd with a null-safe LEFT JOIN: a source whose docs have no
-- tokens (all-NULL text) pools to the zero vector, and NULL source is a
-- real group in both engines
SELECT nd.source, ANY_VALUE(nd.n_docs) AS n_docs,
       CAST(COALESCE(SUM(ABS(p.x)), 0) AS BIGINT) AS l1_norm,
       CAST(COALESCE(SUM(p.x * p.x), 0) AS BIGINT) AS sum_sq
FROM nd LEFT JOIN pooled p ON p.source IS NOT DISTINCT FROM nd.source
GROUP BY nd.source
"""


@register(
    "text_hashed_embedding_pool",
    oracle=_POOL_ORACLE,
    description=f"Feature-hashed text embeddings (dim={EMBED_DIM}, portable hash) "
    "sum-pooled per source with exact integer invariants",
    tags=("embedding", "text", "pooling", "extension"),
)
def text_hashed_embedding_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    vecs = hashed_text_embeddings(d, normalize=False).join(
        d.select("doc_id", "source"), "doc_id"
    )
    # element-wise pool via posexplode → (source, idx) partial sums: scales
    # to any dim without per-group array building in Python. Entries are
    # exact small integers, so the double arithmetic is exact.
    exploded = vecs.select("source", F.posexplode("vec").alias("idx", "x"))
    pooled = exploded.groupBy("source", "idx").agg(
        F.sum("x").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return (
        # zero buckets contribute 0 to both invariants, so Spark emitting all
        # dim entries and the oracle emitting only touched buckets agree
        pooled.groupBy("source")
        .agg(
            F.first("n").alias("n_docs"),
            F.sum(F.abs("s")).cast("bigint").alias("l1_norm"),
            F.sum(F.col("s") * F.col("s")).cast("bigint").alias("sum_sq"),
        )
        .select("source", "n_docs", "l1_norm", "sum_sq")
    )
