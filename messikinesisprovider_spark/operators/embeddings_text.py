"""Text → embedding (feature hashing) and embedding pooling.

A 100 TB pipeline needs a cheap, deterministic text vectorizer for recall
stages before any model-based embedding: feature hashing (the "hashing
trick") — each token's hash picks a bucket and a sign, normalized to unit
length. Runs as one Arrow-vectorized stage; no vocabulary, no shuffle, no
model weights. Pooling (mean of unit vectors per group, renormalized) then
gives source/cluster-level centroids for blocking or diversity sampling.

Registered rows-only (xxhash feature hashing has no DuckDB twin); tests
verify determinism, unit norms, and that near-duplicate texts land closer
than unrelated ones.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import spread, tbl

EMBED_DIM = 64


def hashed_text_embeddings(d: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """doc_id, vec: array<double> — unit-norm hashed bag-of-tokens."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    @pandas_udf(ArrayType(DoubleType()))
    def embed(token_hashes: pd.Series) -> pd.Series:
        out = []
        for hs in token_hashes:
            h = np.asarray(hs, dtype=np.int64).astype(np.uint64)
            if len(h) == 0:
                out.append(np.zeros(dim))
                continue
            bucket = (h % np.uint64(dim)).astype(np.int64)
            sign = np.where((h >> np.uint64(32)) & np.uint64(1), 1.0, -1.0)
            v = np.zeros(dim)
            np.add.at(v, bucket, sign)
            n = np.linalg.norm(v)
            out.append(v / n if n > 0 else v)
        return pd.Series(out)

    hashed = spread(d).select(
        "doc_id", F.expr("transform(split(text, ' '), t -> xxhash64(t))").alias("th")
    )
    return hashed.select("doc_id", embed("th").alias("vec"))


@register(
    "text_hashed_embedding_pool",
    oracle=None,  # xxhash feature hashing has no SQL twin; invariants tested
    description=f"Feature-hashed text embeddings (dim={EMBED_DIM}) mean-pooled per source",
    tags=("embedding", "text", "pooling", "extension"),
)
def text_hashed_embedding_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    vecs = hashed_text_embeddings(d).join(d.select("doc_id", "source"), "doc_id")
    # element-wise mean via posexplode → (source, idx) partial sums: scales
    # to any dim without per-group array building in Python
    exploded = vecs.select("source", F.posexplode("vec").alias("idx", "x"))
    pooled = (
        exploded.groupBy("source", "idx")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        .groupBy("source")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(idx, s / n AS m))), p -> p.m)"
            ).alias("centroid"),
            F.first(F.col("n")).alias("n_docs"),
        )
    )
    nrm = F.expr("sqrt(aggregate(transform(centroid, x -> x * x), 0D, (a, x) -> a + x))")
    return pooled.select(
        "source",
        "n_docs",
        F.round(nrm, 6).cast("double").alias("centroid_norm"),
    )
