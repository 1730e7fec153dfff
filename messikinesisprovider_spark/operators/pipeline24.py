"""Spectral methods: one PCA power-iteration step, round 3 (appended).

``embedding_pca_power_iter``: one step of the power method for the top
principal direction of the embedding corpus — y = XᵀX·w₀ — the iterative
primitive behind distributed PCA/SVD (the spectral sibling of
``kmeans_lloyd_step``'s EM update). Determinism end-to-end:

- w₀ is a hash-seeded integer vector embedded as LITERALS in both
  engines (the proven plane-literal pattern): w₀[d] = h60('pca|d') mod
  2001 − 1000 ∈ [−1000, 1000].
- per-row dots x·w₀ are the sequential ascending float fold;
- the row-dimension reduction Σᵢ xᵢ[d]·dotᵢ quantizes each term to
  DECIMAL(27,6) before summing — exact, aggregation-order-independent —
  so the 64 output components are bit-identical across any shuffle;
- the Rayleigh numerator wᵀXᵀXw = Σᵢ dotᵢ² rides along the same way
  (must be ≥ 0: XᵀX is PSD — verified in-plan on every row);
- the normalized next iterate w₁ = y / max|y| costs one broadcast max
  and one double division per dim.

Scale: ONE corpus pass (dot per row is map-side; the explode emits 64
skinny rows per vector into a map-side-combined groupBy(dim)); state is
64 rows regardless of corpus size. The full power loop at 100 TB
iterates exactly this plan.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import tbl


def _w0() -> list[int]:
    out = []
    for d in range(1, 65):
        h = int(hashlib.md5(f"pca|{d}".encode()).hexdigest()[:15], 16)
        out.append(h % 2001 - 1000)
    return out


_W0 = _w0()
_W0_SQL = "[" + ", ".join(str(x) for x in _W0) + "]"
_W0_SPARK = "array(" + ", ".join(f"{x}D" for x in _W0) + ")"

_PCA_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = 64
),
w AS (SELECT {_W0_SQL}::DOUBLE[] AS w0),
dots AS (
  SELECT vec_id, v,
         list_sum(list_transform(range(1, 65), d -> v[d] * w0[d])) AS dot
  FROM e CROSS JOIN w
),
expl AS (
  SELECT b.dim AS dim, b.term AS term, dot FROM (
    SELECT dot, UNNEST(list_transform(range(1, 65), d -> {{
        'dim': d, 'term': CAST(v[d] * dot AS DECIMAL(27,6))}})) AS b
    FROM dots)
),
y AS (
  SELECT CAST(dim AS BIGINT) AS dim,
         CAST(SUM(term) AS DOUBLE) AS y
  FROM expl GROUP BY dim
),
ray AS (
  SELECT CAST(SUM(CAST(dot * dot AS DECIMAL(27,6))) AS DOUBLE) AS rayleigh_num,
         CAST(COUNT(*) AS BIGINT) AS n_vectors
  FROM dots
),
mx AS (SELECT MAX(abs(y)) AS max_abs_y FROM y)
SELECT dim,
       {_W0_SQL}[dim] * 1.0 AS w0_scaled,
       y,
       CASE WHEN max_abs_y > 0 THEN y / max_abs_y END AS w_next,
       rayleigh_num, n_vectors,
       rayleigh_num >= 0 AS psd_ok
FROM y CROSS JOIN ray CROSS JOIN mx
"""


@register(
    "embedding_pca_power_iter",
    oracle=_PCA_ORACLE,
    description="One PCA power-iteration step y = XᵀXw₀ over the embeddings: "
    "literal hash-seeded w₀, decimal-exact row reduction, normalized next "
    "iterate + PSD Rayleigh check in-plan",
    tags=("spectral", "ml", "iterative", "extension"),
)
def embedding_pca_power_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One matvec of the covariance operator (see module doc)."""
    e = (
        tbl(spark, sf_dir, "embeddings")
        .where(F.col("embedding").isNotNull() & (F.size("embedding") == 64))
        .select("vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"))
    )
    dots = e.select(
        "v",
        F.expr(
            f"aggregate(zip_with(v, {_W0_SPARK}, (x, w) -> x * w), 0D, (acc, t) -> acc + t)"
        ).alias("dot"),
    )
    expl = dots.select(
        "dot",
        F.explode(
            F.expr(
                "transform(sequence(1, 64), d -> named_struct("
                "'dim', CAST(d AS BIGINT), "
                "'term', CAST(v[d - 1] * dot AS DECIMAL(27,6))))"
            )
        ).alias("b"),
    ).select("dot", "b.dim", "b.term")
    y = expl.groupBy("dim").agg(F.expr("CAST(SUM(term) AS DOUBLE)").alias("y"))
    ray = dots.agg(
        F.expr("CAST(SUM(CAST(dot * dot AS DECIMAL(27,6))) AS DOUBLE)").alias(
            "rayleigh_num"
        ),
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
    )
    mx = y.agg(F.max(F.abs(F.col("y"))).alias("max_abs_y"))
    return (
        y.crossJoin(F.broadcast(ray))
        .crossJoin(F.broadcast(mx))
        .select(
            "dim",
            F.expr(f"element_at({_W0_SPARK}, CAST(dim AS INT)) * 1.0").alias("w0_scaled"),
            "y",
            F.when(F.col("max_abs_y") > 0, F.col("y") / F.col("max_abs_y")).alias("w_next"),
            "rayleigh_num",
            "n_vectors",
            (F.col("rayleigh_num") >= 0).alias("psd_ok"),
        )
    )
