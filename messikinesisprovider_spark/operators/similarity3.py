"""Similarity search, part 3 (round 3c): IVF with a deterministic quantizer.

``sim_ann_ivf_hashseed`` is the same IVF plan shape as
``similarity.sim_ann_ivf`` — coarse cells, nearest-cell assignment in one
codegen'd pass, probe the query's nearest cells, exact cosine rerank — but
the coarse quantizer is the ``N_IVF_CELLS`` corpus vectors with the smallest
portable hash of their id: a deterministic pseudo-random seed set (exactly
kmeans++ seeding without the Lloyd iterations). That removes the trained
quantizer — the one thing that kept sim_ann_ivf rows-only — so the ENTIRE
IVF pipeline (seeding, cell assignment, probing, rerank, top-k) is verified
bit-for-bit against the DuckDB oracle. sim_ann_ivf stays registered as the
trained-quantizer variant (better cells on clustered data); this one is the
verification twin with identical plan shape and cost.

Float determinism: every distance/dot is a sequential ascending fold in both
engines (the proven sim_topk_bruteforce convention), so argmin cell choices
and cosine ranks cannot diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import tbl
from .similarity import _DOT, N_IVF_CELLS, N_PROBE, N_QUERIES, TOP_K, _unit_vectors

_IVF_SEEDED_ORACLE = f"""
WITH e0 AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
),
e AS (SELECT * FROM e0 WHERE nrm > 0),
cent AS (
  SELECT vec_id AS cid, v AS cv FROM e
  ORDER BY {h60_duck('CAST(vec_id AS VARCHAR)')}, vec_id LIMIT {N_IVF_CELLS}
),
assign AS (
  SELECT e.vec_id, e.v, e.nrm, cent.cid,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_sum(list_transform(range(1, 65),
                    i -> (cent.cv[i] - e.v[i]) * (cent.cv[i] - e.v[i]))), cent.cid
         ) AS rn
  FROM e CROSS JOIN cent
),
corpus AS (SELECT vec_id, v, nrm, cid FROM assign WHERE rn = 1),
probes AS (
  SELECT vec_id, v, nrm, cid FROM assign
  WHERE rn <= {N_PROBE} AND vec_id < {N_QUERIES}
),
scored AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(ROUND(list_sum(list_transform(range(1, 65), i -> q.v[i] * c.v[i]))
                    / (q.nrm * c.nrm), 6) AS DOUBLE) AS cos_sim
  FROM probes q JOIN corpus c ON c.cid = q.cid AND c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, cos_sim, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rnk
  FROM scored
) WHERE rnk <= {TOP_K}
"""


@register(
    "sim_ann_ivf_hashseed",
    oracle=_IVF_SEEDED_ORACLE,
    description=f"ANN top-{TOP_K} via IVF with a hash-seeded deterministic quantizer "
    f"({N_IVF_CELLS} cells, probe {N_PROBE}) — the full IVF pipeline oracle-exact",
    tags=("similarity", "ivf", "ann", "extension"),
)
def sim_ann_ivf_hashseed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same scale story as sim_ann_ivf: assignment is corpus × 16 broadcast
    centroids (one codegen'd pass + a per-vector partitioned window), the
    rerank touches ~N_PROBE/N_IVF_CELLS of the corpus, and at 100 TB the
    cell id becomes a partition column so probing is partition pruning. The
    centroid set is a deterministic function of the data (smallest portable
    hash of vec_id), so no index-build step and no ML stage anywhere.
    """
    e = _unit_vectors(tbl(spark, sf_dir, "embeddings"))
    cent = (
        e.select(
            "vec_id",
            "v",
            F.expr(h60_spark("CAST(vec_id AS STRING)")).alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(N_IVF_CELLS)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    dist = F.expr(
        "aggregate(zip_with(cv, v, (w, x) -> (w - x) * (w - x)), 0D, (s, d) -> s + d)"
    )
    assign = (
        e.crossJoin(F.broadcast(cent))
        .withColumn("dist", dist)
        .withColumn(
            "rn",
            F.row_number().over(W.partitionBy("vec_id").orderBy("dist", "cid")),
        )
    )
    corpus = assign.filter(F.col("rn") == 1).select("vec_id", "v", "nrm", "cid").alias("c")
    probes = (
        assign.filter((F.col("rn") <= N_PROBE) & (F.col("vec_id") < N_QUERIES))
        .select("vec_id", "v", "nrm", "cid")
        .alias("q")
    )
    cos = F.round(F.expr(_DOT) / (F.col("q.nrm") * F.col("c.nrm")), 6).cast("double")
    scored = (
        corpus.join(
            F.broadcast(probes),
            (F.col("c.cid") == F.col("q.cid")) & (F.col("c.vec_id") != F.col("q.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= TOP_K)
    )
