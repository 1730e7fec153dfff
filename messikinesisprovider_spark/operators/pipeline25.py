"""Multi-round iterative EM, round 3 (appended).

``kmeans_lloyd_rounds``: the FULL k-means loop — three Lloyd iterations
(assign → mean update → reassign → …) verified cross-engine end-to-end,
not just one step (``kmeans_lloyd_step`` verifies the single update).
This is the hard case for distributed-vs-single-node equivalence: every
round's centroids are DERIVED data feeding the next round's argmin, so
any nondeterminism compounds. It stays bit-exact because each round
repeats the same two tricks:

- centroid means have exact-integer numerators (coordinates quantized
  ×1e6 before the per-(cell, dim) sum) and ONE double division — so the
  derived centroid coordinate is the identical double in both engines;
- squared distances to those centroids are the proven SEQUENTIAL
  ASCENDING float fold over the 64 dims (the similarity-family
  convention) — a fixed evaluation order, so argmins cannot diverge;
  ties break on the smaller cell id.

Output: per (round, cell) membership counts plus an exact integer
centroid checksum (Σ|q6| of the updated coordinates) — the convergence
trajectory, 3×16 rows regardless of corpus size. The oracle unrolls the
three rounds as generated CTEs (the ``scd2_incremental_merge`` pattern);
a python reference replays the identical fold in
``tests/test_pipeline25.py``.

Scale: per round, assignment is corpus × 16 broadcast centroid ARRAYS in
one codegen'd fold pass (16·n skinny rows — the kmeans_lloyd_step shape,
not a per-dim explode join), and the update is a map-side-combined
groupBy on (cell, dim). A production loop inserts a localCheckpoint
every few rounds exactly as ``dedup_clusters`` does; the per-round plan
is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import tbl

KMR_CELLS = 16
KMR_ROUNDS = 3
_Q = "1000000.0"

_D2_DUCK = (
    "list_sum(list_transform(range(1, 65), "
    "i -> (c.cv[i] - e.v[i]) * (c.cv[i] - e.v[i])))"
)


def _round_cte(r: int, cent_rel: str) -> str:
    """One Lloyd round in SQL: assign against `cent_rel` (cid, cv array)
    and produce `cent{r}` with the updated mean arrays + `agg{r}`."""
    return f"""
assign{r} AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_D2_DUCK}, c.cid) AS rn
    FROM e CROSS JOIN {cent_rel} c
  ) WHERE rn = 1
),
upd{r} AS (
  SELECT a.cid, b.dim AS dim, SUM(b.qval) AS sum_q6, COUNT(*) AS n
  FROM assign{r} a JOIN (
    SELECT vec_id, UNNEST(list_transform(range(1, 65), d -> {{
        'dim': d, 'qval': CAST(round(v[d] * {_Q}) AS BIGINT)}})) AS b
    FROM e) b ON b.vec_id = a.vec_id
  GROUP BY a.cid, b.dim
),
cent{r} AS (
  SELECT cid,
         list(CAST(sum_q6 AS DOUBLE) / (CAST(n AS DOUBLE) * {_Q})
              ORDER BY dim) AS cv
  FROM upd{r} GROUP BY cid
),
agg{r} AS (
  SELECT {r} AS round, cid,
         CAST(MIN(n) AS BIGINT) AS n_members,
         CAST(SUM(abs(CAST(round(CAST(sum_q6 AS DOUBLE)
              / (CAST(n AS DOUBLE) * {_Q}) * {_Q}) AS BIGINT))) AS BIGINT)
           AS centroid_checksum_q6
  FROM upd{r} GROUP BY cid
)"""


def _oracle() -> str:
    rounds = [_round_cte(1, "cent0")]
    for r in range(2, KMR_ROUNDS + 1):
        rounds.append(_round_cte(r, f"cent{r - 1}"))
    unions = " UNION ALL ".join(f"SELECT * FROM agg{r}" for r in range(1, KMR_ROUNDS + 1))
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = 64
),
cent0 AS (
  SELECT vec_id AS cid, v AS cv FROM e
  ORDER BY {h60_duck("CAST(vec_id AS VARCHAR)")}, vec_id LIMIT {KMR_CELLS}
),
{",".join(rounds)}
SELECT CAST(round AS BIGINT) AS round, cid, n_members, centroid_checksum_q6
FROM ({unions})
"""


@register(
    "kmeans_lloyd_rounds",
    oracle=_oracle(),
    description=f"The FULL k-means loop: {KMR_ROUNDS} Lloyd rounds over derived "
    "centroids, every argmin exact (integer-numerator means + ascending "
    "distance folds); per-(round, cell) membership + integer centroid "
    "checksums as the convergence trajectory",
    tags=("clustering", "ml", "iterative", "extension"),
)
def kmeans_lloyd_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three assign→update rounds (see module doc)."""
    e = (
        tbl(spark, sf_dir, "embeddings")
        .where(F.col("embedding").isNotNull() & (F.size("embedding") == 64))
        .select("vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"))
    )
    cent = (
        e.select("vec_id", "v", F.expr(h60_spark("CAST(vec_id AS STRING)")).alias("h"))
        .orderBy("h", "vec_id")
        .limit(KMR_CELLS)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    expl = e.select(
        "vec_id",
        F.explode(
            F.expr(
                "transform(sequence(1, 64), d -> named_struct("
                f"'dim', CAST(d AS BIGINT), "
                f"'qval', CAST(round(v[d - 1] * {_Q}) AS BIGINT)))"
            )
        ).alias("b"),
    ).select("vec_id", "b.dim", "b.qval")

    dist = F.expr(
        "aggregate(zip_with(cv, v, (w, x) -> (w - x) * (w - x)), 0D, (s, d) -> s + d)"
    )
    aggs = []
    for r in range(1, KMR_ROUNDS + 1):
        assign = (
            e.crossJoin(F.broadcast(cent))
            .withColumn("d2", dist)
            .withColumn(
                "rn", F.row_number().over(W.partitionBy("vec_id").orderBy("d2", "cid"))
            )
            .filter(F.col("rn") == 1)
            .select("vec_id", "cid")
        )
        upd = (
            assign.join(expl, "vec_id")
            .groupBy("cid", "dim")
            .agg(F.sum("qval").alias("sum_q6"), F.count(F.lit(1)).alias("n"))
        )
        mean = F.col("sum_q6").cast("double") / (F.col("n").cast("double") * F.lit(1000000.0))
        cent = (
            upd.select("cid", "dim", mean.alias("m"))
            .groupBy("cid")
            .agg(
                F.expr("transform(array_sort(collect_list(struct(dim, m))), x -> x.m)").alias(
                    "cv"
                )
            )
        )
        aggs.append(
            upd.groupBy("cid").agg(
                F.lit(r).cast("long").alias("round"),
                F.min("n").cast("long").alias("n_members"),
                F.sum(
                    F.abs(
                        F.expr(
                            f"CAST(round(CAST(sum_q6 AS DOUBLE) / (CAST(n AS DOUBLE) * {_Q}) * {_Q}) AS BIGINT)"
                        )
                    )
                )
                .cast("long")
                .alias("centroid_checksum_q6"),
            )
        )
    out = aggs[0]
    for a in aggs[1:]:
        out = out.unionByName(a)
    return out.select("round", "cid", "n_members", "centroid_checksum_q6")
