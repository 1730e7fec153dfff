"""Multi-round iterative EM, round 3 (appended).

``kmeans_lloyd_rounds``: the FULL k-means loop — three Lloyd iterations
(assign → mean update → reassign → …) verified cross-engine end-to-end,
not just one step (``kmeans_lloyd_step`` verifies the single update).
This is the hard case for distributed-vs-single-node equivalence: every
round's centroids are DERIVED data feeding the next round's argmin, so
any nondeterminism compounds. It stays bit-exact because each round
repeats the same two tricks:

- centroid means have exact-integer numerators (coordinates quantized
  ×1e6 before the per-(cell, dim) sum) and ONE double division;
- squared distances to the derived centroids quantize each per-dim term
  to DECIMAL(27,12) before the 64-term sum, so the distance — and hence
  every argmin — is aggregation-order-independent; ties break on the
  smaller cell id.

Output: per (round, cell) membership counts plus an exact integer
centroid checksum (Σ|q6| of the updated coordinates) — the convergence
trajectory, 3×16 rows regardless of corpus size. The oracle unrolls the
three rounds as generated CTEs (the ``scd2_incremental_merge`` pattern);
a python reference replays the identical fold in
``tests/test_pipeline25.py``.

Scale: per round, assignment is corpus × (16×64-row broadcast centroid
table) reduced map-side to per-(vector, cell) distance rows, and the
update is a map-side-combined groupBy on (cell, dim). A production loop
inserts a localCheckpoint every few rounds exactly as ``dedup_clusters``
does; the per-round plan is identical.
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


def _round_cte(r: int, cent_rel: str) -> str:
    """One Lloyd round in SQL: assign against `cent_rel` (cid, dim, m) and
    produce `cent{r}` with the updated means + `agg{r}` with the stats."""
    return f"""
dist{r} AS (
  SELECT e.vec_id, c.cid,
         SUM(CAST((e.v[c.dim] - c.m) * (e.v[c.dim] - c.m) AS DECIMAL(27,12))) AS d2
  FROM e CROSS JOIN {cent_rel} c
  GROUP BY e.vec_id, c.cid
),
assign{r} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM dist{r}
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
  SELECT cid, CAST(dim AS BIGINT) AS dim,
         CAST(sum_q6 AS DOUBLE) / (CAST(n AS DOUBLE) * {_Q}) AS m
  FROM upd{r}
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
    rounds = []
    # round 1 assigns against the hash-seeded seed vectors expanded per dim
    rounds.append(_round_cte(1, "cent0"))
    for r in range(2, KMR_ROUNDS + 1):
        rounds.append(_round_cte(r, f"cent{r - 1}"))
    unions = " UNION ALL ".join(f"SELECT * FROM agg{r}" for r in range(1, KMR_ROUNDS + 1))
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = 64
),
seeds AS (
  SELECT vec_id AS cid, v AS cv FROM e
  ORDER BY {h60_duck("CAST(vec_id AS VARCHAR)")}, vec_id LIMIT {KMR_CELLS}
),
cent0 AS (
  SELECT cid, b.dim AS dim, b.m AS m FROM (
    SELECT cid, UNNEST(list_transform(range(1, 65), d -> {{
        'dim': d, 'm': cv[d]}})) AS b
    FROM seeds)
),
{",".join(rounds)}
SELECT CAST(round AS BIGINT) AS round, cid, n_members, centroid_checksum_q6
FROM ({unions})
"""


@register(
    "kmeans_lloyd_rounds",
    oracle=_oracle(),
    description=f"The FULL k-means loop: {KMR_ROUNDS} Lloyd rounds over derived "
    "centroids, every argmin decimal-exact; per-(round, cell) membership + "
    "integer centroid checksums as the convergence trajectory",
    tags=("clustering", "ml", "iterative", "extension"),
)
def kmeans_lloyd_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three assign→update rounds (see module doc)."""
    e = (
        tbl(spark, sf_dir, "embeddings")
        .where(F.col("embedding").isNotNull() & (F.size("embedding") == 64))
        .select("vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"))
    )
    seeds = (
        e.select("vec_id", "v", F.expr(h60_spark("CAST(vec_id AS STRING)")).alias("h"))
        .orderBy("h", "vec_id")
        .limit(KMR_CELLS)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    cent = seeds.select(
        "cid",
        F.explode(
            F.expr(
                "transform(sequence(1, 64), d -> named_struct("
                "'dim', CAST(d AS BIGINT), 'm', cv[d - 1]))"
            )
        ).alias("b"),
    ).select("cid", "b.dim", "b.m")

    expl = e.select(
        "vec_id",
        F.explode(
            F.expr(
                "transform(sequence(1, 64), d -> named_struct("
                f"'dim', CAST(d AS BIGINT), 'val', v[d - 1], "
                f"'qval', CAST(round(v[d - 1] * {_Q}) AS BIGINT)))"
            )
        ).alias("b"),
    ).select("vec_id", "b.dim", "b.val", "b.qval")

    aggs = []
    for r in range(1, KMR_ROUNDS + 1):
        dist = (
            expl.join(F.broadcast(cent), "dim")
            .select(
                "vec_id",
                "cid",
                ((F.col("val") - F.col("m")) * (F.col("val") - F.col("m")))
                .cast("decimal(27,12)")
                .alias("t"),
            )
            .groupBy("vec_id", "cid")
            .agg(F.sum("t").alias("d2"))
        )
        assign = (
            dist.withColumn(
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
        cent = upd.select("cid", "dim", mean.alias("m"))
        aggs.append(
            upd.groupBy("cid").agg(
                F.lit(r).cast("long").alias("round"),
                F.min("n").cast("long").alias("n_members"),
                F.sum(
                    F.abs(F.expr(f"CAST(round(CAST(sum_q6 AS DOUBLE) / (CAST(n AS DOUBLE) * {_Q}) * {_Q}) AS BIGINT)"))
                )
                .cast("long")
                .alias("centroid_checksum_q6"),
            )
        )
    out = aggs[0]
    for a in aggs[1:]:
        out = out.unionByName(a)
    return out.select("round", "cid", "n_members", "centroid_checksum_q6")
