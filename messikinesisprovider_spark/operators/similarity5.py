"""Similarity search, part 5 (round 7): IVF with a TRAINED quantizer,
oracle-exact end-to-end.

``sim_ann_ivf_trained`` retires the registry's last rows-only entry
(round-6 VERDICT item 5).  The original ``similarity.sim_ann_ivf`` trained
its coarse quantizer with driver-side numpy Lloyd's over a sampled corpus —
seed-dependent, so the registry carried it rows-only with the hash-seeded
twin (``sim_ann_ivf_hashseed``) as the oracle-exact proxy.  This query
closes the gap: the quantizer is STILL trained (hash-seeded kmeans++-style
init + ``IVF_LLOYD_ROUNDS`` unrolled Lloyd refinement rounds), but the
training runs inside the query plan in both engines using the two proven
cross-engine determinism tricks from ``kmeans_lloyd_rounds`` (pipeline25):

- centroid means have exact-integer numerators (coordinates quantized
  x1e6 before the per-(cell, dim) sum) and ONE double division, so the
  derived centroid coordinate is the identical double in both engines;
- every squared distance / dot product is the sequential ascending float
  fold (the similarity-family convention), so cell argmins and cosine
  ranks cannot diverge; ties break on the smaller cell id.

After training, the pipeline is similarity3's IVF shape verbatim: assign
the corpus to its nearest refined cell, probe each query's ``N_PROBE``
nearest cells, exact cosine rerank inside the probed cells, top-``TOP_K``
per query.

Scale: per Lloyd round, assignment is corpus x 16 broadcast centroid
arrays in one codegen'd fold pass and the update is a map-side-combined
groupBy on (cell, dim) — the kmeans_lloyd_rounds plan, linear in N per
round with a fixed round count.  The search phase touches
~N_PROBE/N_IVF_CELLS of the corpus; at 100 TB the refined cell id becomes
a partition column and probing is partition pruning, while training runs
once offline on the same plan (or on a bounded sample, as the retired
numpy variant documented).

Reference parity: none — this is SURVEY §7 pipeline-extension surface
(the reference KinesisStreamingBuffer has no ANN role).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import tbl
from .similarity import _DOT, N_IVF_CELLS, N_PROBE, N_QUERIES, TOP_K, _unit_vectors

IVF_LLOYD_ROUNDS = 2
_Q = "1000000.0"

_D2_DUCK = (
    "list_sum(list_transform(range(1, 65), "
    "i -> (c.cv[i] - e.v[i]) * (c.cv[i] - e.v[i])))"
)


def _lloyd_cte(r: int, cent_rel: str) -> str:
    """One Lloyd refinement round in SQL (the pipeline25 CTE shape):
    assign every vector to its nearest centroid in ``cent_rel`` and emit
    ``cent{r}`` with the exact-integer-numerator mean arrays."""
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
)"""


def _oracle() -> str:
    rounds = [_lloyd_cte(1, "cent0")]
    for r in range(2, IVF_LLOYD_ROUNDS + 1):
        rounds.append(_lloyd_cte(r, f"cent{r - 1}"))
    final = f"cent{IVF_LLOYD_ROUNDS}"
    return f"""
WITH e0 AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
),
e AS (SELECT * FROM e0 WHERE nrm > 0),
cent0 AS (
  SELECT vec_id AS cid, v AS cv FROM e
  ORDER BY {h60_duck('CAST(vec_id AS VARCHAR)')}, vec_id LIMIT {N_IVF_CELLS}
),
{",".join(rounds)},
assignF AS (
  SELECT e.vec_id, e.v, e.nrm, c.cid,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY {_D2_DUCK}, c.cid) AS rn
  FROM e CROSS JOIN {final} c
),
corpus AS (SELECT vec_id, v, nrm, cid FROM assignF WHERE rn = 1),
probes AS (
  SELECT vec_id, v, nrm, cid FROM assignF
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


# Sequential ascending fold — must be built lazily (F.expr needs an active
# session; this module is imported by the registry before one may exist).
_DIST_SQL = "aggregate(zip_with(cv, v, (w, x) -> (w - x) * (w - x)), 0D, (s, d) -> s + d)"


def _assign(e: DataFrame, cent: DataFrame) -> DataFrame:
    """Rank every vector's distance to every centroid (rn = 1 is the
    owning cell) — one broadcast cross join + per-vector window."""
    return (
        e.crossJoin(F.broadcast(cent))
        .withColumn("d2", F.expr(_DIST_SQL))
        .withColumn(
            "rn", F.row_number().over(W.partitionBy("vec_id").orderBy("d2", "cid"))
        )
    )


@register(
    "sim_ann_ivf_trained",
    oracle=_oracle(),
    description=f"ANN top-{TOP_K} via IVF with a TRAINED quantizer (hash-seeded init "
    f"+ {IVF_LLOYD_ROUNDS} in-plan Lloyd rounds, {N_IVF_CELLS} cells, probe {N_PROBE}) "
    "— training AND search oracle-exact",
    tags=("similarity", "ivf", "ann", "clustering", "extension"),
)
def sim_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-seeded init -> unrolled Lloyd refinement -> IVF probe/rerank
    (see module doc)."""
    e = _unit_vectors(tbl(spark, sf_dir, "embeddings"))
    cent = (
        e.select("vec_id", "v", F.expr(h60_spark("CAST(vec_id AS STRING)")).alias("h"))
        .orderBy("h", "vec_id")
        .limit(N_IVF_CELLS)
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
    for _ in range(IVF_LLOYD_ROUNDS):
        assign = _assign(e, cent).filter(F.col("rn") == 1).select("vec_id", "cid")
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
    assign_f = _assign(e, cent)
    corpus = assign_f.filter(F.col("rn") == 1).select("vec_id", "v", "nrm", "cid").alias("c")
    probes = (
        assign_f.filter((F.col("rn") <= N_PROBE) & (F.col("vec_id") < N_QUERIES))
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
