"""Product-quantization ANN (PQ + ADC), round 3 (appended).

``sim_ann_pq_adc``: the memory-bounded ANN technique behind every
industrial 100 TB vector index (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011): vectors are split into
``PQ_SUBS`` subvectors, each subspace is quantized against its own
``PQ_CODES``-entry codebook, and a vector is stored as ``PQ_SUBS`` small
codes (here 8×4 bits ≈ 4 bytes instead of 256 — the compression that
lets an index of 10¹¹ vectors live in RAM). Queries score the WHOLE
corpus by Asymmetric Distance Computation — per (query, subspace, code)
partial distances form a lookup table of |codebook|×subspaces entries,
and a coded vector's approximate distance is the SUM of 8 table entries
— then the ADC top candidates are reranked with exact L2.

Everything is oracle-exact, no recall caveat in the compare:

- Codebooks are hash-seeded (the ``sim_ann_ivf_hashseed`` construction —
  the 16 corpus vectors with the smallest portable hash of their id,
  sliced per subspace), so no trained state exists outside the plan.
- Every 8-dim distance is the proven sequential ascending float fold.
- The ADC sum runs over DECIMAL(18,6)-quantized partials — exact and
  aggregation-order-independent, so the candidate ranking cannot differ
  between Spark's shuffled aggregation and the single-node oracle.

Scale shape: encode = corpus × (8×16-row broadcast codebook), one
codegen'd pass emitting 8 code rows per vector; the ADC join is
corpus-codes ⋈ (per-query 128-row lookup table) on (subspace, code) —
8·|corpus|·|queries| skinny rows, map-side combinable into per-(query,
vector) sums; rerank touches ``PQ_RERANK`` rows per query. At real scale
the lookup table broadcasts and the ADC pass is one scan of the code
table — the property PQ exists for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import tbl
from .similarity import N_QUERIES, TOP_K

PQ_SUBS = 8  # subspaces (64 dims -> 8 dims each)
PQ_CODES = 16  # codebook entries per subspace (4-bit codes)
PQ_RERANK = 8 * TOP_K  # ADC candidates reranked exactly (recall@5 0.25/0.5/0.55
# at 3x/8x/12x rerank on the isotropic sf0.001 corpus — 8x is the knee)


def _sub_dist_duck(vec: str, cent: str, s: str) -> str:
    """8-dim squared L2 between subspace slices, sequential ascending fold."""
    return (
        f"list_sum(list_transform(range(1, 9), "
        f"i -> ({vec}[({s}) * 8 + i] - {cent}[({s}) * 8 + i]) "
        f"* ({vec}[({s}) * 8 + i] - {cent}[({s}) * 8 + i])))"
    )


_PQ_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = 64
),
seeds AS (
  SELECT vec_id AS j, v AS cv FROM e
  ORDER BY {h60_duck('CAST(vec_id AS VARCHAR)')}, vec_id LIMIT {PQ_CODES}
),
subspaces AS (SELECT UNNEST(range(0, {PQ_SUBS})) AS s),
-- corpus encoding: per (vector, subspace) the argmin codebook entry
enc AS (
  SELECT vec_id, s, j AS code, sd FROM (
    SELECT e.vec_id, sub.s, seeds.j,
           {_sub_dist_duck('e.v', 'seeds.cv', 'sub.s')} AS sd,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id, sub.s
                              ORDER BY {_sub_dist_duck('e.v', 'seeds.cv', 'sub.s')}, seeds.j) AS rn
    FROM e CROSS JOIN subspaces sub CROSS JOIN seeds
  ) WHERE rn = 1
),
-- per-query ADC lookup table: distance from query slice to every codebook entry
lut AS (
  SELECT q.vec_id AS query_id, sub.s, seeds.j,
         CAST({_sub_dist_duck('q.v', 'seeds.cv', 'sub.s')} AS DECIMAL(18,6)) AS pd
  FROM e q CROSS JOIN subspaces sub CROSS JOIN seeds
  WHERE q.vec_id < {N_QUERIES}
),
adc AS (
  SELECT lut.query_id, enc.vec_id AS cand_id,
         SUM(lut.pd) AS adc_dist
  FROM enc JOIN lut ON lut.s = enc.s AND lut.j = enc.code
  WHERE enc.vec_id <> lut.query_id
  GROUP BY lut.query_id, enc.vec_id
),
cands AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY adc_dist, cand_id) AS adc_rank
  FROM adc
),
rerank AS (
  SELECT c.query_id, c.cand_id, c.adc_rank, c.adc_dist,
         CAST(ROUND(list_sum(list_transform(range(1, 65),
              i -> (q.v[i] - x.v[i]) * (q.v[i] - x.v[i]))), 6) AS DOUBLE) AS l2_sq
  FROM cands c
  JOIN e q ON q.vec_id = c.query_id
  JOIN e x ON x.vec_id = c.cand_id
  WHERE c.adc_rank <= {PQ_RERANK}
)
SELECT query_id, cand_id AS neighbor_id, l2_sq,
       CAST(adc_dist AS DOUBLE) AS adc_dist, rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY l2_sq, cand_id) AS rnk
  FROM rerank
) WHERE rnk <= {TOP_K}
"""


@register(
    "sim_ann_pq_adc",
    oracle=_PQ_ORACLE,
    description=f"Product-quantization ANN: {PQ_SUBS}x{PQ_CODES} hash-seeded "
    f"codebooks, ADC scoring over decimal-exact partial sums, exact rerank of "
    f"top {PQ_RERANK} — the full PQ pipeline oracle-exact",
    tags=("similarity", "ann", "pq", "extension"),
)
def sim_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encode → ADC scan → exact rerank (see module doc)."""
    e = (
        tbl(spark, sf_dir, "embeddings")
        .where(F.col("embedding").isNotNull() & (F.size("embedding") == 64))
        .select("vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"))
    )
    # codes are the seed vectors' ids — sparse 4-bit-equivalent labels;
    # a dense 0..15 renumbering would need a global-order window for zero
    # benefit (the code VALUE never matters, only its identity)
    seeds = (
        e.select("vec_id", "v", F.expr(h60_spark("CAST(vec_id AS STRING)")).alias("h"))
        .orderBy("h", "vec_id")
        .limit(PQ_CODES)
        .select(F.col("vec_id").alias("j"), F.col("v").alias("cv"))
    )
    # (s, j, 8-dim centroid slice) — a PQ_SUBS x PQ_CODES broadcast table
    codebook = seeds.select(
        F.explode(F.expr(f"sequence(0, {PQ_SUBS - 1})")).alias("s"),
        "j",
        F.expr("slice(cv, s * 8 + 1, 8)").alias("cslice"),
    )
    sub_dist = F.expr(
        "aggregate(zip_with(vslice, cslice, (a, b) -> (a - b) * (a - b)), 0D, (acc, d) -> acc + d)"
    )
    corpus_slices = e.select(
        "vec_id",
        F.explode(F.expr(f"sequence(0, {PQ_SUBS - 1})")).alias("s"),
        F.expr("slice(v, s * 8 + 1, 8)").alias("vslice"),
    )
    enc = (
        corpus_slices.join(F.broadcast(codebook), "s")
        .withColumn("sd", sub_dist)
        .withColumn(
            "rn",
            F.row_number().over(W.partitionBy("vec_id", "s").orderBy("sd", "j")),
        )
        .filter(F.col("rn") == 1)
        .select("vec_id", "s", F.col("j").alias("code"))
    )
    lut = (
        corpus_slices.filter(F.col("vec_id") < N_QUERIES)
        .withColumnRenamed("vec_id", "query_id")
        .join(F.broadcast(codebook), "s")
        .select(
            "query_id",
            "s",
            "j",
            sub_dist.cast("decimal(18,6)").alias("pd"),
        )
    )
    # Both sides derive from corpus_slices/codebook, so a bare `lut.s ==
    # enc.s` has shared lineage (resolves only via dataset-id self-join
    # disambiguation). Explicit aliases make the join condition unambiguous
    # under refactoring.
    adc = (
        enc.alias("enc")
        .join(
            F.broadcast(lut.alias("lut")),
            (F.col("lut.s") == F.col("enc.s")) & (F.col("lut.j") == F.col("enc.code")),
        )
        .filter(F.col("enc.vec_id") != F.col("lut.query_id"))
        .groupBy(F.col("lut.query_id").alias("query_id"), F.col("enc.vec_id").alias("cand_id"))
        .agg(F.sum("pd").alias("adc_dist"))
    )
    cands = adc.withColumn(
        "adc_rank",
        F.row_number().over(W.partitionBy("query_id").orderBy("adc_dist", "cand_id")),
    ).filter(F.col("adc_rank") <= PQ_RERANK)
    # Only the N_QUERIES query vectors can ever match the rerank join —
    # filter BEFORE broadcasting so the broadcast side is bounded by the
    # query count, not the corpus size.
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    x = e.select(F.col("vec_id").alias("cand_id"), F.col("v").alias("xv"))
    l2 = F.round(
        F.expr(
            "aggregate(zip_with(qv, xv, (a, b) -> (a - b) * (a - b)), 0D, (acc, d) -> acc + d)"
        ),
        6,
    ).cast("double")
    rer = (
        cands.join(F.broadcast(q), "query_id")
        .join(x, "cand_id")
        .select("query_id", "cand_id", "adc_dist", l2.alias("l2_sq"))
    )
    return (
        rer.withColumn(
            "rnk",
            F.row_number().over(W.partitionBy("query_id").orderBy("l2_sq", "cand_id")),
        )
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "query_id",
            F.col("cand_id").alias("neighbor_id"),
            "l2_sq",
            F.col("adc_dist").cast("double").alias("adc_dist"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )
