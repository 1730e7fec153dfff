"""Tokenizer-training primitives (round 3c).

``bpe_merge_step`` is one full iteration of the byte-pair-encoding trainer
inner loop at corpus scale: count all adjacent token pairs, pick the winning
pair (count desc, then lexicographic — deterministic), and account for the
greedy left-to-right non-overlapping application of that merge per document.
A production BPE trainer is exactly this operator run k times with the
merged token substituted in; the expensive parts — the pair-count shuffle
and the per-doc greedy accounting — are what has to scale, and both are
plain hash aggregations / partitioned windows here.

Greedy-overlap subtlety handled identically in both engines: two matches of
the winner pair can sit at consecutive positions only when the pair is a
repeated token (a,a); greedy left-to-right then merges floor(run/2) of a run
of equal tokens. Grouping consecutive match positions into runs and summing
``(k+1) div 2`` per run gives the right count for BOTH the a=b and a!=b
cases (a!=b runs always have k=1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .relational import tbl
from .retrieval3 import _TOKS_DUCK, _TOKS_SPARK

_BPE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents
),
pos AS (
  SELECT doc_id, toks,
         UNNEST(range(0, GREATEST(0, len(toks) - 1))) AS i
  FROM toks
),
pairs AS (
  SELECT doc_id, i, toks[i + 1] AS a, toks[i + 2] AS b FROM pos
),
counts AS (
  SELECT a, b, COUNT(*) AS c FROM pairs GROUP BY a, b
),
winner AS (
  SELECT a, b FROM counts ORDER BY c DESC, a, b LIMIT 1
),
matches AS (
  SELECT p.doc_id, p.i
  FROM pairs p JOIN winner w ON p.a = w.a AND p.b = w.b
),
runs AS (
  SELECT doc_id, i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
  FROM matches
),
runlens AS (
  SELECT doc_id, grp, COUNT(*) AS k FROM runs GROUP BY doc_id, grp
),
merged AS (
  SELECT doc_id, SUM((k + 1) // 2) AS m FROM runlens GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(COALESCE(m.m, 0) AS BIGINT) AS n_merges,
       CAST(len(t.toks) - COALESCE(m.m, 0) AS BIGINT) AS n_tokens_after,
       w.a AS pair_a, w.b AS pair_b
FROM toks t
CROSS JOIN winner w
LEFT JOIN merged m ON m.doc_id = t.doc_id
"""


@register(
    "bpe_merge_step",
    oracle=_BPE_ORACLE,
    description="One BPE-trainer iteration: corpus pair counts -> deterministic "
    "winning pair -> per-doc greedy non-overlapping merge accounting",
    tags=("tokenizer", "bpe", "text", "extension"),
)
def bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: one shuffle for the pair counts (map-side combined), a
    1-row broadcast for the winner, one partitioned window for the greedy
    run accounting. No Python in the loop; k training iterations = k runs of
    this plan with the substituted vocabulary (the substitution itself is
    the same explode/transform machinery).
    """
    d = tbl(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.expr(_TOKS_SPARK).alias("toks"))
    pairs = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "CASE WHEN size(toks) >= 2 THEN "
                "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS a, toks[i+1] AS b)) "
                "ELSE array() END"
            )
        ).alias("i", "p"),
    ).select("doc_id", "i", "p.a", "p.b")
    counts = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))
    winner = counts.orderBy(F.col("c").desc(), "a", "b").limit(1).select("a", "b")
    matches = pairs.join(
        F.broadcast(winner.withColumnRenamed("a", "wa").withColumnRenamed("b", "wb")),
        (F.col("a") == F.col("wa")) & (F.col("b") == F.col("wb")),
    ).select("doc_id", "i")
    runs = matches.withColumn(
        "grp", F.col("i") - F.row_number().over(W.partitionBy("doc_id").orderBy("i"))
    )
    merged = (
        runs.groupBy("doc_id", "grp")
        .agg(F.count(F.lit(1)).alias("k"))
        .groupBy("doc_id")
        .agg(F.sum(F.expr("(k + 1) div 2")).alias("m"))
    )
    return (
        toks.crossJoin(F.broadcast(winner.select(F.col("a").alias("pair_a"), F.col("b").alias("pair_b"))))
        .join(merged, "doc_id", "left")
        .select(
            "doc_id",
            F.size("toks").cast("bigint").alias("n_tokens"),
            F.coalesce("m", F.lit(0)).cast("bigint").alias("n_merges"),
            (F.size("toks") - F.coalesce("m", F.lit(0))).cast("bigint").alias("n_tokens_after"),
            "pair_a",
            "pair_b",
        )
    )
