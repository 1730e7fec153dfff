"""Round 4 additions, part 42: join-strategy hints and Heaps-law growth.

- ``join_shuffle_hash_hint`` — the join-strategy HINT surface: the same
  orders-lineitem revenue rollup Catalyst would plan as a sort-merge
  join, forced to a ShuffledHashJoin via the SHUFFLE_HASH hint (pinned
  by a plan test).  SMJ sorts both sides; for a large-but-hash-friendly
  build side the shuffled hash join skips both sorts — the classic
  manual override when the optimizer's stats undershoot.  Results are
  identical by construction; the oracle checks them like any other
  aggregation.

- ``heaps_law_curve`` — the vocabulary-growth measurement behind corpus
  dedup/curation planning (Heaps' law: distinct terms ~ K * tokens^b):
  per source, documents ordered by doc_id are cut into 10 equal
  ingestion stages (NTILE over the per-source doc sequence — partitioned
  windows), each 3-shingle's FIRST stage is its min assignment, and the
  cumulative distinct-shingle count per stage comes from the 10x10
  micro-table theta join.  A flattening curve means new data stops
  adding vocabulary — the signal to stop crawling a source.  All counts
  exact BIGINTs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .dedup import bind1
from .relational import tbl

# ---------------------------------------------------------------------------
# join_shuffle_hash_hint
# ---------------------------------------------------------------------------

_HINT_ORACLE = """
SELECT o.o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
GROUP BY o.o_orderpriority
"""


@register(
    "join_shuffle_hash_hint",
    oracle=_HINT_ORACLE,
    description="Join-strategy hint surface: the orders-lineitem rollup "
    "forced from sort-merge to ShuffledHashJoin via the SHUFFLE_HASH "
    "hint (plan-pinned) — the manual override for hash-friendly big "
    "builds where SMJ's double sort is waste; results identical, exact "
    "cents accounting",
    tags=("join", "plans", "extension"),
)
def join_shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        tbl(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_orderpriority")
        .hint("SHUFFLE_HASH")
    )
    lineitem = tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr("CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)").alias(
            "cents"
        ),
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# heaps_law_curve
# ---------------------------------------------------------------------------

_STAGES = 10

_HEAPS_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, source, text,
         NTILE({_STAGES}) OVER (PARTITION BY source ORDER BY doc_id) AS stage
  FROM documents WHERE text IS NOT NULL
),
words AS (
  SELECT source, stage, regexp_extract_all(lower(text), '[a-z]+') AS ws
  FROM docs
),
sh AS (
  SELECT source, stage, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
  FROM words, UNNEST(range(1, len(ws) - 1)) t(i)
),
firsts AS (
  SELECT source, shingle, MIN(stage) AS first_stage,
         COUNT(*) AS occurrences
  FROM sh GROUP BY source, shingle
),
per_stage AS (
  SELECT f.source, s.s AS stage,
         CAST(SUM(CASE WHEN f.first_stage <= s.s THEN 1 ELSE 0 END) AS BIGINT)
           AS cum_distinct
  FROM firsts f CROSS JOIN (SELECT UNNEST(range(1, {_STAGES} + 1)) AS s) s
  GROUP BY f.source, s.s
),
occ AS (
  SELECT source, stage, CAST(COUNT(*) AS BIGINT) AS stage_occurrences
  FROM sh GROUP BY source, stage
),
cum_occ AS (
  SELECT o.source, s.s AS stage,
         CAST(SUM(CASE WHEN o.stage <= s.s THEN o.stage_occurrences ELSE 0 END) AS BIGINT)
           AS cum_occurrences
  FROM occ o CROSS JOIN (SELECT UNNEST(range(1, {_STAGES} + 1)) AS s) s
  GROUP BY o.source, s.s
)
SELECT p.source, CAST(p.stage AS BIGINT) AS stage,
       c.cum_occurrences, p.cum_distinct,
       CASE WHEN c.cum_occurrences = 0 THEN 0.0
            ELSE CAST(p.cum_distinct AS DOUBLE) / CAST(c.cum_occurrences AS DOUBLE)
       END AS novelty_ratio
FROM per_stage p JOIN cum_occ c ON c.source = p.source AND c.stage = p.stage
"""


@register(
    "heaps_law_curve",
    oracle=_HEAPS_ORACLE,
    description=f"Heaps-law vocabulary-growth curve per source: docs cut "
    f"into {_STAGES} ingestion stages (per-source NTILE), each 3-shingle "
    "attributed to its FIRST stage, cumulative distinct vs cumulative "
    "occurrences via the stage micro-table; a flattening novelty ratio "
    "is the stop-crawling signal — all counts exact BIGINTs",
    tags=("text", "llm-pipeline", "analytics", "extension"),
)
def heaps_law_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        tbl(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "source",
            "text",
            F.ntile(_STAGES)
            .over(W.partitionBy("source").orderBy("doc_id"))
            .alias("stage"),
        )
    )
    shingles = bind1(
        "regexp_extract_all(lower(text), '[a-z]+', 0)",
        "ws",
        "CASE WHEN size(ws) >= 3 THEN "
        "transform(sequence(0, size(ws) - 3), "
        "i -> concat(ws[i], ' ', ws[i + 1], ' ', ws[i + 2])) "
        "ELSE CAST(array() AS array<string>) END",
    )
    sh = docs.select(
        "source", "stage", F.explode(F.expr(shingles)).alias("shingle")
    )
    firsts = sh.groupBy("source", "shingle").agg(F.min("stage").alias("first_stage"))
    stages = F.explode(F.array(*[F.lit(s) for s in range(1, _STAGES + 1)])).alias("s")
    per_stage = (
        firsts.select("source", "first_stage", stages)
        .select("source", "first_stage", F.col("s").alias("stage"))
        .groupBy("source", "stage")
        .agg(
            F.sum(F.when(F.col("first_stage") <= F.col("stage"), 1).otherwise(0))
            .cast("long")
            .alias("cum_distinct"),
        )
    )
    occ = sh.groupBy("source", "stage").agg(F.count(F.lit(1)).alias("n"))
    cum_occ = (
        occ.select("source", F.col("stage").alias("o_stage"), "n", stages)
        .select("source", "o_stage", "n", F.col("s").alias("stage"))
        .groupBy("source", "stage")
        .agg(
            F.sum(F.when(F.col("o_stage") <= F.col("stage"), F.col("n")).otherwise(0))
            .cast("long")
            .alias("cum_occurrences"),
        )
    )
    return per_stage.join(cum_occ, ["source", "stage"]).select(
        "source",
        F.col("stage").cast("long").alias("stage"),
        "cum_occurrences",
        "cum_distinct",
        F.when(F.col("cum_occurrences") == 0, F.lit(0.0))
        .otherwise(
            F.col("cum_distinct").cast("double") / F.col("cum_occurrences").cast("double")
        )
        .alias("novelty_ratio"),
    )
