"""Round 5 additions, part 7: BI ratio windows, retrieval MRR, and
gaps-and-islands streaks.

- ``ratio_to_report_window`` — the percent-of-total report shape: revenue
  per nation with share-of-region (a REGION-partitioned window over the
  25-row nation aggregate) and share-of-global (a 1-row total broadcast —
  never an empty-partition window, which would serialize the plan). All
  revenue sums decimal-exact; each share is one double division.
- ``eval_mrr_at_k`` — Mean-Reciprocal-Rank components for the BM25 query
  terms: per term, rank documents by term frequency (full tf/doc_id
  tiebreak), find the first RELEVANT document in the top 10 (relevance =
  the term occurs in the document's first 10 tokens — the title-match
  proxy), and emit the reciprocal rank as an exact ppm integer. Completes
  the retrieval eval family (NDCG@10, pass@k, exact AP already
  registered).
- ``activity_streaks_islands`` — the classic gaps-and-islands rewrite:
  per user, consecutive-day activity streaks via the day-number minus
  row_number constant-per-island trick (both window functions partition
  by user), then per-user streak accounting. Pure integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import events_tbl, spread, tbl
from .retrieval3 import _TOKS_DUCK, _TOKS_SPARK, BM25_QUERY_TERMS

# ---------------------------------------------------------------------------
# ratio_to_report_window
# ---------------------------------------------------------------------------

_RATIO_ORACLE = """
WITH rev AS (
  SELECT c.c_nationkey,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_nationkey
),
nat AS (
  SELECT n.n_nationkey, n.n_name, n.n_regionkey, r.r_name,
         COALESCE(rev.revenue, 0) AS revenue
  FROM nation n
  JOIN region r ON r.r_regionkey = n.n_regionkey
  LEFT JOIN rev ON rev.c_nationkey = n.n_nationkey
),
tot AS (SELECT CAST(SUM(CAST(revenue AS DECIMAL(27,6))) AS DOUBLE) AS g FROM nat)
SELECT n_name AS nation, r_name AS region,
       CAST(ROUND(revenue, 2) AS DOUBLE) AS revenue,
       CAST(ROUND(revenue / SUM(revenue) OVER (PARTITION BY n_regionkey), 6)
            AS DOUBLE) AS share_of_region,
       CAST(ROUND(revenue / tot.g, 6) AS DOUBLE) AS share_of_global
FROM nat CROSS JOIN tot
"""


@register(
    "ratio_to_report_window",
    oracle=_RATIO_ORACLE,
    description="Percent-of-total report: nation revenue with "
    "share-of-region (region-partitioned window over the 25-row nation "
    "aggregate) and share-of-global (1-row total broadcast, never an "
    "empty-partition window)",
    tags=("sql", "window", "analytics", "extension"),
)
def ratio_to_report_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    rev = (
        tbl(spark, sf_dir, "orders")
        .join(
            tbl(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_nationkey")
        .agg(
            F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)").alias(
                "revenue"
            )
        )
    )
    nat = (
        tbl(spark, sf_dir, "nation")
        .join(
            tbl(spark, sf_dir, "region"),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .join(rev, F.col("c_nationkey") == F.col("n_nationkey"), "left")
        .select(
            "n_name",
            "r_name",
            "n_regionkey",
            F.coalesce(F.col("revenue"), F.lit(0.0)).alias("revenue"),
        )
    )
    tot = nat.agg(
        F.expr("CAST(SUM(CAST(revenue AS DECIMAL(27,6))) AS DOUBLE)").alias("g")
    )
    w = W.partitionBy("n_regionkey")
    return nat.crossJoin(F.broadcast(tot)).select(
        F.col("n_name").alias("nation"),
        F.col("r_name").alias("region"),
        F.round("revenue", 2).cast("double").alias("revenue"),
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6)
        .cast("double")
        .alias("share_of_region"),
        F.round(F.col("revenue") / F.col("g"), 6).cast("double").alias("share_of_global"),
    )


# ---------------------------------------------------------------------------
# eval_mrr_at_k
# ---------------------------------------------------------------------------

_MRR_K = 10
_MRR_SCALE = 10**6


def _mrr_terms_sql(quote: str = "'") -> str:
    return ", ".join(f"{quote}{t}{quote}" for t in BM25_QUERY_TERMS)


_MRR_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents WHERE text IS NOT NULL
),
q AS (SELECT UNNEST([{_mrr_terms_sql()}]) AS term),
tf AS (
  SELECT q.term, d.doc_id,
         len(list_filter(d.toks, t -> t = q.term)) AS tf,
         CASE WHEN list_contains(d.toks[1:{_MRR_K}], q.term) THEN 1 ELSE 0 END AS rel
  FROM q JOIN docs d ON list_contains(d.toks, q.term)
),
ranked AS (
  SELECT term, doc_id, rel,
         ROW_NUMBER() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS rnk
  FROM tf
)
SELECT q.term,
       CAST(fr.first_rel_rank AS BIGINT) AS first_rel_rank,
       CAST(CASE WHEN fr.first_rel_rank IS NOT NULL
                 THEN {_MRR_SCALE} // fr.first_rel_rank ELSE 0 END AS BIGINT)
         AS rr_ppm
FROM q LEFT JOIN (
  SELECT term, MIN(rnk) AS first_rel_rank
  FROM ranked WHERE rel = 1 AND rnk <= {_MRR_K}
  GROUP BY term
) fr ON fr.term = q.term
ORDER BY q.term
"""


@register(
    "eval_mrr_at_k",
    oracle=_MRR_ORACLE,
    description=f"Reciprocal-rank components at k={_MRR_K} for the BM25 "
    "query terms: tf-ranked documents (full tiebreak), relevance = term in "
    "the document's first 10 tokens, exact ppm reciprocal ranks — "
    "completes the retrieval eval family (NDCG/pass@k/AP)",
    tags=("eval", "retrieval", "ranking", "extension"),
)
def eval_mrr_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index shape: the term spine (a handful of rows) broadcasts
    against the exploded (term, doc, tf) postings; the ranking window
    partitions by term."""
    from pyspark.sql.window import Window as W

    docs = (
        spread(tbl(spark, sf_dir, "documents"))
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.expr(_TOKS_SPARK).alias("toks"))
    )
    q = spark.createDataFrame([(t,) for t in BM25_QUERY_TERMS], "term string")
    tf = (
        docs.crossJoin(F.broadcast(q))
        .filter(F.array_contains("toks", F.col("term")))
        .select(
            "term",
            "doc_id",
            F.expr("size(filter(toks, t -> t = term))").alias("tf"),
            F.when(
                F.array_contains(F.expr(f"slice(toks, 1, {_MRR_K})"), F.col("term")), 1
            )
            .otherwise(0)
            .alias("rel"),
        )
    )
    ranked = tf.withColumn(
        "rnk",
        F.row_number().over(W.partitionBy("term").orderBy(F.col("tf").desc(), "doc_id")),
    )
    fr = (
        ranked.filter((F.col("rel") == 1) & (F.col("rnk") <= _MRR_K))
        .groupBy("term")
        .agg(F.min("rnk").alias("first_rel_rank"))
    )
    return (
        q.join(fr, "term", "left")
        .select(
            "term",
            F.col("first_rel_rank").cast("long").alias("first_rel_rank"),
            F.coalesce(
                F.expr(f"{_MRR_SCALE} div first_rel_rank"), F.lit(0)
            )
            .cast("long")
            .alias("rr_ppm"),
        )
        .orderBy("term")
    )


# ---------------------------------------------------------------------------
# activity_streaks_islands
# ---------------------------------------------------------------------------

_STREAK_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
isl AS (
  SELECT user_id, day,
         date_diff('day', DATE '1992-01-01', day)
           - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM days
),
streaks AS (
  SELECT user_id, grp, COUNT(*) AS len FROM isl GROUP BY user_id, grp
)
SELECT user_id,
       CAST(SUM(len) AS BIGINT) AS n_active_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(MAX(len) AS BIGINT) AS max_streak_days
FROM streaks GROUP BY user_id
"""


@register(
    "activity_streaks_islands",
    oracle=_STREAK_ORACLE,
    description="Gaps-and-islands: per-user consecutive-day activity "
    "streaks via the day-number minus row_number constant-per-island "
    "trick (user-partitioned windows, pure integers)",
    tags=("sql", "window", "analytics", "extension"),
)
def activity_streaks_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    days = (
        events_tbl(spark, sf_dir)
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    isl = days.select(
        "user_id",
        "day",
        (
            F.datediff("day", F.lit("1992-01-01").cast("date"))
            - F.row_number().over(W.partitionBy("user_id").orderBy("day"))
        ).alias("grp"),
    )
    streaks = isl.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return streaks.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("len").cast("long").alias("max_streak_days"),
    )
