"""Round 6 additions, part 6: time-bounded funnel + embedding fleet stats.

- ``funnel_time_bounded``: the STRICT-ORDER, TIME-BOUNDED funnel — a
  purchase converts only if a cart preceded it within 1 h AND that cart
  itself had a view within 1 h before it. `funnel_conversion` counts stage
  reach; this is the product-analytics contract (GA/Amplitude "within N
  minutes" funnels) where each step must be fresh. Two chained
  IGNORE-NULLS window passes over ONE user-partitioned sort — no joins.
- ``embedding_source_centroid_dist``: per-source embedding centroids and
  all pairwise centroid L2 distances — the corpus-drift fleet report
  (which sources' embedding distributions sit far apart). Dims are
  quantized to fixed-point int64 (the cents convention lifted to 2^20
  scale), so the per-(source, dim) sums are exact integers under any
  shuffle order; the only floats are the final per-pair sqrt.

Reference parity note: the reference engine (SURVEY.md §0) has no
analytics surface; these extend the batch side per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .relational import events_tbl, spread, tbl

# ---------------------------------------------------------------------------
# funnel_time_bounded
# ---------------------------------------------------------------------------

_FUNNEL_TOL_S = 3600

_FUNNEL_TB_ORACLE = f"""
WITH timeline AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type = 'view' THEN ts END AS view_ts
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
p1 AS (
  SELECT *,
         LAG(view_ts IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS last_view_ts
  FROM timeline
),
p2 AS (
  SELECT *,
         CASE WHEN event_type = 'cart'
                   AND date_diff('second', last_view_ts, ts) <= {_FUNNEL_TOL_S}
              THEN ts END AS qcart_ts
  FROM p1
),
p3 AS (
  SELECT *,
         LAG(qcart_ts IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS last_qcart_ts
  FROM p2
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(COALESCE(SUM(CASE WHEN date_diff('second', last_qcart_ts, ts)
                                   <= {_FUNNEL_TOL_S} THEN 1 END), 0) AS BIGINT)
         AS n_converted
FROM p3
WHERE event_type = 'purchase'
GROUP BY user_id
"""


@register(
    "funnel_time_bounded",
    oracle=_FUNNEL_TB_ORACLE,
    description="Strict-order time-bounded funnel (view→cart→purchase, each "
    "step within 1h of the next): two chained IGNORE-NULLS windows over one "
    "user-partitioned sort — the within-N-minutes funnel contract that "
    "stage-reach funnels cannot express; no joins",
    tags=("analytics", "funnel", "window", "extension"),
)
def funnel_time_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained freshness: the second window reads a column DERIVED from the
    first window's output (qualified-cart timestamps), so both passes share
    one exchange on user_id and one sort — the plan any bounded multi-step
    funnel compiles to, at any number of steps."""
    timeline = (
        events_tbl(spark, sf_dir)
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.when(F.col("event_type") == "view", F.col("ts")).alias("view_ts"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    p1 = timeline.withColumn("last_view_ts", F.last("view_ts", ignorenulls=True).over(w))
    p2 = p1.withColumn(
        "qcart_ts",
        F.when(
            (F.col("event_type") == "cart")
            & (
                F.unix_timestamp("ts") - F.unix_timestamp("last_view_ts")
                <= _FUNNEL_TOL_S
            ),
            F.col("ts"),
        ),
    )
    p3 = p2.withColumn("last_qcart_ts", F.last("qcart_ts", ignorenulls=True).over(w))
    converted = F.when(
        F.unix_timestamp("ts") - F.unix_timestamp("last_qcart_ts") <= _FUNNEL_TOL_S,
        F.lit(1),
    )
    return (
        p3.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.coalesce(F.sum(converted), F.lit(0)).cast("long").alias("n_converted"),
        )
    )


# ---------------------------------------------------------------------------
# embedding_source_centroid_dist
# ---------------------------------------------------------------------------

_Q = 1 << 20  # fixed-point scale for embedding dims (exact int64 sums)

_CENTROID_ORACLE = f"""
WITH e AS (
  SELECT d.source, emb.embedding
  FROM embeddings emb JOIN documents d ON d.doc_id = emb.vec_id
  WHERE d.source IS NOT NULL AND emb.embedding IS NOT NULL
),
dims AS (
  SELECT source, i AS dim,
         CAST(ROUND(CAST(embedding[i + 1] AS DOUBLE) * {_Q}) AS BIGINT) AS q
  FROM e CROSS JOIN UNNEST(range(0, 64)) AS t(i)
),
cent AS (
  SELECT source, dim, SUM(q) AS s, COUNT(*) AS n
  FROM dims GROUP BY source, dim
),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, a.dim,
         CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n AS d
  FROM cent a JOIN cent b ON a.dim = b.dim AND a.source < b.source
)
SELECT source_a, source_b,
       CAST(ROUND(sqrt(list_sum(list_transform(
              list_sort(list(struct_pack(dim := dim, dd := d * d))),
              x -> x.dd))) / {_Q}, 6) AS DOUBLE) AS centroid_dist
FROM pairs
GROUP BY source_a, source_b
"""


@register(
    "embedding_source_centroid_dist",
    oracle=_CENTROID_ORACLE,
    description="Per-source embedding centroids (fixed-point int64 dim sums "
    "— exact under any shuffle order) and all pairwise centroid L2 "
    "distances — the corpus-drift fleet report over the source dimension",
    tags=("embedding", "drift", "statistics", "extension"),
)
def embedding_source_centroid_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One dim explode + one map-side-combined (source, dim) aggregate —
    the ONLY data-scale work; everything after is micro-table algebra on
    |sources| x 64 rows. Quantizing dims to 2^20 fixed point makes the sums
    exact integers (the cents convention), so no sequential fold is needed
    on the hot path; the 64-term per-pair reduction mixes doubles and runs
    as the dim-sorted sequential fold on the micro-table."""
    e = (
        spread(tbl(spark, sf_dir, "embeddings"))
        .join(
            tbl(spark, sf_dir, "documents").select(
                F.col("doc_id").alias("vec_id"), "source"
            ),
            "vec_id",
        )
        .where(F.col("source").isNotNull() & F.col("embedding").isNotNull())
    )
    dims = e.select(
        "source",
        F.posexplode(
            F.expr(f"transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * {_Q}) AS BIGINT))")
        ).alias("dim", "q"),
    )
    cent = dims.groupBy("source", "dim").agg(
        F.sum("q").alias("s"), F.count(F.lit(1)).alias("n")
    )
    a = cent.select(
        F.col("source").alias("source_a"), "dim",
        (F.col("s").cast("double") / F.col("n")).alias("ca"),
    )
    b = cent.select(
        F.col("source").alias("source_b"), F.col("dim").alias("dim_b"),
        (F.col("s").cast("double") / F.col("n")).alias("cb"),
    )
    pairs = a.join(
        b,
        (F.col("dim") == F.col("dim_b")) & (F.col("source_a") < F.col("source_b")),
    ).select("source_a", "source_b", "dim", (F.col("ca") - F.col("cb")).alias("d"))
    return pairs.groupBy("source_a", "source_b").agg(
        F.round(
            F.sqrt(
                F.expr(
                    "aggregate(array_sort(collect_list(struct(dim, d * d AS dd))), 0D, "
                    "(acc, x) -> acc + x.dd)"
                )
            )
            / F.lit(float(_Q)),
            6,
        )
        .cast("double")
        .alias("centroid_dist"),
    )
