"""Round 4 additions, part 19: histogram split finding, exact weighted
medians, and largest-remainder quota apportionment.

- ``tree_split_histogram`` — the inner loop of distributed GBDT/decision-
  tree training (XGBoost/LightGBM-style): evaluate every candidate split
  threshold of a feature from ONE pass of class histograms, score each by
  Gini purity, and mark the argmax.  The corpus reduces map-side to 9
  (threshold, left/right class counts) rows via conditional aggregates
  over a literal threshold explode (the threshold_sweep_quality shape);
  purity = (pos²+neg²)/total per side is two correctly-rounded IEEE
  divisions of exact BIGINTs + one add — bit-identical cross-engine; the
  argmax is a 1-row best-threshold broadcast with a key tiebreak.

- ``weighted_median_exact`` — exact weighted median per group (integer
  weights from the portable hash): order by (value, id) within the group,
  accumulate weights, pick the first row where 2·cumw ≥ totw — the
  robust-aggregation primitive Spark has no builtin for (percentile_cont
  is unweighted).  One partitioned sort window, no global ordering.

- ``apportion_largest_remainder`` — turn per-source corpus shares into
  EXACT integer sample quotas summing to N (the planning step between
  ``source_mixing_weights`` and an actual sampler): floor quotas from
  integer division, then the largest-remainder (Hamilton) rule ranks
  remainders — with share and key tiebreaks — to distribute the leftover
  slots.  All integer arithmetic; the source axis is a micro-table, so
  ranking it is a bounded sort, and the corpus scan is one groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import events_tbl, tbl

# ---------------------------------------------------------------------------
# tree_split_histogram
# ---------------------------------------------------------------------------

_SPLIT_THRESHOLDS = tuple(range(10, 100, 10))

_SPLIT_ORACLE = f"""
WITH ev AS (
  SELECT value, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL
),
hist AS (
  SELECT t.t AS threshold,
         CAST(COUNT(*) FILTER (WHERE value < t.t) AS BIGINT) AS n_left,
         CAST(COUNT(*) FILTER (WHERE value < t.t AND y = 1) AS BIGINT) AS pos_left,
         CAST(COUNT(*) FILTER (WHERE value >= t.t) AS BIGINT) AS n_right,
         CAST(COUNT(*) FILTER (WHERE value >= t.t AND y = 1) AS BIGINT) AS pos_right
  FROM ev CROSS JOIN (SELECT UNNEST({list(_SPLIT_THRESHOLDS)!r}) AS t) t
  GROUP BY t.t
),
scored AS (
  SELECT *,
         (CASE WHEN n_left = 0 THEN 0.0
               ELSE CAST(pos_left * pos_left
                         + (n_left - pos_left) * (n_left - pos_left) AS DOUBLE) / n_left END)
         + (CASE WHEN n_right = 0 THEN 0.0
                 ELSE CAST(pos_right * pos_right
                           + (n_right - pos_right) * (n_right - pos_right) AS DOUBLE) / n_right END)
         AS purity
  FROM hist
),
best AS (SELECT threshold FROM scored ORDER BY purity DESC, threshold LIMIT 1)
SELECT s.threshold, s.n_left, s.pos_left, s.n_right, s.pos_right, s.purity,
       s.threshold = b.threshold AS is_best
FROM scored s CROSS JOIN best b
"""


@register(
    "tree_split_histogram",
    oracle=_SPLIT_ORACLE,
    description="GBDT-style split finder: all 9 candidate thresholds "
    "scored from ONE corpus pass of conditional class-count aggregates "
    "(map-side histogram build); Gini purity from exact BIGINT counts via "
    "two correctly-rounded IEEE divisions; argmax marked through a 1-row "
    "best-threshold broadcast with key tiebreak",
    tags=("ml", "tree", "analytics", "extension"),
)
def tree_split_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram split finding (see module doc). The histogram build is the
    100 TB-shaped part: thresholds are a literal axis, so the scan emits 9
    partial rows per task and the shuffle carries 9 rows total."""
    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select(
            "value",
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        )
    )
    t_axis = F.explode(F.array(*[F.lit(t) for t in _SPLIT_THRESHOLDS])).alias("threshold")
    hist = (
        ev.select("value", "y", t_axis)
        .groupBy("threshold")
        .agg(
            F.count(F.when(F.col("value") < F.col("threshold"), 1)).cast("long").alias("n_left"),
            F.count(F.when((F.col("value") < F.col("threshold")) & (F.col("y") == 1), 1))
            .cast("long")
            .alias("pos_left"),
            F.count(F.when(F.col("value") >= F.col("threshold"), 1)).cast("long").alias("n_right"),
            F.count(F.when((F.col("value") >= F.col("threshold")) & (F.col("y") == 1), 1))
            .cast("long")
            .alias("pos_right"),
        )
    )
    purity_side = (
        "CASE WHEN {n} = 0 THEN 0.0D ELSE CAST({p} * {p} + ({n} - {p}) * ({n} - {p}) AS DOUBLE) / {n} END"
    )
    scored = hist.withColumn(
        "purity",
        F.expr(
            purity_side.format(n="n_left", p="pos_left")
            + " + "
            + purity_side.format(n="n_right", p="pos_right")
        ),
    )
    best = (
        scored.orderBy(F.col("purity").desc(), F.col("threshold"))
        .limit(1)
        .select(F.col("threshold").alias("best_t"))
    )
    return scored.crossJoin(F.broadcast(best)).select(
        "threshold",
        "n_left",
        "pos_left",
        "n_right",
        "pos_right",
        "purity",
        (F.col("threshold") == F.col("best_t")).alias("is_best"),
    )


# ---------------------------------------------------------------------------
# weighted_median_exact
# ---------------------------------------------------------------------------


def _wmed_oracle() -> str:
    w = h60_duck("'wm|' || CAST(event_id AS VARCHAR)") + " % 4 + 1"
    return f"""
WITH ev AS (
  SELECT event_type, event_id, value, {w} AS w
  FROM events WHERE value IS NOT NULL
),
cum AS (
  SELECT event_type, value, w,
         SUM(w) OVER (PARTITION BY event_type
                      ORDER BY value, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
         SUM(w) OVER (PARTITION BY event_type) AS totw
  FROM ev
),
hit AS (
  SELECT event_type, totw, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cumw) AS rn
  FROM cum WHERE 2 * cumw >= totw
)
SELECT event_type, CAST(totw AS BIGINT) AS total_weight, value AS weighted_median
FROM hit WHERE rn = 1
"""


@register(
    "weighted_median_exact",
    oracle=_wmed_oracle(),
    description="Exact weighted median per group (hash-deterministic "
    "integer weights 1..4): partitioned cumulative-weight window ordered "
    "by (value, id), first row with 2*cumw >= totw — the robust "
    "aggregation percentile_cont cannot express; no global sort",
    tags=("analytics", "robust", "window", "extension"),
)
def weighted_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    w_expr = h60_spark("'wm|' || CAST(event_id AS STRING)") + " % 4 + 1"
    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select("event_type", "event_id", "value", F.expr(w_expr).alias("w"))
    )
    cum_w = (
        W.partitionBy("event_type")
        .orderBy("value", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tot_w = W.partitionBy("event_type")
    cum = ev.select(
        "event_type",
        "value",
        F.sum("w").over(cum_w).alias("cumw"),
        F.sum("w").over(tot_w).alias("totw"),
    )
    hit = cum.filter(2 * F.col("cumw") >= F.col("totw")).withColumn(
        "rn", F.row_number().over(W.partitionBy("event_type").orderBy("cumw"))
    )
    return hit.filter(F.col("rn") == 1).select(
        "event_type",
        F.col("totw").cast("long").alias("total_weight"),
        F.col("value").alias("weighted_median"),
    )


# ---------------------------------------------------------------------------
# apportion_largest_remainder
# ---------------------------------------------------------------------------

# prime so quotas never divide evenly (1000 would make the remainder rule
# vacuous at sf0.001 where the corpus is exactly 1000 docs)
_APPORTION_N = 997


def _apportion_oracle() -> str:
    return f"""
WITH src AS (
  SELECT COALESCE(source, '<null>') AS source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1
),
tot AS (SELECT SUM(n_docs) AS total FROM src),
quota AS (
  SELECT s.source, s.n_docs,
         ({_APPORTION_N} * s.n_docs) // t.total AS base,
         ({_APPORTION_N} * s.n_docs) % t.total AS rem
  FROM src s CROSS JOIN tot t
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY rem DESC, n_docs DESC, source) AS rr,
         {_APPORTION_N} - SUM(base) OVER () AS leftover
  FROM quota
)
SELECT source, n_docs, CAST(base AS BIGINT) AS base_quota,
       CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
FROM ranked
"""


@register(
    "apportion_largest_remainder",
    oracle=_apportion_oracle(),
    description=f"Largest-remainder (Hamilton) apportionment of "
    f"{_APPORTION_N} sample slots across sources: floor quotas by integer "
    "division, leftover slots to the largest remainders (share + key "
    "tiebreaks) — turns mixture weights into exact integer quotas that "
    "sum to N; corpus scan is one groupBy, the rest is micro-table",
    tags=("curation", "sampling", "planning", "extension"),
)
def apportion_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer quota apportionment (see module doc). The source axis is a
    micro-table (|sources| rows), so the remainder ranking and the
    leftover scalar are bounded regardless of corpus size."""
    src = (
        tbl(spark, sf_dir, "documents")
        .groupBy(F.coalesce(F.col("source"), F.lit("<null>")).alias("source"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    tot = src.agg(F.sum("n_docs").alias("total"))
    quota = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.expr(f"({_APPORTION_N} * n_docs) DIV total").alias("base"),
        F.expr(f"({_APPORTION_N} * n_docs) % total").alias("rem"),
    )
    # the micro-table global rank: two-pass is overkill for |sources| rows,
    # but keep it window-free on principle — rank via micro theta join.
    lhs = quota.select(
        F.col("source").alias("s2"), F.col("rem").alias("rem2"),
        F.col("n_docs").alias("nd2"), F.col("base").alias("base2"),
    )
    rr = (
        quota.join(
            lhs,
            (F.col("rem2") > F.col("rem"))
            | ((F.col("rem2") == F.col("rem")) & (F.col("nd2") > F.col("n_docs")))
            | (
                (F.col("rem2") == F.col("rem"))
                & (F.col("nd2") == F.col("n_docs"))
                & (F.col("s2") < F.col("source"))
            ),
            "left",
        )
        .groupBy("source", "n_docs", "base")
        .agg(
            (F.count("s2") + 1).alias("rr"),
        )
    )
    base_sum = quota.agg(F.sum("base").alias("base_total"))
    return (
        rr.crossJoin(F.broadcast(base_sum))
        .select(
            "source",
            "n_docs",
            F.col("base").cast("long").alias("base_quota"),
            (
                F.col("base")
                + F.when(F.col("rr") <= F.lit(_APPORTION_N) - F.col("base_total"), 1).otherwise(0)
            )
            .cast("long")
            .alias("quota"),
        )
    )
