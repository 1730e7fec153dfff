"""Changepoint detection + leakage-free splitting, round 3 (appended).

``changepoint_cusum_hourly``: CUSUM-style changepoint detection per event
type over the hour-of-day profile — the hour h* maximizing the absolute
cumulative deviation |Σ_{i≤h}(24·xᵢ − total)| (deviations scaled ×24 so
the running statistic stays an exact integer; the mean never needs to be
divided out). One map-side-combined count aggregate, one per-type window
over a 24-row-per-type micro-table, one argmax by rank. The monitoring
primitive behind "when did this source's traffic shape change".

``split_group_aware``: GroupKFold-style train/val/test assignment — the
GROUP (user) is hashed, every event inherits its user's fold, so no
entity can leak across splits. The no-leakage property is verified
IN-PLAN: each fold row carries the number of users it shares with any
other fold (bit-or of fold masks per user — must be single-bit for
everyone), so the output proves the property on every run instead of a
docstring asserting it.

Reference parity note: the reference (SURVEY.md §0) has no relational
surface; these extend the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import events_tbl

# ---------------------------------------------------------------------------
# changepoint_cusum_hourly
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH counts AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr, COUNT(*) AS x
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1, 2
),
dev AS (
  SELECT event_type, hr, x,
         SUM(24 * x) OVER (PARTITION BY event_type ORDER BY hr)
           - (SUM(1) OVER (PARTITION BY event_type ORDER BY hr))
             * SUM(x) OVER (PARTITION BY event_type) AS cum_dev_raw,
         SUM(x) OVER (PARTITION BY event_type) AS total
  FROM counts
),
ranked AS (
  SELECT event_type, hr, cum_dev_raw, total,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY abs(cum_dev_raw) DESC, hr) AS rk
  FROM dev
)
SELECT event_type,
       hr AS changepoint_hour,
       CAST(abs(cum_dev_raw) AS BIGINT) AS max_abs_cumdev24,
       CAST(total AS BIGINT) AS n_events
FROM ranked WHERE rk = 1
"""


@register(
    "changepoint_cusum_hourly",
    oracle=_CUSUM_ORACLE,
    description="CUSUM changepoint per event type over the hourly profile: "
    "argmax |cumulative deviation| in exact x24-scaled integers",
    tags=("monitoring", "timeseries", "extension"),
)
def changepoint_cusum_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax_h |Σ_{i≤h}(24·xᵢ − total)| per type, division-free.

    The classic CUSUM statistic Σ(xᵢ − mean) is scaled by 24 (the series
    length) so it stays an exact BIGINT — both engines agree bit-for-bit
    and the argmax cannot flip on a rounding ulp. Everything after the
    count aggregate runs on a ≤24-rows-per-type micro-table with windows
    partitioned by type (never global); note the cumulative count SUM(1)
    OVER — not hr+1 — so missing hours cannot skew the deviation."""
    counts = (
        events_tbl(spark, sf_dir)
        .where(F.col("ts").isNotNull())
        .groupBy("event_type", F.hour("ts").cast("long").alias("hr"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    wcum = W.partitionBy("event_type").orderBy("hr")
    wall = W.partitionBy("event_type")
    dev = counts.select(
        "event_type",
        "hr",
        (
            F.sum(24 * F.col("x")).over(wcum)
            - F.sum(F.lit(1)).over(wcum) * F.sum("x").over(wall)
        ).alias("cum_dev_raw"),
        F.sum("x").over(wall).alias("total"),
    )
    ranked = dev.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(F.abs(F.col("cum_dev_raw")).desc(), "hr")
        ),
    )
    return ranked.filter(F.col("rk") == 1).select(
        "event_type",
        F.col("hr").alias("changepoint_hour"),
        F.abs(F.col("cum_dev_raw")).cast("long").alias("max_abs_cumdev24"),
        F.col("total").cast("long").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# split_group_aware
# ---------------------------------------------------------------------------

# fold from the USER hash: 0-79 train, 80-89 val, 90-99 test (pct of 100)
_FOLD_SPARK = f"CASE WHEN ({h60_spark('CAST(user_id AS STRING)')}) % 100 < 80 THEN 'train' WHEN ({h60_spark('CAST(user_id AS STRING)')}) % 100 < 90 THEN 'val' ELSE 'test' END"
_FOLD_DUCK = f"CASE WHEN ({h60_duck('CAST(user_id AS VARCHAR)')}) % 100 < 80 THEN 'train' WHEN ({h60_duck('CAST(user_id AS VARCHAR)')}) % 100 < 90 THEN 'val' ELSE 'test' END"

_GROUP_SPLIT_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_id, {_FOLD_DUCK} AS fold
  FROM events WHERE user_id IS NOT NULL
),
user_masks AS (
  SELECT user_id,
         BIT_OR(CASE fold WHEN 'train' THEN 1 WHEN 'val' THEN 2 ELSE 4 END)
           AS mask
  FROM ev GROUP BY user_id
),
leak AS (
  SELECT COALESCE(SUM(CASE WHEN mask NOT IN (1, 2, 4) THEN 1 ELSE 0 END), 0)
           AS n_leaky_users
  FROM user_masks
)
SELECT fold,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum,
       (SELECT CAST(n_leaky_users AS BIGINT) FROM leak) AS n_leaky_users
FROM ev
GROUP BY fold
"""


@register(
    "split_group_aware",
    oracle=_GROUP_SPLIT_ORACLE,
    description="Group-aware 80/10/10 split: events inherit their USER's "
    "hash fold; cross-fold leakage count verified in-plan (must be 0)",
    tags=("sampling", "split", "ml-hygiene", "extension"),
)
def split_group_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GroupKFold assignment with the no-leakage proof in the output.

    The fold is a pure function of user_id, so every event of a user lands
    in the same fold by construction — and the output still PROVES it: a
    per-user bit-or of fold masks must be a power of two for everyone, and
    the violating-user count rides on every row. Pure per-row predicate
    (pushes to the scan) + one groupBy per output; no shuffle beyond the
    aggregates."""
    ev = (
        events_tbl(spark, sf_dir)
        .where(F.col("user_id").isNotNull())
        .select("user_id", "event_id", F.expr(_FOLD_SPARK).alias("fold"))
    )
    masks = ev.groupBy("user_id").agg(
        F.expr(
            "BIT_OR(CASE fold WHEN 'train' THEN 1 WHEN 'val' THEN 2 ELSE 4 END)"
        ).alias("mask")
    )
    leak = masks.agg(
        F.coalesce(
            F.sum(F.when(~F.col("mask").isin(1, 2, 4), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_leaky_users")
    )
    return (
        ev.groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
            F.sum("event_id").cast("long").alias("id_checksum"),
        )
        .crossJoin(F.broadcast(leak))
    )
