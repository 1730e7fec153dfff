"""Round 4 additions, part 15: interval-union coverage.

``interval_union_coverage`` — the interval-merge (union-length) operator:
each event opens a fixed 5-minute activity interval; per user, overlapping
intervals merge into segments (the classic sweep: a row starts a NEW
segment iff its start exceeds the running max of all earlier ends), and
the output is per-user total covered time, segment count and the overlap
ratio. The building block behind "total active minutes", SLA uptime
stitching, and disjoint-session extraction — none of which a plain
sessionize-by-gap expresses when intervals have WIDTH (two events 4
minutes apart overlap even though the gap sessionizer would fuse them for
a different reason: here the interval END participates, not the gap).

Shape: ONE window pass per user (running max of ends over preceding rows
+ running sum of new-segment flags — both on the same partitioned spec,
so one shuffle), then two hash aggregations. All arithmetic in integer
microseconds — exact in both engines. At 100 TB the window partitions by
user id; no global ordering exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .relational import events_tbl

_IV_US = 300_000_000  # 5-minute interval per event, in microseconds

_IVU_ORACLE = f"""
WITH iv AS (
  SELECT user_id, event_id, epoch_us(ts) AS s, epoch_us(ts) + {_IV_US} AS e
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
flagged AS (
  SELECT *,
         CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   IS NULL
              OR s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS is_new
  FROM iv
),
seg AS (
  SELECT *,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY s, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg_id
  FROM flagged
),
merged AS (
  SELECT user_id, seg_id, MIN(s) AS seg_s, MAX(e) AS seg_e, COUNT(*) AS n_events
  FROM seg GROUP BY 1, 2
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(seg_e - seg_s) AS BIGINT) AS covered_us,
       CAST((1000 * SUM(seg_e - seg_s)) // (SUM(n_events) * {_IV_US}) AS BIGINT)
         AS coverage_permille
FROM merged GROUP BY 1
"""


@register(
    "interval_union_coverage",
    oracle=_IVU_ORACLE,
    description="Interval-merge union length per user: 5-minute event "
    "intervals merged by the running-max-of-ends sweep (one partitioned "
    "window pass), per-user covered time, segment count and overlap ratio "
    "— 'total active minutes' / SLA uptime stitching, integer-exact",
    tags=("timeseries", "interval", "window", "extension"),
)
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = (
        events_tbl(spark, sf_dir)
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("s"),
            (F.unix_micros("ts") + F.lit(_IV_US)).alias("e"),
        )
    )
    w = W.partitionBy("user_id").orderBy("s", "event_id")
    prior_max_end = F.max("e").over(w.rowsBetween(W.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "is_new",
        F.when(prior_max_end.isNull() | (F.col("s") > prior_max_end), 1).otherwise(0),
    )
    seg = flagged.withColumn(
        "seg_id", F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    )
    merged = seg.groupBy("user_id", "seg_id").agg(
        F.min("s").alias("seg_s"), F.max("e").alias("seg_e"), F.count(F.lit(1)).alias("n_events")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum(F.col("seg_e") - F.col("seg_s")).cast("long").alias("covered_us"),
        F.expr(
            f"CAST((1000 * SUM(seg_e - seg_s)) div (SUM(n_events) * {_IV_US}) AS BIGINT)"
        ).alias("coverage_permille"),
    )
