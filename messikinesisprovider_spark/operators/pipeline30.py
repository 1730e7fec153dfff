"""Round 4 additions, part 4: rolling engagement, zone-map audits,
seasonal-residual anomalies.

- ``rolling_active_users`` — exact 7-day rolling distinct users (rolling
  WAU), the dashboard statistic COUNT(DISTINCT) OVER a sliding window
  cannot express directly: dedup to user-days (one map-side-combined
  aggregate), explode each user-day onto the ≤7 window anchor days it
  covers, one distinct count per anchor. Work scales with user-days × 7 —
  at day granularity that is bounded by |users|·|days|, orders of
  magnitude below raw events.

- ``data_skipping_minmax_audit`` — zone-map effectiveness measurement:
  per day-partition min/max of `value` (exactly the footer statistics a
  parquet scan keeps per row group), then for each of 9 candidate
  predicates ``value > q`` the fraction of partitions a reader could SKIP
  outright (max <= q). The statistic that tells you whether sorting or
  z-ordering by a column would pay — measured, not guessed.

- ``anomaly_seasonal_residual`` — seasonality-aware outliers: the hourly
  profile (per (event_type, hour-of-day) decimal-exact mean) is the
  baseline; events whose |value − seasonal mean| exceeds 3× the global
  per-type MAD-free decimal std are flagged. Two map-side aggregates +
  broadcast-size rejoin on the 24×|types| micro-table; per-type anomaly
  accounting output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import events_tbl

# ---------------------------------------------------------------------------
# rolling_active_users
# ---------------------------------------------------------------------------

_RAU_WINDOW = 7  # days, trailing inclusive

_RAU_ORACLE = f"""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
days AS (SELECT DISTINCT day FROM ud),
cover AS (
  SELECT ud.user_id, d.day AS anchor
  FROM ud JOIN days d
    ON ud.day <= d.day AND ud.day > d.day - {_RAU_WINDOW}
)
SELECT CAST(anchor AS TIMESTAMP) AS day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users_7d
FROM cover GROUP BY anchor
"""


@register(
    "rolling_active_users",
    oracle=_RAU_ORACLE,
    description=f"Exact rolling {_RAU_WINDOW}-day distinct users per day "
    "(rolling WAU): user-day dedup, ≤7-window explode, one distinct count "
    "per anchor day — the sliding COUNT DISTINCT a window function can't do",
    tags=("analytics", "engagement", "window", "extension"),
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling WAU (see module doc). The window explode is map-side (a
    7-element sequence per user-day); anchors are restricted to OBSERVED
    days (join against the day set) so the output matches the SQL shape."""
    ev = events_tbl(spark, sf_dir).filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    ud = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    days = ud.select("day").distinct().withColumnRenamed("day", "anchor")
    cover = ud.withColumn(
        "anchor",
        F.explode(
            F.expr(
                f"sequence(day, date_add(day, {_RAU_WINDOW - 1}), interval 1 day)"
            )
        ),
    ).join(days, "anchor")
    return cover.groupBy(F.col("anchor").cast("timestamp").alias("day")).agg(
        F.count_distinct("user_id").cast("long").alias("active_users_7d")
    )


# ---------------------------------------------------------------------------
# data_skipping_minmax_audit
# ---------------------------------------------------------------------------

_SKIP_ORACLE = """
WITH zones AS (
  SELECT CAST(ts AS DATE) AS day,
         MIN(CAST(value AS DECIMAL(18,6))) AS lo,
         MAX(CAST(value AS DECIMAL(18,6))) AS hi,
         COUNT(*) AS n_rows
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
  GROUP BY 1
),
qs AS (SELECT UNNEST(range(1, 10)) * 10 AS q)
SELECT CAST(q AS BIGINT) AS threshold,
       CAST(COUNT(*) AS BIGINT) AS n_zones,
       CAST(SUM(CASE WHEN hi <= q THEN 1 ELSE 0 END) AS BIGINT) AS n_skippable,
       CAST((1000 * SUM(CASE WHEN hi <= q THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT) AS skip_pm,
       CAST(COALESCE(SUM(CASE WHEN hi <= q THEN n_rows ELSE 0 END), 0) AS BIGINT) AS rows_skipped
FROM zones CROSS JOIN qs
GROUP BY q
HAVING COUNT(*) > 0
"""


@register(
    "data_skipping_minmax_audit",
    oracle=_SKIP_ORACLE,
    description="Zone-map effectiveness: per-day min/max of value (the "
    "parquet footer statistic) x 9 candidate predicates 'value > q' — "
    "partitions and rows a reader could skip outright, per threshold",
    tags=("lakeops", "zonemap", "audit", "extension"),
)
def data_skipping_minmax_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    zones = (
        events_tbl(spark, sf_dir)
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.min(F.col("value").cast("decimal(18,6)")).alias("lo"),
            F.max(F.col("value").cast("decimal(18,6)")).alias("hi"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    sweep = zones.select(
        "hi",
        "n_rows",
        F.explode(F.expr("transform(sequence(1, 9), i -> i * CAST(10 AS BIGINT))")).alias(
            "threshold"
        ),
    )
    skippable = F.when(F.col("hi") <= F.col("threshold"), 1).otherwise(0)
    return sweep.groupBy("threshold").agg(
        F.count(F.lit(1)).cast("long").alias("n_zones"),
        F.sum(skippable).cast("long").alias("n_skippable"),
        F.expr(
            "CAST((1000 * SUM(CASE WHEN hi <= threshold THEN 1 ELSE 0 END)) div COUNT(*) AS BIGINT)"
        ).alias("skip_pm"),
        F.coalesce(
            F.sum(F.when(F.col("hi") <= F.col("threshold"), F.col("n_rows")).otherwise(F.lit(0))),
            F.lit(0),
        )
        .cast("long")
        .alias("rows_skipped"),
    )


# ---------------------------------------------------------------------------
# anomaly_seasonal_residual
# ---------------------------------------------------------------------------

_SEAS_ORACLE = """
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day, EXTRACT(hour FROM ts) AS hod,
         CAST(value AS DECIMAL(18,6)) AS v
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
seasonal AS (
  SELECT event_type, hod, COUNT(*) AS n, SUM(v) AS sv
  FROM ev GROUP BY event_type, hod
),
spread AS (
  SELECT event_type, COUNT(*) AS n_all,
         SUM(v) AS sv_all, SUM(CAST(v * v AS DECIMAL(27,6))) AS svv_all
  FROM ev GROUP BY event_type
),
scored AS (
  SELECT e.event_type, e.v,
         CAST(s.sv AS DOUBLE) / s.n AS season_mean,
         sqrt(greatest(CAST(p.svv_all AS DOUBLE) / p.n_all
              - (CAST(p.sv_all AS DOUBLE) / p.n_all) * (CAST(p.sv_all AS DOUBLE) / p.n_all), 0)) AS sd
  FROM ev e
  JOIN seasonal s ON s.event_type = e.event_type AND s.hod = e.hod
  JOIN spread p ON p.event_type = e.event_type
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN abs(CAST(v AS DOUBLE) - season_mean) > 3 * sd
                THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM scored GROUP BY event_type
"""


@register(
    "anomaly_seasonal_residual",
    oracle=_SEAS_ORACLE,
    description="Seasonality-aware anomaly accounting: per-(type, hour) "
    "decimal-exact seasonal means as the baseline, flags where the residual "
    "exceeds 3x the per-type std; two map-side aggregates + micro-table "
    "rejoin",
    tags=("timeseries", "anomaly", "seasonal", "extension"),
)
def anomaly_seasonal_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            "event_type",
            F.hour("ts").alias("hod"),
            F.col("value").cast("decimal(18,6)").alias("v"),
        )
    )
    seasonal = ev.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    spread = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum("v").alias("sv_all"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(27,6)")).alias("svv_all"),
    )
    mean_all = F.col("sv_all").cast("double") / F.col("n_all")
    sd = F.sqrt(
        F.greatest(
            F.col("svv_all").cast("double") / F.col("n_all") - mean_all * mean_all,
            F.lit(0.0),
        )
    )
    scored = (
        ev.join(F.broadcast(seasonal), ["event_type", "hod"])
        .join(F.broadcast(spread.select("event_type", sd.alias("sd"))), "event_type")
        .select(
            "event_type",
            "v",
            (F.col("sv").cast("double") / F.col("n")).alias("season_mean"),
            "sd",
        )
    )
    flagged = F.when(
        F.abs(F.col("v").cast("double") - F.col("season_mean")) > 3 * F.col("sd"), 1
    ).otherwise(0)
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(flagged).cast("long").alias("n_anomalies"),
    )
