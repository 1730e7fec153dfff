"""Forecast-backtest + journey-path operators, round 3 (appended).

``forecast_backtest_snaive``: the ops-forecasting backtest shape — a
seasonal-naive model (per (event_type, hour-of-day) mean daily count over
the history window) is evaluated against the held-out LAST day, entirely
in exact integer arithmetic: forecast = ⌊1000·hist_total / n_hist_days⌋
per-mille counts, absolute and signed errors per series. History/holdout
split, model fit and evaluation are ONE pass (conditional aggregation
keyed by (type, hour) — no join), which is how a backtest over 100 TB of
telemetry stays a single map-side-combined aggregate.

``event_trigram_paths``: order-2 user-journey mining — the top
three-step event-type paths (PrefixSpan-lite at depth 3), counted from
per-user ordered sequences via two lags in ONE window pass. Complements
``markov_transitions`` (order-1): together they are the journey-model
fitting pair. The rn > 2 filter (not NULL-lag checks) keeps nullable
state columns honest, mirroring the Markov operator.

Reference parity note: the reference (SURVEY.md §0) has no relational
surface; these extend the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .relational import events_tbl

# ---------------------------------------------------------------------------
# forecast_backtest_snaive
# ---------------------------------------------------------------------------

_SNAIVE_ORACLE = """
WITH ev AS (
  SELECT event_type, hour(ts) AS hr, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events WHERE ts IS NOT NULL
),
bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
agg AS (
  SELECT event_type, CAST(hr AS BIGINT) AS hr,
         SUM(CASE WHEN day < d1 THEN 1 ELSE 0 END) AS hist_total,
         SUM(CASE WHEN day = d1 THEN 1 ELSE 0 END) AS actual,
         datediff('day', d0, d1) AS n_hist_days
  FROM ev CROSS JOIN bounds
  GROUP BY event_type, hr, datediff('day', d0, d1)
)
SELECT event_type, hr,
       CAST(n_hist_days AS BIGINT) AS n_hist_days,
       CAST(hist_total AS BIGINT) AS hist_total,
       CAST(actual AS BIGINT) AS actual,
       CAST((1000 * hist_total) // n_hist_days AS BIGINT) AS forecast_milli,
       CAST((1000 * hist_total) // n_hist_days - 1000 * actual AS BIGINT) AS err_milli,
       CAST(abs((1000 * hist_total) // n_hist_days - 1000 * actual) AS BIGINT)
         AS abs_err_milli
FROM agg
WHERE n_hist_days >= 1
"""


@register(
    "forecast_backtest_snaive",
    oracle=_SNAIVE_ORACLE,
    description="Seasonal-naive forecast backtest: per-(type, hour) mean "
    "daily count over history vs the held-out last day, exact per-mille errors",
    tags=("forecast", "timeseries", "eval", "extension"),
)
def forecast_backtest_snaive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit + holdout evaluation in one conditional aggregation.

    The history window is every day before the corpus max day; the model
    is the per-(type, hour) mean daily count (⌊1000·total/days⌋ — floor
    division keeps both engines bit-equal); the holdout is the last day.
    No join: the day split is a CASE inside ONE groupBy, so the whole
    backtest is a single map-side-combined pass plus a 2-value broadcast."""
    ev = (
        events_tbl(spark, sf_dir)
        .where(F.col("ts").isNotNull())
        .select(
            "event_type",
            F.hour("ts").cast("long").alias("hr"),
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        )
    )
    bounds = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    agg = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("event_type", "hr", F.datediff("d1", "d0").alias("n_hist_days"))
        .agg(
            F.sum(F.when(F.col("day") < F.col("d1"), 1).otherwise(0)).alias("hist_total"),
            F.sum(F.when(F.col("day") == F.col("d1"), 1).otherwise(0)).alias("actual"),
        )
        .filter(F.col("n_hist_days") >= 1)
    )
    fc = F.expr("(1000 * hist_total) div n_hist_days")
    return agg.select(
        "event_type",
        "hr",
        F.col("n_hist_days").cast("long").alias("n_hist_days"),
        F.col("hist_total").cast("long").alias("hist_total"),
        F.col("actual").cast("long").alias("actual"),
        fc.cast("long").alias("forecast_milli"),
        (fc - 1000 * F.col("actual")).cast("long").alias("err_milli"),
        F.abs(fc - 1000 * F.col("actual")).cast("long").alias("abs_err_milli"),
    )


# ---------------------------------------------------------------------------
# event_trigram_paths
# ---------------------------------------------------------------------------

_TRIGRAM_TOPK = 20

_TRIGRAM_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type, 2) OVER w AS t1,
         LAG(event_type, 1) OVER w AS t2,
         ROW_NUMBER() OVER w AS rn
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
tri AS (
  SELECT t1, t2, event_type AS t3, COUNT(*) AS n
  FROM seq WHERE rn > 2 GROUP BY 1, 2, 3
),
tot AS (SELECT SUM(n) AS n_total FROM tri)
SELECT t1, t2, t3, CAST(n AS BIGINT) AS n,
       CAST((1000 * n) // n_total AS BIGINT) AS share_pm
FROM tri CROSS JOIN tot
ORDER BY n DESC, t1, t2, t3
LIMIT {_TRIGRAM_TOPK}
"""


@register(
    "event_trigram_paths",
    oracle=_TRIGRAM_ORACLE,
    description=f"Top {_TRIGRAM_TOPK} three-step user-journey paths (order-2 "
    "sequence mining) with per-mille share; one window pass, two lags",
    tags=("sequence", "mining", "extension"),
)
def event_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-3 path mining sharing ONE window spec for both lags + rn.

    Same single user_id shuffle as markov_transitions; trigram counts are
    a map-side-combined groupBy over ≤|types|³ keys; the corpus total is a
    1-row broadcast; top-k is TakeOrderedAndProject with a full tiebreak."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        events_tbl(spark, sf_dir)
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "event_type",
            F.lag("event_type", 2).over(w).alias("t1"),
            F.lag("event_type", 1).over(w).alias("t2"),
            F.row_number().over(w).alias("rn"),
        )
    )
    tri = (
        seq.filter(F.col("rn") > 2)
        .groupBy("t1", "t2", F.col("event_type").alias("t3"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = tri.agg(F.sum("n").alias("n_total"))
    out = tri.crossJoin(F.broadcast(tot)).select(
        "t1",
        "t2",
        "t3",
        F.col("n").cast("long").alias("n"),
        F.expr("CAST((1000 * n) div n_total AS BIGINT)").alias("share_pm"),
    )
    return out.orderBy(F.desc("n"), "t1", "t2", "t3").limit(_TRIGRAM_TOPK)
