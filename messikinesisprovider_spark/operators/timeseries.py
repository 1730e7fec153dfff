"""Time-series operators: gap filling with linear interpolation, and rolling
z-score anomaly detection.

Extends the temporal family (calendar spine, as-of join, sessionization,
sliding windows) with the two shapes monitoring/feature pipelines need on a
message log: a DENSE regularly-sampled series from sparse events (with
interior gaps interpolated, not just zero-filled), and an online-style
outlier flag computed from a trailing window.

Determinism: rolling moments use the repo's decimal-sum discipline (exact
DECIMAL accumulation, one cast to double, one division); interpolation
fractions are ratios of exact epoch-second integers; every window order
carries a unique tiebreaker. So both operators hash-match the DuckDB oracle
without any rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .relational import events_tbl


@register(
    "gap_fill_interpolate",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(hour) AS lo, MAX(hour) AS hi FROM hourly GROUP BY 1
    ),
    spine AS (
      SELECT event_type, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
      FROM bounds
    ),
    joined AS (
      SELECT s.event_type, s.hour, h.v FROM spine s
      LEFT JOIN hourly h ON h.event_type = s.event_type AND h.hour = s.hour
    ),
    ctx AS (
      SELECT event_type, hour, v,
             LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
             FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             FIRST_VALUE(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      FROM joined
    )
    SELECT event_type, hour::TIMESTAMP AS hour,
           CASE WHEN v IS NOT NULL THEN v
                ELSE pv + (nv - pv)
                     * (CAST(epoch(hour) - epoch(ph) AS DOUBLE)
                        / CAST(epoch(nh) - epoch(ph) AS DOUBLE)) END AS v_filled,
           v IS NULL AS was_gap
    FROM ctx
    """,
    description="Dense hourly series per event_type with interior gaps "
    "linearly interpolated between neighboring observed hours",
    tags=("temporal", "spine", "interpolation", "extension"),
)
def gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling with linear interpolation — the step after the calendar
    spine when zero-filling is wrong (gauges, rates, balances).

    Interior gaps always have both neighbors because the spine spans
    [min observed, max observed] per key, and the endpoints are observed by
    construction. The interpolation fraction is a ratio of exact
    epoch-second integers; the surrounding values are decimal-exact hourly
    sums — so the filled value is deterministic across engines.

    Scale: the spine is one row per key exploded (no driver loop); all four
    context columns come from two window specs over the per-key hourly
    series, which is ~5 orders of magnitude smaller than the event stream.
    Everything partitions by the series key — no global order anywhere.
    """
    ev = events_tbl(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("v")
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("hour").alias("lo"), F.max("hour").alias("hi")
    )
    spine = bounds.select(
        "event_type", F.explode(F.expr("sequence(lo, hi, INTERVAL 1 HOUR)")).alias("hour")
    )
    joined = spine.join(hourly, ["event_type", "hour"], "left")
    back = (
        W.partitionBy("event_type").orderBy("hour").rowsBetween(W.unboundedPreceding, 0)
    )
    fwd = (
        W.partitionBy("event_type").orderBy("hour").rowsBetween(0, W.unboundedFollowing)
    )
    marked_hour = F.when(F.col("v").isNotNull(), F.col("hour"))
    ctx = joined.select(
        "event_type",
        "hour",
        "v",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.last(marked_hour, ignorenulls=True).over(back).alias("ph"),
        F.first("v", ignorenulls=True).over(fwd).alias("nv"),
        F.first(marked_hour, ignorenulls=True).over(fwd).alias("nh"),
    )
    frac = (
        (F.unix_timestamp("hour") - F.unix_timestamp("ph")).cast("double")
        / (F.unix_timestamp("nh") - F.unix_timestamp("ph")).cast("double")
    )
    return ctx.select(
        "event_type",
        "hour",
        F.when(F.col("v").isNotNull(), F.col("v"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
        .alias("v_filled"),
        F.col("v").isNull().alias("was_gap"),
    )


ZSCORE_WINDOW = 100  # trailing events per key
ZSCORE_THRESHOLD = 3.0


@register(
    "rolling_zscore_anomaly",
    oracle=f"""
    WITH stats AS (
      SELECT event_id, event_type, value,
             COUNT(*) OVER w AS cnt,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s,
             CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
                  OVER w AS DOUBLE) AS ss
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN {ZSCORE_WINDOW - 1} PRECEDING AND CURRENT ROW)
    ),
    scored AS (
      SELECT event_id, event_type, value, cnt,
             s / cnt AS mean,
             sqrt(GREATEST(ss / cnt - (s / cnt) * (s / cnt), 0.0)) AS sd
      FROM stats
    )
    SELECT event_id, event_type, value, mean, sd,
           CASE WHEN sd > 0 THEN (value - mean) / sd ELSE 0.0 END AS z
    FROM scored
    WHERE cnt >= {ZSCORE_WINDOW}
      AND sd > 0
      AND abs((value - mean) / sd) > {ZSCORE_THRESHOLD}
    """,
    description=f"Rolling z-score outliers: trailing-{ZSCORE_WINDOW} window "
    f"per event_type, |z| > {ZSCORE_THRESHOLD}, decimal-exact moments",
    tags=("temporal", "anomaly", "window", "extension"),
)
def rolling_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window outlier detection, the batch twin of an online
    monitor: each event is scored against the mean/stddev of its own
    trailing {ZSCORE_WINDOW} events per series.

    Determinism is the interesting part: naive SUM(double) OVER a rows
    frame is order-of-accumulation-dependent, so both moments accumulate
    exact decimals inside the frame (value and value² as DECIMAL) and cast
    to double once. The frame order carries event_id as a unique
    tiebreaker, so frame membership itself is reproducible. Variance uses
    the E[x²]−E[x]² identity — both terms from exact sums — clamped at 0
    for the constant-window edge case.

    Scale: one window spec per series key; Spark evaluates the running
    frame in a single pass per partition after the keyed shuffle. The
    warm-up rows (cnt < window) are excluded, matching the online monitor
    that refuses to alert before it has a full baseline.
    """
    ev = events_tbl(spark, sf_dir)
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(ZSCORE_WINDOW - 1), 0)
    )
    dec = F.col("value").cast("decimal(18,6)")
    stats = ev.select(
        "event_id",
        "event_type",
        "value",
        F.count(F.lit(1)).over(w).alias("cnt"),
        F.sum(dec).over(w).cast("double").alias("s"),
        F.sum(dec * dec).over(w).cast("double").alias("ss"),
    )
    mean = F.col("s") / F.col("cnt")
    sd = F.sqrt(F.greatest(F.col("ss") / F.col("cnt") - mean * mean, F.lit(0.0)))
    scored = stats.select(
        "event_id",
        "event_type",
        "value",
        mean.alias("mean"),
        sd.alias("sd"),
        F.col("cnt"),
    )
    z = F.when(F.col("sd") > 0, (F.col("value") - F.col("mean")) / F.col("sd")).otherwise(
        F.lit(0.0)
    )
    return (
        scored.withColumn("z", z)
        .filter(
            (F.col("cnt") >= ZSCORE_WINDOW)
            & (F.col("sd") > 0)
            & (F.abs(F.col("z")) > ZSCORE_THRESHOLD)
        )
        .select("event_id", "event_type", "value", "mean", "sd", "z")
    )
