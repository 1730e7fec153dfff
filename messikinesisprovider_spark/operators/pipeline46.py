"""Round 4 additions, part 21: time-series finance/ops rollups.

- ``ohlc_candlestick_daily`` — the OHLC bar build (open/high/low/close/
  volume per day): open/close are the FIRST/LAST values under the total
  (ts, event_id) order, resolved with a partitioned rank window + one
  conditional aggregate — no argmin/argmax builtin needed, so both
  engines share tie semantics exactly; volume is a decimal-exact sum.

- ``twap_time_weighted_value`` — time-weighted average value per user
  (the TWAP/interval-weighted mean): each observation weighted by the
  exact integer-microsecond gap to the user's next event (lead window),
  weights x values accumulated as DECIMAL(38,6) (no overflow: |gap| <
  2^42 us x 6-digit values), one IEEE division at the end.  Users with a
  single event carry no interval and drop out.

- ``running_balance_floor`` — running balance clamped at zero (the
  Lindley recursion b_i = max(0, b_{i-1} + x_i): inventory that can't go
  negative, a queue that can't be shorter than empty).  NOT expressible
  as a plain prefix sum — but the reflection identity
  b_i = S_i - min(0, min_{j<=i} S_j) turns it into TWO stacked
  partitioned windows (running sum + running min), both decimal-exact;
  per-user final/peak balances follow from one more conditional
  aggregate.  The identity is pinned against a literal python fold in
  tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .relational import events_tbl

# ---------------------------------------------------------------------------
# ohlc_candlestick_daily
# ---------------------------------------------------------------------------

_OHLC_ORACLE = """
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day, ts, event_id, value
  FROM events WHERE value IS NOT NULL
),
ranked AS (
  SELECT day, value,
         ROW_NUMBER() OVER (PARTITION BY day ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY day) AS n
  FROM ev
)
SELECT CAST(day AS TIMESTAMP) AS day,
       MIN(CASE WHEN rn = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MIN(CASE WHEN rn = n THEN value END) AS close,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS volume,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM ranked
GROUP BY day
"""


@register(
    "ohlc_candlestick_daily",
    oracle=_OHLC_ORACLE,
    description="OHLC candlestick bars per day: open/close resolved by a "
    "partitioned (ts, id) rank window + conditional aggregates (shared "
    "tie semantics, no engine argmin), high/low plain min/max, volume a "
    "decimal-exact sum",
    tags=("timeseries", "analytics", "window", "extension"),
)
def ohlc_candlestick_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select(F.col("ts").cast("date").alias("day"), "ts", "event_id", "value")
    )
    wr = W.partitionBy("day").orderBy("ts", "event_id")
    wp = W.partitionBy("day")
    ranked = ev.select(
        "day",
        "value",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    return ranked.groupBy(F.col("day").cast("timestamp").alias("day")).agg(
        F.min(F.when(F.col("rn") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.min(F.when(F.col("rn") == F.col("n"), F.col("value"))).alias("close"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("volume"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# twap_time_weighted_value
# ---------------------------------------------------------------------------

# Weighted accumulation in exact BIGINT cents x milliseconds: a
# DECIMAL(38,6) value-x-microsecond sum exceeds 2^53 micro-units and
# DuckDB's wide-decimal->double cast is then no longer correctly rounded
# (1-ulp drift found by the parity sweep); integer cents x ms keep the
# sum inside int64 (< 2^53 at any per-user rate that fits a month), and
# an int64->double conversion is a single correctly-rounded IEEE op in
# every engine.
_TWAP_ORACLE = """
WITH ev AS (
  SELECT user_id, ts, event_id, value
  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
),
gaps AS (
  SELECT user_id,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         (epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts)) // 1000 AS dt_ms
  FROM ev
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(dt_ms) AS BIGINT) AS span_ms,
       CAST(SUM(cents * dt_ms) AS DOUBLE) / CAST(SUM(dt_ms) AS DOUBLE) / 100 AS twap
FROM gaps WHERE dt_ms IS NOT NULL
GROUP BY user_id
HAVING SUM(dt_ms) > 0
"""


@register(
    "twap_time_weighted_value",
    oracle=_TWAP_ORACLE,
    description="Time-weighted average value per user (TWAP): each "
    "observation weighted by the exact integer-microsecond lead gap, "
    "DECIMAL(38,6) weighted accumulation, one IEEE division; "
    "single-event users carry no interval and drop out",
    tags=("timeseries", "analytics", "window", "extension"),
)
def twap_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("value").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", "ts", "event_id", "value")
    )
    wl = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
        # integer DIV, not `/`: Spark's `/` on longs is DOUBLE division and
        # rounds large microsecond gaps before the cast truncates
        (
            (F.unix_micros(F.lead("ts").over(wl)) - F.unix_micros("ts"))
        ).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull()).select(
        "user_id", "cents", F.expr("dt_us DIV 1000").alias("dt_ms")
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.sum("dt_ms").cast("long").alias("span_ms"),
            (
                F.sum(F.col("cents") * F.col("dt_ms")).cast("double")
                / F.sum("dt_ms").cast("double")
                / F.lit(100)
            ).alias("twap"),
        )
        .filter(F.col("span_ms") > 0)
    )


# ---------------------------------------------------------------------------
# running_balance_floor
# ---------------------------------------------------------------------------

_BAL_SIGN = "CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE -1 END"

_BAL_ORACLE = f"""
WITH ev AS (
  SELECT user_id, ts, event_id,
         CAST(value AS DECIMAL(18,6)) * ({_BAL_SIGN}) AS delta
  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
),
pre AS (
  SELECT user_id, delta,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n,
         SUM(delta) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM ev
),
mins AS (
  SELECT user_id, rn, n, s,
         MIN(s) OVER (PARTITION BY user_id ORDER BY rn
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
  FROM pre
),
flo AS (
  -- CASE, not LEAST: DuckDB's LEAST on DECIMAL args (any precision)
  -- returns DOUBLE and the whole balance chain silently loses decimal
  -- exactness (found by the parity sweep); CASE preserves DECIMAL
  SELECT user_id, rn, n,
         s - CASE WHEN m < 0 THEN m ELSE CAST(0 AS DECIMAL(38,6)) END AS bal
  FROM mins
)
SELECT user_id,
       CAST(MAX(n) AS BIGINT) AS n_events,
       CAST(MIN(CASE WHEN rn = n THEN bal END) AS DOUBLE) AS final_balance,
       CAST(MAX(bal) AS DOUBLE) AS peak_balance
FROM flo
GROUP BY user_id
"""


@register(
    "running_balance_floor",
    oracle=_BAL_ORACLE,
    description="Zero-floored running balance (Lindley recursion "
    "b_i = max(0, b_i-1 + x_i)) via the reflection identity "
    "b_i = S_i - min(0, running-min S): two stacked partitioned windows, "
    "decimal-exact deltas — the iterative clamp expressed as pure "
    "windows; per-user final/peak from one conditional aggregate",
    tags=("timeseries", "window", "iterative", "extension"),
)
def running_balance_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("value").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            (F.col("value").cast("decimal(18,6)") * F.expr(_BAL_SIGN)).alias("delta"),
        )
    )
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    pre = ev.select(
        "user_id",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("user_id")).alias("n"),
        F.sum("delta").over(wo.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("s"),
    )
    wmin = W.partitionBy("user_id").orderBy("rn").rowsBetween(W.unboundedPreceding, W.currentRow)
    flo = pre.select(
        "user_id",
        "rn",
        "n",
        (F.col("s") - F.least(F.min("s").over(wmin), F.lit(0).cast("decimal(18,6)"))).alias(
            "bal"
        ),
    )
    return flo.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_events"),
        F.min(F.when(F.col("rn") == F.col("n"), F.col("bal"))).cast("double").alias(
            "final_balance"
        ),
        F.max("bal").cast("double").alias("peak_balance"),
    )
