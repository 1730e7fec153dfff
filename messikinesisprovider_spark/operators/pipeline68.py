"""Round 4 additions, part 43: ANSI-safe arithmetic and cycle-time KPI.

- ``ansi_try_functions`` — the try_* surface that makes ANSI mode
  deployable: this engine runs Spark 4 with ANSI ON (overflow, bad
  casts, division by zero all THROW), and ``try_divide`` /
  ``try_cast`` / ``try_add`` are the per-expression escape hatches that
  return NULL instead of killing a 100 TB job at the one poisoned row.
  Exercised on genuinely poisoned inputs: value/zero divisions where
  value==0 rows exist, casts of the free-text props column to INT (most
  rows fail), and a deliberately overflowing BIGINT add.  The output
  counts successes/nulls per class — the DuckDB twin uses TRY_CAST and
  NULLIF guards.

- ``cycle_time_p50_monthly`` — the order-to-cash operations KPI: per
  order month, the exact median days from order date to the LAST line
  shipment.  Lineitem pre-aggregated per order (the
  revenue_recognition_monthly join shape), integer day spans, and the
  median from a per-month cumulative-count window (first row where
  2*cum >= n — the weighted_median_exact rule at weight 1): months
  bound the partitions, no global sort, no interpolation ambiguity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .relational import events_tbl, spread, tbl

# ---------------------------------------------------------------------------
# ansi_try_functions
# ---------------------------------------------------------------------------

_TRY_ORACLE = """
WITH ev AS (
  SELECT value, props,
         -- try_divide twin: NULL on zero divisor
         CASE WHEN CAST(ROUND(value) AS BIGINT) = 0 THEN NULL
              ELSE 1000.0 / CAST(ROUND(value) AS BIGINT) END AS d,
         TRY_CAST(props AS INTEGER) AS p_int,
         -- try_add twin: this add overflows BIGINT iff value rounds > 0
         CASE WHEN CAST(ROUND(value) AS BIGINT) > 0 THEN NULL
              ELSE 9223372036854775807 + CAST(ROUND(value) AS BIGINT) END AS big
  FROM events WHERE value IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(d) AS BIGINT) AS div_ok,
       CAST(SUM(CASE WHEN d IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS div_null,
       CAST(COUNT(p_int) AS BIGINT) AS cast_ok,
       CAST(COUNT(big) AS BIGINT) AS add_ok,
       CAST(SUM(CASE WHEN big IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS add_overflow
FROM ev
"""


@register(
    "ansi_try_functions",
    oracle=_TRY_ORACLE,
    description="The try_divide/try_cast/try_add escape hatches that make "
    "ANSI mode deployable (one poisoned row must NOT kill a 100 TB job): "
    "exercised on real zero divisors, free-text-to-INT casts, and a "
    "deliberately overflowing BIGINT add; per-class success/null counts, "
    "DuckDB twin via TRY_CAST + guards",
    tags=("sql", "ansi", "extension"),
)
def ansi_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread(): the try_* escape hatches are CPU-bound per row (a failing
    # try_add/try_cast pays a caught JVM ArithmeticException/NumberFormat
    # per poisoned row — ~2 s single-core at sf0.1), and the single-file
    # test scan gives ONE input partition. On a real multi-split table this
    # round-robin is gated off (spread() skips it); locally it unlocks all cores (3.1 s → <0.5 s).
    ev = (
        spread(events_tbl(spark, sf_dir).filter(F.col("value").isNotNull()))
        .select(
            F.expr("try_divide(1000.0, CAST(ROUND(value) AS BIGINT))").alias("d"),
            F.expr("try_cast(props AS INT)").alias("p_int"),
            F.expr(
                "try_add(9223372036854775807, CAST(ROUND(value) AS BIGINT))"
            ).alias("big"),
        )
    )
    return ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("d").cast("long").alias("div_ok"),
        F.sum(F.when(F.col("d").isNull(), 1).otherwise(0)).cast("long").alias("div_null"),
        F.count("p_int").cast("long").alias("cast_ok"),
        F.count("big").cast("long").alias("add_ok"),
        F.sum(F.when(F.col("big").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("add_overflow"),
    )


# ---------------------------------------------------------------------------
# cycle_time_p50_monthly
# ---------------------------------------------------------------------------

_CYCLE_ORACLE = """
WITH spans AS (
  SELECT date_trunc('month', o.o_orderdate) AS month,
         o.o_orderkey,
         date_diff('day', CAST(o.o_orderdate AS DATE),
                   GREATEST(CAST(m.maxship AS DATE), CAST(o.o_orderdate AS DATE)))
           AS days
  FROM orders o
  JOIN (SELECT l_orderkey, MAX(l_shipdate) AS maxship
        FROM lineitem GROUP BY l_orderkey) m
    ON m.l_orderkey = o.o_orderkey
),
ranked AS (
  SELECT month, days,
         SUM(1) OVER (PARTITION BY month ORDER BY days, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         COUNT(*) OVER (PARTITION BY month) AS n
  FROM spans
)
SELECT CAST(month AS TIMESTAMP) AS month,
       CAST(MIN(n) AS BIGINT) AS n_orders,
       CAST(MIN(CASE WHEN 2 * cum >= n THEN days END) AS BIGINT) AS p50_days
FROM ranked
GROUP BY month
"""


@register(
    "cycle_time_p50_monthly",
    oracle=_CYCLE_ORACLE,
    description="Order-to-cash cycle time: per order month, the exact "
    "median days from order date to last shipment (lineitem "
    "pre-aggregated per order; lower-median rule 2*cum >= n from the "
    "per-month cumulative window — months bound the partitions, no "
    "global sort); orders with no lineitems are excluded (no shipment, "
    "no cycle)",
    tags=("analytics", "timeseries", "window", "extension"),
)
def cycle_time_p50_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    maxship = (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("maxship"))
    )
    orders = tbl(spark, sf_dir, "orders")
    spans = orders.join(maxship, orders.o_orderkey == maxship.l_orderkey).select(
        F.date_trunc("month", "o_orderdate").alias("month"),
        "o_orderkey",
        F.datediff(
            F.greatest(F.col("maxship").cast("date"), F.col("o_orderdate").cast("date")),
            F.col("o_orderdate").cast("date"),
        ).alias("days"),
    )
    w = W.partitionBy("month")
    worder = w.orderBy("days", "o_orderkey").rowsBetween(W.unboundedPreceding, W.currentRow)
    ranked = spans.select(
        "month",
        "days",
        F.sum(F.lit(1)).over(worder).alias("cum"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return ranked.groupBy("month").agg(
        F.min("n").cast("long").alias("n_orders"),
        F.min(F.when(2 * F.col("cum") >= F.col("n"), F.col("days")))
        .cast("long")
        .alias("p50_days"),
    ).select(
        F.col("month").cast("timestamp").alias("month"), "n_orders", "p50_days"
    )
