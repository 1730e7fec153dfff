"""Round 4 additions, part 14: in-flight query observability.

``observed_metrics_audit`` — Spark's ``Observation``/``df.observe`` API as
a first-class, oracle-checked operator: metrics (row counts, null counts,
decimal value sums, extremes) are attached to the scan ONCE and collected
as a side effect of the SAME job that computes the query result — the
production pattern for data-quality circuit breakers (abort the write if
the batch's observed null rate spikes) without paying a second scan.

The registered result IS the observed metrics row (plus the main query's
aggregate), so the driver compare verifies that observe() reports exactly
what a second aggregation pass would have — one scan, two consumers.

At 100 TB this is the difference between 2N and N scan bytes for every
monitored pipeline stage; observe() piggybacks on whatever the query
already reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation

from ..registry import register
from .relational import events_tbl

_OBS_ORACLE = """
WITH m AS (
  SELECT COUNT(*) AS n_rows,
         SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS n_null_value,
         SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS n_null_user,
         CAST(SUM(CAST(COALESCE(value, 0) AS DECIMAL(18,6))) AS DOUBLE) AS value_sum,
         CAST(MIN(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_min,
         CAST(MAX(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_max
  FROM events
),
q AS (
  SELECT COUNT(DISTINCT event_type) AS n_types FROM events WHERE value IS NOT NULL
)
SELECT CAST(m.n_rows AS BIGINT) AS n_rows,
       CAST(m.n_null_value AS BIGINT) AS n_null_value,
       CAST(m.n_null_user AS BIGINT) AS n_null_user,
       m.value_sum, m.value_min, m.value_max,
       CAST(q.n_types AS BIGINT) AS n_types
FROM m CROSS JOIN q
"""


@register(
    "observed_metrics_audit",
    oracle=_OBS_ORACLE,
    description="df.observe()/Observation as an operator: DQ metrics (rows, "
    "nulls, decimal sums, extremes) collected as a side effect of the main "
    "query's single scan — verified to equal what a second aggregation pass "
    "would report (the 2N->N scan saving for monitored stages)",
    tags=("observability", "dq", "audit", "extension"),
)
def observed_metrics_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_tbl(spark, sf_dir)
    obs = Observation("dq")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null_value"),
        F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null_user"),
        F.sum(F.coalesce(F.col("value"), F.lit(0)).cast("decimal(18,6)"))
        .cast("double")
        .alias("value_sum"),
        F.min(F.col("value").cast("decimal(18,6)")).cast("double").alias("value_min"),
        F.max(F.col("value").cast("decimal(18,6)")).cast("double").alias("value_max"),
    )
    # the main query the metrics piggyback on — ONE job computes both
    main = observed.filter(F.col("value").isNotNull()).agg(
        F.count_distinct("event_type").cast("long").alias("n_types")
    )
    [main_row] = main.collect()  # triggers the job; observation now filled
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["n_null_value"],
                m["n_null_user"],
                m["value_sum"],
                m["value_min"],
                m["value_max"],
                main_row["n_types"],
            )
        ],
        "n_rows bigint, n_null_value bigint, n_null_user bigint, "
        "value_sum double, value_min double, value_max double, n_types bigint",
    )
