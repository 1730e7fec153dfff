"""Event-analytics operators: funnel conversion and cohort retention
(round 2, appended).

The two aggregate shapes every product-analytics load on an event log needs
beyond sessionization (which lives in relational3/verified):

- ``funnel_conversion`` — ordered multi-stage funnel with a completion
  deadline: stage N counts a user only if stage N's event happened AFTER
  their stage N-1 time and within the window of their stage-1 entry.
- ``cohort_retention`` — weekly cohorts (first-seen week) x week-offset
  activity matrix, the retention triangle.

Determinism: outputs are counts over exact timestamp comparisons — no
floating aggregation — so both hash-match the DuckDB oracle directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import events_tbl

_FUNNEL_DAYS = 14  # stage-1 entry -> completion deadline


@register(
    "funnel_conversion",
    oracle=f"""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'click' GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'view' AND e.ts >= s1.t1
        AND e.ts <= s1.t1 + INTERVAL {_FUNNEL_DAYS} DAY
      GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e
      JOIN s1 ON e.user_id = s1.user_id
      JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
        AND e.ts <= s1.t1 + INTERVAL {_FUNNEL_DAYS} DAY
      GROUP BY 1
    )
    SELECT 1 AS stage, 'click' AS stage_name, (SELECT COUNT(*) FROM s1) AS n_users
    UNION ALL
    SELECT 2, 'view', (SELECT COUNT(*) FROM s2)
    UNION ALL
    SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
    """,
    description=f"Ordered 3-stage funnel (click -> view -> purchase) with a "
    f"{_FUNNEL_DAYS}-day completion deadline from stage-1 entry",
    tags=("analytics", "funnel", "extension"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel — each stage's earliest qualifying time feeds the next
    stage's lower bound, and the whole funnel must complete within
    {_FUNNEL_DAYS} days of the user's stage-1 entry.

    Scale: each stage is one hash aggregation keyed by user_id; the joins
    between stage tables are equi-joins on the SAME key, so after the first
    shuffle every subsequent stage co-partitions (Spark reuses the hash
    partitioning — no re-shuffle of the per-user side). The events scan is
    filtered per stage by event_type at the source (pushed predicate), so a
    3-stage funnel reads ~3 slim slices, not 3 full scans of the log.
    """
    ev = events_tbl(spark, sf_dir)
    s1 = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    deadline = F.col("t1") + F.expr(f"INTERVAL {_FUNNEL_DAYS} DAYS")
    s2 = (
        ev.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter((F.col("ts") >= F.col("t1")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.first("t1").alias("t1"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2.select("user_id", "t1", "t2"), "user_id")
        .filter((F.col("ts") >= F.col("t2")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    def stage(n: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(n).alias("stage"),
            F.lit(name).alias("stage_name"),
            F.count(F.lit(1)).alias("n_users"),
        )

    return stage(1, "click", s1).unionAll(stage(2, "view", s2)).unionAll(
        stage(3, "purchase", s3)
    )


@register(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY 1
    ),
    active AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             datediff('week', f.cohort_week, date_trunc('week', e.ts)) AS week_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    ),
    sizes AS (
      SELECT cohort_week, COUNT(*) AS n_cohort_users FROM firsts GROUP BY 1
    )
    SELECT a.cohort_week::TIMESTAMP AS cohort_week,
           a.week_offset,
           COUNT(*) AS n_active_users,
           s.n_cohort_users
    FROM active a JOIN sizes s ON a.cohort_week = s.cohort_week
    GROUP BY 1, 2, 4
    """,
    description="Weekly cohort retention triangle: first-seen week x "
    "week-offset distinct active users, with cohort size attached",
    tags=("analytics", "retention", "extension"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retention triangle: users cohorted by first-seen week, counted
    distinct in each subsequent week.

    Scale: first-seen is one user-keyed aggregation; attaching the cohort
    label is an equi-join on the same key (co-partitioned, no extra
    shuffle); the distinct-activity reduction happens BEFORE the final
    (tiny) cohort x offset aggregation, so the wide data never reaches a
    narrow-key shuffle — the classic guard against cohort-key skew (every
    launch-week user funneling into one reducer).
    """
    ev = events_tbl(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_cohort_users")
    )
    return (
        active.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
        .join(sizes, "cohort_week")
        .select("cohort_week", "week_offset", "n_active_users", "n_cohort_users")
    )
