"""Round 5 additions, part 5: window/string surface breadth + the outer
salted join.

- ``window_ignore_nulls_nav`` — the navigation-function wrinkles real
  backfill queries use: LAG ... IGNORE NULLS (last observed reading),
  NTH_VALUE over a running frame, and a COUNT over a time-based
  ``RANGE BETWEEN INTERVAL 1 HOUR PRECEDING`` frame — all partitioned by
  user (never a global window).
- ``string_functions_3`` — the portable remainder of the scalar string
  surface: translate, ascii/chr, left/right, bounded levenshtein — each
  verified against DuckDB's identically-named function.
- ``skew_salted_left_join`` — the OUTER variant of skew_salted_join: a
  hot-key fact side LEFT-joined to a salt-replicated filtered dimension.
  The left-outer case is where naive salting silently corrupts results —
  an unmatched fact row must survive exactly once (its salt row finds no
  dim twin), never S times; replicating only the DIM side keeps that
  invariant, and the oracle is the plain unsalted LEFT JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import events_tbl, tbl

# ---------------------------------------------------------------------------
# window_ignore_nulls_nav
# ---------------------------------------------------------------------------

_NAV_ORACLE = """
WITH ev AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS reading
  FROM events WHERE user_id IS NOT NULL AND user_id % 50 = 0
)
SELECT user_id, event_id,
       lag(reading IGNORE NULLS) OVER w AS prev_reading,
       lead(reading IGNORE NULLS) OVER w AS next_reading,
       nth_value(reading, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS second_reading,
       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS n_last_hour
FROM ev
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register(
    "window_ignore_nulls_nav",
    oracle=_NAV_ORACLE,
    description="Navigation windows with IGNORE NULLS (last/next observed "
    "reading across gaps), NTH_VALUE over a running frame, and a "
    "time-based RANGE INTERVAL 1 HOUR frame — all user-partitioned",
    tags=("sql", "window", "extension"),
)
def window_ignore_nulls_nav(spark: SparkSession, sf_dir: str) -> DataFrame:
    events_tbl(spark, sf_dir).createOrReplaceTempView("events_nav")
    return spark.sql(
        """
        WITH ev AS (
          SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                 CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS reading
          FROM events_nav WHERE user_id IS NOT NULL AND user_id % 50 = 0
        )
        SELECT user_id, event_id,
               lag(reading) IGNORE NULLS OVER w AS prev_reading,
               lead(reading) IGNORE NULLS OVER w AS next_reading,
               nth_value(reading, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS second_reading,
               CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                   AND CURRENT ROW) AS BIGINT) AS n_last_hour
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """
    )


# ---------------------------------------------------------------------------
# string_functions_3
# ---------------------------------------------------------------------------

_STR3_ORACLE = """
SELECT c_custkey,
       translate(c_name, '#0123456789', '*') AS name_digits_stripped,
       ascii(c_mktsegment) AS seg_first_code,
       chr(65 + CAST(c_custkey % 26 AS INTEGER)) AS rotor,
       left(c_name, 8) AS name_l8,
       right(c_name, 4) AS name_r4,
       CAST(levenshtein(left(c_name, 8), 'Customer') AS BIGINT) AS lev_to_customer
FROM customer
WHERE c_custkey % 100 = 0 AND c_name IS NOT NULL
ORDER BY c_custkey
"""


@register(
    "string_functions_3",
    oracle=_STR3_ORACLE,
    description="Portable scalar string surface, part 3: translate, "
    "ascii/chr, left/right, bounded levenshtein — verified against "
    "DuckDB's identically-named functions",
    tags=("sql", "scalar", "string", "extension"),
)
def string_functions_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "customer").createOrReplaceTempView("customer_s3")
    return spark.sql(
        """
        SELECT c_custkey,
               translate(c_name, '#0123456789', '*') AS name_digits_stripped,
               ascii(c_mktsegment) AS seg_first_code,
               chr(65 + CAST(c_custkey % 26 AS INT)) AS rotor,
               left(c_name, 8) AS name_l8,
               right(c_name, 4) AS name_r4,
               CAST(levenshtein(left(c_name, 8), 'Customer') AS BIGINT) AS lev_to_customer
        FROM customer_s3
        WHERE c_custkey % 100 = 0 AND c_name IS NOT NULL
        ORDER BY c_custkey
        """
    )


# ---------------------------------------------------------------------------
# skew_salted_left_join
# ---------------------------------------------------------------------------

_N_SALTS = 8

_SALT_LEFT_ORACLE = """
WITH dim AS (
  SELECT c_custkey AS user_id, c_mktsegment AS segment
  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
),
j AS (
  SELECT e.user_id, e.value, d.segment
  FROM events e LEFT JOIN dim d ON d.user_id = e.user_id
  WHERE e.user_id IS NOT NULL
)
SELECT COALESCE(segment, '<unmatched>') AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(COALESCE(value, 0) AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM j GROUP BY 1
"""


@register(
    "skew_salted_left_join",
    oracle=_SALT_LEFT_ORACLE,
    description=f"Hot-key-safe LEFT OUTER salted join: fact side salted by "
    f"hash%{_N_SALTS}, dimension replicated once per salt — an unmatched "
    "fact survives exactly once (its salt row finds no twin), so the result "
    "provably equals the plain LEFT JOIN the oracle runs",
    tags=("join", "skew", "extension"),
)
def skew_salted_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Why the outer case needs care: salting the FACT side only (then
    replicating the dim per salt) keeps left-outer semantics — each fact row
    exists once with one salt value, so a missing dim key yields exactly one
    null-extended row. Salting/exploding the fact side S ways (the inner-join
    trick applied blindly) would emit S null rows per unmatched fact. At
    100 TB with a hot user, this is the shape that spreads the hot key over
    {_N_SALTS} reducers without changing results."""
    dim = (
        tbl(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment"))
    )
    dim_salted = dim.crossJoin(
        F.broadcast(
            dim.sparkSession.range(_N_SALTS).select(F.col("id").cast("int").alias("salt"))
        )
    )
    fact = (
        events_tbl(spark, sf_dir)
        .where(F.col("user_id").isNotNull())
        .select(
            "user_id",
            "value",
            F.pmod(F.hash("user_id"), F.lit(_N_SALTS)).cast("int").alias("salt"),
        )
    )
    j = fact.join(dim_salted, ["user_id", "salt"], "left")
    return j.groupBy(
        F.coalesce(F.col("segment"), F.lit("<unmatched>")).alias("segment")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.expr(
            "CAST(SUM(CAST(COALESCE(value, 0) AS DECIMAL(18,6))) AS DOUBLE)"
        ).alias("sum_value"),
    )
