"""Round 5 additions, part 2: modern SQL-surface breadth.

Five surfaces a user migrating real SQL workloads hits immediately, each
verified against the identical construct in DuckDB:

- ``group_by_all_daily_mix`` — ``GROUP BY ALL`` (infer grouping keys from
  the select list; Spark 3.4+/DuckDB both support it) over the events table.
- ``agg_filter_clause`` — the ANSI ``agg(...) FILTER (WHERE ...)`` clause:
  several conditional aggregates in ONE pass without CASE-wrapping.
- ``mode_per_group_exact`` — deterministic per-group mode. Spark's and
  DuckDB's ``MODE()`` both pick an ARBITRARY value among tied candidates, so
  the portable (and driver-hashable) form is count + row_number with a full
  (count DESC, value) tiebreak — the groupwise-max shape.
- ``percentile_disc_within_group`` — ordered-set aggregate
  ``PERCENTILE_DISC(q) WITHIN GROUP (ORDER BY v)``: exact order statistics
  (no interpolation), deterministic under ties by definition.
- ``exists_correlated_audit`` — correlated ``EXISTS`` / ``NOT EXISTS``
  pair (the semi/anti-join surface SQL users write; Catalyst rewrites both
  to the same SemiJoin/AntiJoin the join_semi/join_anti queries pin).

Scale notes: every query is one or two map-side-combined aggregations or a
semi/anti join on the natural key — no windows over unpartitioned data, no
row explosion. The disc-percentile window partitions by event_type (150
groups at sf0.1, each windowed independently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from .relational import events_tbl, tbl

# ---------------------------------------------------------------------------
# group_by_all_daily_mix
# ---------------------------------------------------------------------------

_GBA_ORACLE = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(COALESCE(value, 0) AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY ALL
"""


@register(
    "group_by_all_daily_mix",
    oracle=_GBA_ORACLE,
    description="GROUP BY ALL (grouping keys inferred from the select list) "
    "over events: daily per-type counts, distinct users, decimal-exact sums",
    tags=("sql", "agg", "extension"),
)
def group_by_all_daily_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    events_tbl(spark, sf_dir).createOrReplaceTempView("events_gba")
    return spark.sql(
        """
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(SUM(CAST(COALESCE(value, 0) AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM events_gba
        GROUP BY ALL
        """
    )


# ---------------------------------------------------------------------------
# agg_filter_clause
# ---------------------------------------------------------------------------

_FILTER_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
            FILTER (WHERE o_totalprice > 100000) AS DOUBLE) AS big_revenue,
       CAST(COUNT(DISTINCT o_custkey) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
         AS finished_customers
FROM orders
GROUP BY o_orderpriority
"""


@register(
    "agg_filter_clause",
    oracle=_FILTER_ORACLE,
    description="ANSI aggregate FILTER (WHERE ...) clause: four conditional "
    "aggregates (counts, decimal sum, filtered distinct) in ONE scan-and-"
    "aggregate pass, no CASE wrapping",
    tags=("sql", "agg", "extension"),
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("orders_fc")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                    FILTER (WHERE o_totalprice > 100000) AS DOUBLE) AS big_revenue,
               CAST(COUNT(DISTINCT o_custkey) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
                 AS finished_customers
        FROM orders_fc
        GROUP BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# mode_per_group_exact
# ---------------------------------------------------------------------------

_MODE_ORACLE = """
WITH c AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
  FROM customer WHERE c_mktsegment IS NOT NULL GROUP BY 1, 2
)
SELECT CAST(c_nationkey AS INTEGER) AS c_nationkey,
       c_mktsegment AS mode_segment,
       CAST(n AS BIGINT) AS n
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey
                               ORDER BY n DESC, c_mktsegment) AS rn
  FROM c
) WHERE rn = 1
"""


@register(
    "mode_per_group_exact",
    oracle=_MODE_ORACLE,
    description="Deterministic per-group MODE (most frequent market segment "
    "per nation): count + row_number with full (count DESC, value) tiebreak "
    "— the portable form of the tie-arbitrary built-in MODE()",
    tags=("sql", "agg", "window", "extension"),
)
def mode_per_group_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "customer").createOrReplaceTempView("customer_mode")
    return spark.sql(
        """
        WITH c AS (
          -- SQL MODE() ignores NULLs; without the filter a NULL-segment
          -- plurality would win under Spark's NULLS FIRST tiebreak and
          -- lose under DuckDB's NULLS LAST
          SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
          FROM customer_mode WHERE c_mktsegment IS NOT NULL GROUP BY 1, 2
        )
        SELECT CAST(c_nationkey AS INT) AS c_nationkey,
               c_mktsegment AS mode_segment,
               CAST(n AS BIGINT) AS n
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                       ORDER BY n DESC, c_mktsegment) AS rn
          FROM c
        ) WHERE rn = 1
        """
    )


# ---------------------------------------------------------------------------
# percentile_disc_within_group
# ---------------------------------------------------------------------------

_DISC_ORACLE = """
SELECT event_type,
       CAST(COUNT(value) AS BIGINT) AS n,
       PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY value) AS p25,
       PERCENTILE_DISC(0.5)  WITHIN GROUP (ORDER BY value) AS p50,
       PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY value) AS p75
FROM events
WHERE value IS NOT NULL
GROUP BY event_type
"""


@register(
    "percentile_disc_within_group",
    oracle=_DISC_ORACLE,
    description="Ordered-set aggregate PERCENTILE_DISC WITHIN GROUP: exact "
    "order statistics (an actually-occurring value, no interpolation) per "
    "event type — deterministic by definition, unlike percentile_cont's "
    "float interpolation",
    tags=("sql", "agg", "statistics", "extension"),
)
def percentile_disc_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    events_tbl(spark, sf_dir).createOrReplaceTempView("events_disc")
    return spark.sql(
        """
        SELECT event_type,
               CAST(COUNT(value) AS BIGINT) AS n,
               PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY value) AS p25,
               PERCENTILE_DISC(0.5)  WITHIN GROUP (ORDER BY value) AS p50,
               PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY value) AS p75
        FROM events_disc
        WHERE value IS NOT NULL
        GROUP BY event_type
        """
    )


# ---------------------------------------------------------------------------
# exists_correlated_audit
# ---------------------------------------------------------------------------

_EXISTS_ORACLE = """
SELECT c.c_custkey, c.c_mktsegment
FROM customer c
WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
      )
  AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
          AND o.o_totalprice > 300000
      )
ORDER BY c.c_custkey
"""


@register(
    "exists_correlated_audit",
    oracle=_EXISTS_ORACLE,
    description="Correlated EXISTS + NOT EXISTS pair (customers with an "
    "urgent order but no large finished one): the SQL spelling Catalyst "
    "rewrites to the semi/anti joins the join_semi/join_anti queries pin",
    tags=("sql", "subquery", "join", "extension"),
)
def exists_correlated_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "customer").createOrReplaceTempView("customer_ex")
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("orders_ex")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment
        FROM customer_ex c
        WHERE EXISTS (
                SELECT 1 FROM orders_ex o
                WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
              )
          AND NOT EXISTS (
                SELECT 1 FROM orders_ex o
                WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
                  AND o.o_totalprice > 300000
              )
        ORDER BY c.c_custkey
        """
    )
