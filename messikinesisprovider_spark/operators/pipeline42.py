"""Round 4 additions, part 17: three relational-surface families the
registry did not yet exercise — recursive CTEs, correlated LATERAL
subqueries, and timezone-aware local-calendar aggregation.

- ``recursive_cte_bom`` — WITH RECURSIVE (new in Spark 4): the
  bill-of-materials / org-chart transitive closure every hierarchy
  flattening needs.  A deterministic forest is derived from ``part``
  (parent(p) = p DIV 4, roots are partkeys < 4), and every node climbs to
  its root accumulating depth; the per-depth reduce proves the full
  closure.  Scale: recursion rounds are bounded by tree DEPTH (log₄ of the
  key domain — 100 TB of parts is still ~20 rounds), each round is one
  equi-join against the static parent map, and Spark's recursive-CTE
  executor unions bounded frontiers exactly like the hand-rolled
  ``graph_khop_reach`` loop — this query is the declarative twin of that
  operator.

- ``lateral_topk_join`` — correlated LATERAL subquery with ORDER BY +
  LIMIT (top-3 customers per nation by account balance): the SQL surface
  users write instead of hand-building a ranking window.  Catalyst
  decorrelates the per-row subquery into a partitioned window over one
  shuffled join — the same physical shape as ``window_topk_per_group`` —
  so the declarative form costs nothing extra at 100 TB (no per-outer-row
  re-execution, which is how a naive engine would run it).

- ``tz_local_activity`` — timezone-aware local-date rollup: the same UTC
  event stream aggregated under four IANA zones (including a half-hour
  offset) via ``from_utc_timestamp``; count + exact decimal value sum per
  (zone, local date).  Both engines resolve offsets from the shared IANA
  database, so local calendars agree bit-for-bit.  Scale: the zone axis is
  a 4-element literal explode (map-side), then one partial-aggregated
  groupBy; no join, no window.

Reference scope note: the reference connector (MessiKinesisProvider)
exposes records to the host engine and leaves SQL to it; these queries
define the relational surface our engine must carry itself
(SURVEY.md §2.5 R-families).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import events_tbl, tbl

# ---------------------------------------------------------------------------
# recursive_cte_bom
# ---------------------------------------------------------------------------

_BOM_ORACLE = """
WITH RECURSIVE climb AS (
  SELECT p_partkey AS node, p_partkey AS cur, CAST(0 AS BIGINT) AS depth
  FROM part
  UNION ALL
  SELECT node, cur // 4 AS cur, depth + 1 AS depth
  FROM climb WHERE cur >= 4
)
SELECT depth,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(COUNT(DISTINCT cur) AS BIGINT) AS n_roots,
       CAST(SUM(node) AS BIGINT) AS node_checksum,
       CAST(SUM(cur) AS BIGINT) AS root_checksum
FROM climb
WHERE cur < 4
GROUP BY depth
"""


@register(
    "recursive_cte_bom",
    oracle=_BOM_ORACLE,
    description="WITH RECURSIVE transitive closure over a deterministic "
    "part forest (parent = key DIV 4): every node climbs to its root, "
    "per-depth node/root accounting proves the closure — the declarative "
    "twin of graph_khop_reach; rounds bounded by tree depth (log4 of the "
    "key domain)",
    tags=("relational", "recursive-cte", "hierarchy", "extension"),
)
def recursive_cte_bom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE hierarchy flattening (see module doc).

    Expressed through spark.sql because WITH RECURSIVE *is* the operator
    under test — Spark 4's recursive-CTE executor (UnionLoop) repeats the
    parent-map join until the frontier empties, which is exactly the
    bounded-frontier iteration graph_khop_reach builds by hand."""
    tbl(spark, sf_dir, "part").createOrReplaceTempView("part_bom")
    return spark.sql(
        """
WITH RECURSIVE climb AS (
  SELECT p_partkey AS node, p_partkey AS cur, CAST(0 AS BIGINT) AS depth
  FROM part_bom
  UNION ALL
  SELECT node, cur DIV 4 AS cur, depth + 1 AS depth
  FROM climb WHERE cur >= 4
)
SELECT depth,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(COUNT(DISTINCT cur) AS BIGINT) AS n_roots,
       CAST(SUM(node) AS BIGINT) AS node_checksum,
       CAST(SUM(cur) AS BIGINT) AS root_checksum
FROM climb
WHERE cur < 4
GROUP BY depth
"""
    )


# ---------------------------------------------------------------------------
# lateral_topk_join
# ---------------------------------------------------------------------------

_LATERAL_K = 3

_LATERAL_ORACLE = f"""
SELECT n.n_name, l.c_custkey, l.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_custkey, c_acctbal
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT {_LATERAL_K}
) l
"""


@register(
    "lateral_topk_join",
    oracle=_LATERAL_ORACLE,
    description=f"Correlated LATERAL subquery with ORDER BY + LIMIT "
    f"(top-{_LATERAL_K} customers per nation by balance, key tiebreak): "
    "Catalyst decorrelates the per-row subquery into one partitioned "
    "ranking window — the declarative twin of window_topk_per_group",
    tags=("relational", "lateral", "subquery", "extension"),
)
def lateral_topk_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL top-k per group (see module doc). spark.sql because the
    LATERAL keyword is the surface under test; the planned shape (window
    over one join, no per-row re-execution) is pinned in tests."""
    tbl(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat")
    tbl(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    return spark.sql(
        f"""
SELECT n.n_name, l.c_custkey, l.c_acctbal
FROM nation_lat n,
LATERAL (
  SELECT c_custkey, c_acctbal
  FROM customer_lat c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT {_LATERAL_K}
) l
"""
    )


# ---------------------------------------------------------------------------
# tz_local_activity
# ---------------------------------------------------------------------------

_TZS = ("America/New_York", "Europe/Berlin", "Asia/Tokyo", "Asia/Kathmandu")

_TZ_ORACLE = f"""
WITH z AS (SELECT UNNEST({list(_TZS)!r}) AS tz),
loc AS (
  SELECT z.tz,
         CAST(timezone(z.tz, timezone('UTC', e.ts)) AS DATE) AS local_date,
         e.value
  FROM events e CROSS JOIN z
)
SELECT tz, CAST(local_date AS TIMESTAMP) AS local_date,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
FROM loc
GROUP BY tz, local_date
"""


@register(
    "tz_local_activity",
    oracle=_TZ_ORACLE,
    description="Timezone-aware local-calendar rollup: the UTC event "
    "stream aggregated under four IANA zones (incl. a +05:45 half-hour "
    "zone) via from_utc_timestamp; both engines resolve offsets from the "
    "shared IANA tzdb so local dates agree exactly; literal zone explode "
    "is map-side, then one partial-aggregated groupBy",
    tags=("relational", "timezone", "scalar", "extension"),
)
def tz_local_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = events_tbl(spark, sf_dir).select("ts", "value")
    loc = e.select(
        F.explode(F.array(*[F.lit(t) for t in _TZS])).alias("tz"),
        "ts",
        "value",
    ).select(
        "tz",
        F.to_date(F.expr("from_utc_timestamp(ts, tz)")).alias("local_date"),
        "value",
    )
    return loc.groupBy("tz", F.col("local_date").cast("timestamp").alias("local_date")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("value_sum"),
    )
