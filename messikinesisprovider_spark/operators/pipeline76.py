"""Round 5 additions, part 8: BI/finance analytics staples.

- ``grouping_id_labeled_rollup`` — ROLLUP with GROUPING() flags folded
  into human-readable 'ALL' labels (the report shape every BI tool emits);
  verifies Spark's and DuckDB's GROUPING() bit semantics against each
  other on a two-level revenue rollup.
- ``revenue_bridge_monthly`` — the month-over-month revenue bridge
  (waterfall): per month, revenue split into NEW (customer's first month),
  EXPANSION (grew vs prior month), CONTRACTION (shrank), CHURNED (prior
  month's revenue of customers who went to zero). Per-customer-month
  revenue in exact integer cents; consecutive months compared via a
  1-month self-join (never a global window); the bridge identity
  rev(m) - rev(m-1) = new + expansion - contraction - churned holds
  exactly in cents and is verified by the oracle columns.
- ``pareto_8020_revenue`` — the Pareto concentration report: customers
  ranked by revenue (two-pass range-partitioned global ranking with a
  running cents total — no single-partition window), emitting for each
  decile boundary the cumulative share of revenue, plus the minimal
  customer fraction covering >= 80% of revenue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .ranking import global_row_number
from .relational import spread, tbl

# ---------------------------------------------------------------------------
# grouping_id_labeled_rollup
# ---------------------------------------------------------------------------

_GID_ORACLE = """
SELECT CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END
         AS priority,
       CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END
         AS status,
       CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT)
         AS level_id,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


@register(
    "grouping_id_labeled_rollup",
    oracle=_GID_ORACLE,
    description="ROLLUP with GROUPING() flags folded into 'ALL' labels and "
    "an explicit level id — the BI report shape; verifies both engines' "
    "GROUPING() bit semantics against each other",
    tags=("sql", "agg", "rollup", "extension"),
)
def grouping_id_labeled_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("orders_gid")
    return spark.sql(
        """
        SELECT CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
                    ELSE o_orderpriority END AS priority,
               CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
                    ELSE o_orderstatus END AS status,
               CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT)
                 AS level_id,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM orders_gid
        GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        """
    )


# ---------------------------------------------------------------------------
# revenue_bridge_monthly
# ---------------------------------------------------------------------------

_BRIDGE_ORACLE = """
WITH cm AS (
  SELECT o_custkey AS cust, date_trunc('month', o_orderdate) AS m,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
  FROM orders WHERE o_totalprice IS NOT NULL AND abs(o_totalprice) < 1e12
  GROUP BY 1, 2
),
firstm AS (SELECT cust, MIN(m) AS first_m FROM cm GROUP BY cust),
paired AS (
  SELECT cur.cust, cur.m,
         cur.rev_c AS rev_now,
         COALESCE(prev.rev_c, 0) AS rev_prev,
         CASE WHEN cur.m = f.first_m THEN 1 ELSE 0 END AS is_new
  FROM cm cur
  JOIN firstm f ON f.cust = cur.cust
  LEFT JOIN cm prev ON prev.cust = cur.cust
                   AND prev.m = cur.m - INTERVAL 1 MONTH
),
churn AS (
  SELECT prev.m + INTERVAL 1 MONTH AS m, SUM(prev.rev_c) AS churned_c
  FROM cm prev
  LEFT JOIN cm nxt ON nxt.cust = prev.cust
                  AND nxt.m = prev.m + INTERVAL 1 MONTH
  WHERE nxt.cust IS NULL
  GROUP BY 1
),
bridge AS (
  SELECT m,
         SUM(rev_now) AS rev_c,
         SUM(CASE WHEN is_new = 1 THEN rev_now ELSE 0 END) AS new_c,
         SUM(CASE WHEN is_new = 0 AND rev_now > rev_prev
                  THEN rev_now - rev_prev ELSE 0 END) AS expansion_c,
         SUM(CASE WHEN is_new = 0 AND rev_now < rev_prev
                  THEN rev_prev - rev_now ELSE 0 END) AS contraction_c
  FROM paired GROUP BY m
)
SELECT CAST(b.m AS TIMESTAMP) AS month,
       CAST(b.rev_c AS BIGINT) AS revenue_cents,
       CAST(b.new_c AS BIGINT) AS new_cents,
       CAST(b.expansion_c AS BIGINT) AS expansion_cents,
       CAST(b.contraction_c AS BIGINT) AS contraction_cents,
       CAST(COALESCE(c.churned_c, 0) AS BIGINT) AS churned_cents
FROM bridge b LEFT JOIN churn c ON c.m = b.m
"""


@register(
    "revenue_bridge_monthly",
    oracle=_BRIDGE_ORACLE,
    description="Month-over-month revenue bridge (waterfall): new / "
    "expansion / contraction / churned revenue per month in exact integer "
    "cents; consecutive months via a 1-month self-join, identity "
    "rev(m)-rev(m-1) = new+expansion-contraction-churned holds exactly",
    tags=("analytics", "finance", "extension"),
)
def revenue_bridge_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    cm = (
        spread(tbl(spark, sf_dir, "orders"))
        .where(
            F.col("o_totalprice").isNotNull() & (F.abs("o_totalprice") < F.lit(1e12))
        )
        .groupBy(
            F.col("o_custkey").alias("cust"),
            F.date_trunc("month", "o_orderdate").alias("m"),
        )
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).alias("rev_c")
        )
        .persist()
    )
    firstm = cm.groupBy("cust").agg(F.min("m").alias("first_m"))
    prev = cm.select(
        F.col("cust").alias("p_cust"),
        F.expr("m + INTERVAL 1 MONTH").alias("p_m"),
        F.col("rev_c").alias("rev_prev"),
    )
    paired = (
        cm.join(firstm, "cust")
        .join(
            prev,
            (F.col("cust") == F.col("p_cust")) & (F.col("m") == F.col("p_m")),
            "left",
        )
        .select(
            "m",
            F.col("rev_c").alias("rev_now"),
            F.coalesce(F.col("rev_prev"), F.lit(0)).alias("rev_prev"),
            F.when(F.col("m") == F.col("first_m"), 1).otherwise(0).alias("is_new"),
        )
    )
    nxt = cm.select(
        F.col("cust").alias("n_cust"),
        F.col("m").alias("n_m"),
    )
    churn = (
        cm.join(
            nxt,
            (F.col("cust") == F.col("n_cust"))
            & (F.expr("m + INTERVAL 1 MONTH") == F.col("n_m")),
            "left_anti",
        )
        .groupBy(F.expr("m + INTERVAL 1 MONTH").alias("cm_m"))
        .agg(F.sum("rev_c").alias("churned_c"))
    )
    bridge = paired.groupBy("m").agg(
        F.sum("rev_now").alias("rev_c"),
        F.sum(F.when(F.col("is_new") == 1, F.col("rev_now")).otherwise(0)).alias("new_c"),
        F.sum(
            F.when(
                (F.col("is_new") == 0) & (F.col("rev_now") > F.col("rev_prev")),
                F.col("rev_now") - F.col("rev_prev"),
            ).otherwise(0)
        ).alias("expansion_c"),
        F.sum(
            F.when(
                (F.col("is_new") == 0) & (F.col("rev_now") < F.col("rev_prev")),
                F.col("rev_prev") - F.col("rev_now"),
            ).otherwise(0)
        ).alias("contraction_c"),
    )
    return bridge.join(churn, bridge.m == churn.cm_m, "left").select(
        F.col("m").cast("timestamp").alias("month"),
        F.col("rev_c").cast("long").alias("revenue_cents"),
        F.col("new_c").cast("long").alias("new_cents"),
        F.col("expansion_c").cast("long").alias("expansion_cents"),
        F.col("contraction_c").cast("long").alias("contraction_cents"),
        F.coalesce(F.col("churned_c"), F.lit(0)).cast("long").alias("churned_cents"),
    )


# ---------------------------------------------------------------------------
# pareto_8020_revenue
# ---------------------------------------------------------------------------

_PARETO_ORACLE = """
WITH cr AS (
  SELECT o_custkey AS cust,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
  FROM orders WHERE o_totalprice IS NOT NULL AND abs(o_totalprice) < 1e12
  GROUP BY 1
),
ranked AS (
  SELECT cust, rev_c,
         ROW_NUMBER() OVER (ORDER BY rev_c DESC, cust) AS rn,
         SUM(rev_c) OVER (ORDER BY rev_c DESC, cust
                          ROWS UNBOUNDED PRECEDING) AS cum_c
  FROM cr
),
tot AS (SELECT COUNT(*) AS n, SUM(rev_c) AS total_c FROM cr)
SELECT CAST(d.decile AS BIGINT) AS customer_decile,
       CAST(x.rn AS BIGINT) AS n_customers,
       CAST(x.cum_c AS BIGINT) AS cum_revenue_cents,
       CAST(ROUND(CAST(x.cum_c AS DOUBLE) / t.total_c, 6) AS DOUBLE) AS cum_share,
       CAST(t.p80_n AS BIGINT) AS customers_for_80pct
FROM (SELECT UNNEST(range(1, 11)) AS decile) d
JOIN (SELECT n, total_c,
             (SELECT MIN(rn) FROM ranked WHERE 5 * cum_c >= 4 * (SELECT total_c FROM tot))
               AS p80_n
      FROM tot) t ON TRUE
JOIN ranked x ON x.rn = CAST(floor(d.decile * t.n / 10.0) AS BIGINT)
WHERE t.total_c > 0
ORDER BY d.decile
"""


@register(
    "pareto_8020_revenue",
    oracle=_PARETO_ORACLE,
    description="Pareto concentration report: cumulative revenue share at "
    "each customer decile (two-pass range-partitioned global ranking with "
    "a running cents total) plus the minimal customer count covering 80% "
    "of revenue — exact integer cents, one double division per share",
    tags=("analytics", "statistics", "ranking", "extension"),
)
def pareto_8020_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cr = (
        spread(tbl(spark, sf_dir, "orders"))
        .where(
            F.col("o_totalprice").isNotNull() & (F.abs("o_totalprice") < F.lit(1e12))
        )
        .groupBy(F.col("o_custkey").alias("cust"))
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).alias("rev_c")
        )
    )
    ranked, n = global_row_number(
        cr, [F.col("rev_c").desc(), F.col("cust")], rn_col="rn", running_sums={"rev_c": "cum_c"}
    )
    ranked = ranked.persist()
    tot = ranked.agg(
        F.coalesce(F.sum("rev_c"), F.lit(0)).alias("total_c"),
        F.count(F.lit(1)).alias("n"),
    )
    p80 = (
        ranked.crossJoin(F.broadcast(tot))
        .filter(5 * F.col("cum_c") >= 4 * F.col("total_c"))
        .agg(F.min("rn").alias("p80_n"))
    )
    deciles = ranked.sparkSession.range(1, 11).select(F.col("id").alias("decile"))
    spine = deciles.crossJoin(F.broadcast(tot)).select(
        "decile",
        "total_c",
        F.expr("CAST(floor(decile * n / 10.0) AS BIGINT)").alias("pick_rn"),
    )
    return (
        spine.join(ranked, spine.pick_rn == ranked.rn)
        .crossJoin(F.broadcast(p80))
        .filter(F.col("total_c") > 0)
        .select(
            F.col("decile").cast("long").alias("customer_decile"),
            F.col("rn").cast("long").alias("n_customers"),
            F.col("cum_c").cast("long").alias("cum_revenue_cents"),
            F.round(F.col("cum_c").cast("double") / F.col("total_c"), 6)
            .cast("double")
            .alias("cum_share"),
            F.col("p80_n").cast("long").alias("customers_for_80pct"),
        )
        .orderBy("customer_decile")
    )
