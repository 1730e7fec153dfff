"""Round 5 additions, part 11: cohort LTV and cross-table reconciliation.

- ``cohort_ltv_cumulative`` — the product-analytics LTV triangle: customers
  cohorted by first-order month; for each (cohort, months-since-first)
  cell, the cumulative revenue per cohort member in exact integer cents
  (the money complement of the user-count retention triangle already
  registered). The cumulative runs over the |cohorts| x |ages| micro-table
  via an age-bounded theta join (the user_growth_curve class) — never a
  global window.
- ``reconciliation_orders_lineitems`` — the cross-table DQ reconciliation
  every warehouse runs nightly: orders without lineitems, lineitems
  without a parent order, and the revenue tie-out between o_totalprice and
  the lineitem gross extension sum(extendedprice*(1-discount)*(1+tax)) —
  mismatch counted at a cent tolerance, both sides quantized identically.
  One full-outer aggregate-to-aggregate join on the order key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import spread, tbl

# ---------------------------------------------------------------------------
# cohort_ltv_cumulative
# ---------------------------------------------------------------------------

_LTV_ORACLE = """
WITH o AS (
  SELECT o_custkey AS cust, date_trunc('month', o_orderdate) AS m,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_totalprice IS NOT NULL AND abs(o_totalprice) < 1e12
),
cohort AS (SELECT cust, MIN(m) AS c0 FROM o GROUP BY cust),
sizes AS (SELECT c0, COUNT(*) AS n_cust FROM cohort GROUP BY c0),
cell AS (
  SELECT c.c0, date_diff('month', c.c0, o.m) AS age, SUM(o.cents) AS rev_c
  FROM o JOIN cohort c ON c.cust = o.cust
  GROUP BY c.c0, date_diff('month', c.c0, o.m)
),
cum AS (
  SELECT a.c0, a.age, CAST(SUM(b.rev_c) AS BIGINT) AS cum_rev_c
  FROM cell a JOIN cell b ON b.c0 = a.c0 AND b.age <= a.age
  GROUP BY a.c0, a.age
)
SELECT CAST(cum.c0 AS TIMESTAMP) AS cohort_month,
       CAST(cum.age AS BIGINT) AS age_months,
       CAST(s.n_cust AS BIGINT) AS cohort_size,
       cum.cum_rev_c AS cum_revenue_cents,
       CAST(cum.cum_rev_c // s.n_cust AS BIGINT) AS ltv_cents_per_customer
FROM cum JOIN sizes s ON s.c0 = cum.c0
WHERE cum.age <= 12
"""


@register(
    "cohort_ltv_cumulative",
    oracle=_LTV_ORACLE,
    description="Cohort LTV triangle: cumulative revenue per cohort member "
    "by months-since-first-order (exact integer cents; age-bounded theta "
    "join over the cohort-age micro-table, first 12 ages) — the money "
    "complement of the retention triangle",
    tags=("analytics", "finance", "cohort", "extension"),
)
def cohort_ltv_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        spread(tbl(spark, sf_dir, "orders"))
        .where(
            F.col("o_totalprice").isNotNull() & (F.abs("o_totalprice") < F.lit(1e12))
        )
        .select(
            F.col("o_custkey").alias("cust"),
            F.date_trunc("month", "o_orderdate").alias("m"),
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
    )
    cohort = o.groupBy("cust").agg(F.min("m").alias("c0"))
    sizes = cohort.groupBy("c0").agg(F.count(F.lit(1)).alias("n_cust"))
    cell = (
        o.join(cohort, "cust")
        .groupBy(
            "c0",
            F.expr(
                "(year(m) - year(c0)) * 12 + (month(m) - month(c0))"
            ).alias("age"),
        )
        .agg(F.sum("cents").alias("rev_c"))
        .persist()
    )
    a = cell.select(F.col("c0").alias("a_c0"), F.col("age").alias("a_age"))
    cum = (
        a.join(
            cell,
            (F.col("c0") == F.col("a_c0")) & (F.col("age") <= F.col("a_age")),
        )
        .groupBy(F.col("a_c0").alias("c0"), F.col("a_age").alias("age"))
        .agg(F.sum("rev_c").cast("long").alias("cum_rev_c"))
    )
    return (
        cum.join(sizes, "c0")
        .where(F.col("age") <= 12)
        .select(
            F.col("c0").cast("timestamp").alias("cohort_month"),
            F.col("age").cast("long").alias("age_months"),
            F.col("n_cust").cast("long").alias("cohort_size"),
            F.col("cum_rev_c").alias("cum_revenue_cents"),
            F.expr("cum_rev_c div n_cust").cast("long").alias("ltv_cents_per_customer"),
        )
    )


# ---------------------------------------------------------------------------
# reconciliation_orders_lineitems
# ---------------------------------------------------------------------------

_RECON_ORACLE = """
WITH osum AS (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_c
  FROM orders WHERE abs(COALESCE(o_totalprice, 0)) < 1e12
),
lsum AS (
  SELECT l_orderkey,
         COUNT(*) AS n_lines,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100)
             AS BIGINT)) AS gross_c
  FROM lineitem
  WHERE abs(COALESCE(l_extendedprice, 0)) < 1e12
  GROUP BY l_orderkey
),
j AS (
  SELECT o.o_orderkey, o.total_c, l.l_orderkey, l.gross_c
  FROM osum o FULL OUTER JOIN lsum l ON l.l_orderkey = o.o_orderkey
)
SELECT CAST(COUNT(*) FILTER (WHERE o_orderkey IS NOT NULL) AS BIGINT) AS n_orders,
       CAST(COUNT(*) FILTER (WHERE l_orderkey IS NOT NULL) AS BIGINT) AS n_orders_with_lines,
       CAST(COUNT(*) FILTER (WHERE l_orderkey IS NULL AND o_orderkey IS NOT NULL)
            AS BIGINT) AS orders_without_lines,
       CAST(COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT) AS orphan_line_orders,
       CAST(COUNT(*) FILTER (WHERE o_orderkey IS NOT NULL AND l_orderkey IS NOT NULL
                              AND ABS(total_c - gross_c) > 100) AS BIGINT)
         AS revenue_mismatches_over_1usd,
       CAST(SUM(CASE WHEN o_orderkey IS NOT NULL AND l_orderkey IS NOT NULL
                     THEN ABS(total_c - gross_c) ELSE 0 END) AS BIGINT)
         AS abs_gap_cents
FROM j
"""


@register(
    "reconciliation_orders_lineitems",
    oracle=_RECON_ORACLE,
    description="Nightly cross-table reconciliation: orders without lines, "
    "orphan lines, and the o_totalprice vs sum(extendedprice*(1-disc)*"
    "(1+tax)) tie-out at a $1 tolerance — one full-outer join of two "
    "aggregates, exact integer cents",
    tags=("quality", "profiling", "finance", "extension"),
)
def reconciliation_orders_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    osum = (
        tbl(spark, sf_dir, "orders")
        .where(F.abs(F.coalesce(F.col("o_totalprice"), F.lit(0.0))) < F.lit(1e12))
        .select(
            "o_orderkey",
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("total_c"),
        )
    )
    lsum = (
        spread(tbl(spark, sf_dir, "lineitem"))
        .where(F.abs(F.coalesce(F.col("l_extendedprice"), F.lit(0.0))) < F.lit(1e12))
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.expr(
                    "CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)"
                )
            ).alias("gross_c"),
        )
    )
    j = osum.join(lsum, osum.o_orderkey == lsum.l_orderkey, "full_outer")
    both = F.col("o_orderkey").isNotNull() & F.col("l_orderkey").isNotNull()
    return j.agg(
        F.sum(F.when(F.col("o_orderkey").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_orders"),
        F.sum(F.when(F.col("l_orderkey").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_orders_with_lines"),
        F.sum(
            F.when(F.col("l_orderkey").isNull() & F.col("o_orderkey").isNotNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("orders_without_lines"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("orphan_line_orders"),
        F.sum(
            F.when(both & (F.abs(F.col("total_c") - F.col("gross_c")) > 100), 1).otherwise(0)
        )
        .cast("long")
        .alias("revenue_mismatches_over_1usd"),
        F.sum(
            F.when(both, F.abs(F.col("total_c") - F.col("gross_c"))).otherwise(0)
        )
        .cast("long")
        .alias("abs_gap_cents"),
    )
