"""Round 4 additions, part 27: exact rank / concentration / diversity stats.

- ``mann_whitney_u_exact`` — the two-sample Mann-Whitney (Wilcoxon
  rank-sum) U statistic, exact: per-value group counts map-side, global
  cumulative counts via the two-pass range-partitioned ranking (the
  ks_test_drift_exact machinery), then the doubled statistic
  2*U1 = SUM(c1 * (2*cum2 - c2)) — every term an exact BIGINT, so the
  half-credit-for-ties rule never leaves integers.  The rank-biserial
  effect size is ONE final IEEE division.

- ``gini_nation_spend`` — per-nation Gini coefficient of customer spend
  (the inequality statistic behind data-skew and revenue-concentration
  dashboards): spend quantized to whole dollars, within-nation ranks from
  a PARTITIONED window (nations bound the partitions — no global sort),
  numerator 2*SUM(r*x) - (n+1)*SUM(x) exact in BIGINT.  Ties in spend are
  rank-order independent (equal x under permuted ranks leaves SUM(r*x)
  unchanged), so the custkey tiebreak is for determinism of the plan, not
  the value.

- ``herfindahl_supplier_share`` — per-nation Herfindahl-Hirschman index
  of supplier revenue concentration: one groupBy for per-supplier revenue
  dollars, one for the per-nation sum of squares; HHI emitted as the
  exact integer pair (sum_sq, total) plus the convenience double
  (sum_sq / total) / total — two IEEE divisions in a fixed order.  Dollar
  quantization keeps sum-of-squares < 2^63 to ~10^5 x this revenue scale.

- ``simpson_diversity_source`` — per-source Simpson diversity of the
  token distribution: lambda = SUM(c*(c-1)) / (N*(N-1)) — the
  collision-probability diversity index that needs NO logarithms (the
  Shannon twin is transcendental and not bit-portable across engines).
  One explode + two map-side-combined groupBys; numerator and
  denominator are exact BIGINTs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .ranking import global_row_number
from .relational import events_tbl, tbl

# ---------------------------------------------------------------------------
# mann_whitney_u_exact
# ---------------------------------------------------------------------------

_MWU_ORACLE = """
WITH ev AS (
  SELECT value,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')
),
pervalue AS (
  SELECT value,
         CAST(SUM(g) AS BIGINT) AS c1,
         CAST(SUM(1 - g) AS BIGINT) AS c2
  FROM ev GROUP BY value
),
cum AS (
  SELECT c1, c2,
         SUM(c2) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
  FROM pervalue
),
agg AS (
  SELECT CAST(SUM(c1 * (2 * cum2 - c2)) AS BIGINT) AS u1_x2,
         CAST(SUM(c1) AS BIGINT) AS n1,
         CAST(SUM(c2) AS BIGINT) AS n2
  FROM cum
)
SELECT u1_x2,
       2 * n1 * n2 - u1_x2 AS u2_x2,
       n1, n2,
       CAST(u1_x2 - n1 * n2 AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) AS rank_biserial
FROM agg
"""


@register(
    "mann_whitney_u_exact",
    oracle=_MWU_ORACLE,
    description="Two-sample Mann-Whitney U (Wilcoxon rank-sum), exact: "
    "per-value group counts map-side, global cumulative via the two-pass "
    "range-partitioned ranking, doubled statistic 2*U1 = SUM(c1*(2*cum2-c2)) "
    "keeps tie half-credits integer; rank-biserial effect size is one IEEE "
    "division; single-row output",
    tags=("analytics", "statistics", "drift", "extension"),
)
def mann_whitney_u_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("value").isNotNull() & F.col("event_type").isin("purchase", "click"))
        .select(
            "value",
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("g"),
        )
    )
    pervalue = ev.groupBy("value").agg(
        F.sum("g").cast("long").alias("c1"),
        F.sum(1 - F.col("g")).cast("long").alias("c2"),
    )
    cum, _n = global_row_number(
        pervalue, order_by=["value"], rn_col="_rn", running_sums={"c2": "cum2"}
    )
    agg = cum.agg(
        F.sum(F.col("c1") * (2 * F.col("cum2") - F.col("c2"))).cast("long").alias("u1_x2"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    return agg.select(
        "u1_x2",
        (2 * F.col("n1") * F.col("n2") - F.col("u1_x2")).alias("u2_x2"),
        "n1",
        "n2",
        (
            (F.col("u1_x2") - F.col("n1") * F.col("n2")).cast("double")
            / (F.col("n1") * F.col("n2")).cast("double")
        ).alias("rank_biserial"),
    )


# ---------------------------------------------------------------------------
# gini_nation_spend
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
WITH spend AS (
  SELECT c.c_custkey, c.c_nationkey,
         COALESCE(SUM(CAST(ROUND(o.o_totalprice) AS BIGINT)), 0) AS dollars
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_nationkey
),
ranked AS (
  SELECT c_nationkey, dollars,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY dollars, c_custkey) AS r
  FROM spend
),
pernation AS (
  SELECT c_nationkey,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(dollars) AS BIGINT) AS total_dollars,
         CAST(2 * SUM(r * dollars) - (COUNT(*) + 1) * SUM(dollars) AS BIGINT) AS gini_num
  FROM ranked GROUP BY c_nationkey
)
SELECT n.n_name AS nation, p.n_customers, p.total_dollars, p.gini_num,
       CASE WHEN p.total_dollars = 0 THEN 0.0
            ELSE CAST(p.gini_num AS DOUBLE)
                 / CAST(p.n_customers * p.total_dollars AS DOUBLE) END AS gini
FROM pernation p JOIN nation n ON n.n_nationkey = p.c_nationkey
"""


@register(
    "gini_nation_spend",
    oracle=_GINI_ORACLE,
    description="Per-nation Gini coefficient of customer spend: dollars "
    "quantization, PARTITIONED rank window (nation bounds the partition — "
    "no global sort), numerator 2*SUM(r*x)-(n+1)*SUM(x) exact BIGINT; ties "
    "in spend are rank-order independent so the custkey tiebreak only "
    "stabilizes the plan; zero-order customers included at 0 via left join",
    tags=("analytics", "statistics", "window", "extension"),
)
def gini_nation_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders").select(
        "o_custkey", F.expr("CAST(ROUND(o_totalprice) AS BIGINT)").alias("dollars")
    )
    nation = tbl(spark, sf_dir, "nation")
    spend = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.coalesce(F.sum("dollars"), F.lit(0)).alias("dollars"))
    )
    w = W.partitionBy("c_nationkey").orderBy("dollars", "c_custkey")
    ranked = spend.select("c_nationkey", "dollars", F.row_number().over(w).alias("r"))
    pernation = ranked.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("dollars").cast("long").alias("total_dollars"),
        (
            2 * F.sum(F.col("r") * F.col("dollars"))
            - (F.count(F.lit(1)) + 1) * F.sum("dollars")
        )
        .cast("long")
        .alias("gini_num"),
    )
    return pernation.join(
        F.broadcast(nation), pernation.c_nationkey == nation.n_nationkey
    ).select(
        F.col("n_name").alias("nation"),
        "n_customers",
        "total_dollars",
        "gini_num",
        F.when(F.col("total_dollars") == 0, F.lit(0.0))
        .otherwise(
            F.col("gini_num").cast("double")
            / (F.col("n_customers") * F.col("total_dollars")).cast("double")
        )
        .alias("gini"),
    )


# ---------------------------------------------------------------------------
# herfindahl_supplier_share
# ---------------------------------------------------------------------------

_HHI_ORACLE = """
WITH rev AS (
  SELECT s.s_nationkey, l.l_suppkey,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)) AS BIGINT)) AS BIGINT)
           AS dollars
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY s.s_nationkey, l.l_suppkey
),
pernation AS (
  SELECT s_nationkey,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         CAST(SUM(dollars) AS BIGINT) AS total_dollars,
         CAST(SUM(dollars * dollars) AS BIGINT) AS sum_sq
  FROM rev GROUP BY s_nationkey
)
SELECT n.n_name AS nation, p.n_suppliers, p.total_dollars, p.sum_sq,
       CASE WHEN p.total_dollars = 0 THEN 0.0
            ELSE CAST(p.sum_sq AS DOUBLE) / CAST(p.total_dollars AS DOUBLE)
                 / CAST(p.total_dollars AS DOUBLE) END AS hhi
FROM pernation p JOIN nation n ON n.n_nationkey = p.s_nationkey
"""


@register(
    "herfindahl_supplier_share",
    oracle=_HHI_ORACLE,
    description="Per-nation Herfindahl-Hirschman revenue-concentration "
    "index: per-supplier revenue dollars (one groupBy), per-nation "
    "sum-of-squares (second groupBy, both map-side combined); exact "
    "integer (sum_sq, total) pair plus the convenience double "
    "(sum_sq/total)/total — two IEEE divisions in a fixed order; dollar "
    "quantization bounds sum_sq < 2^63 to ~1e5x this revenue scale",
    tags=("analytics", "statistics", "extension"),
)
def herfindahl_supplier_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = tbl(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.expr("CAST(ROUND(l_extendedprice * (1 - l_discount)) AS BIGINT)").alias("d"),
    )
    supplier = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = tbl(spark, sf_dir, "nation")
    rev = (
        lineitem.join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum("d").cast("long").alias("dollars"))
    )
    pernation = rev.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum("dollars").cast("long").alias("total_dollars"),
        F.sum(F.col("dollars") * F.col("dollars")).cast("long").alias("sum_sq"),
    )
    return pernation.join(
        F.broadcast(nation), pernation.s_nationkey == nation.n_nationkey
    ).select(
        F.col("n_name").alias("nation"),
        "n_suppliers",
        "total_dollars",
        "sum_sq",
        F.when(F.col("total_dollars") == 0, F.lit(0.0))
        .otherwise(
            F.col("sum_sq").cast("double")
            / F.col("total_dollars").cast("double")
            / F.col("total_dollars").cast("double")
        )
        .alias("hhi"),
    )


# ---------------------------------------------------------------------------
# simpson_diversity_source
# ---------------------------------------------------------------------------

_SIMPSON_ORACLE = """
WITH tok AS (
  SELECT source, UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS token
  FROM documents
),
counts AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY source, token
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS distinct_tokens,
       CAST(SUM(c * (c - 1)) AS BIGINT) AS simpson_num,
       CASE WHEN SUM(c) < 2 THEN 0.0
            ELSE CAST(SUM(c * (c - 1)) AS DOUBLE)
                 / CAST(SUM(c) * (SUM(c) - 1) AS DOUBLE) END AS simpson_lambda
FROM counts
GROUP BY source
"""


@register(
    "simpson_diversity_source",
    oracle=_SIMPSON_ORACLE,
    description="Per-source Simpson diversity (token collision "
    "probability) lambda = SUM(c*(c-1))/(N*(N-1)): the log-free diversity "
    "index (the Shannon twin needs transcendentals that are not "
    "bit-portable); one explode + two map-side-combined groupBys; exact "
    "BIGINT numerator/denominator, one IEEE division",
    tags=("text", "statistics", "llm-pipeline", "extension"),
)
def simpson_diversity_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).alias("token"),
    )
    counts = tok.groupBy("source", "token").agg(F.count(F.lit(1)).cast("long").alias("c"))
    return counts.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("distinct_tokens"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("simpson_num"),
        F.when(F.sum("c") < 2, F.lit(0.0))
        .otherwise(
            F.sum(F.col("c") * (F.col("c") - 1)).cast("double")
            / (F.sum("c") * (F.sum("c") - 1)).cast("double")
        )
        .alias("simpson_lambda"),
    )
