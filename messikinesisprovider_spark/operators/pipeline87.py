"""Round 6 additions, part 8: data-contract audits + ranking distance.

- ``dq_uniqueness_audit``: the primary-key half of the data contract
  (dq_referential_orphans covers the FK half) — per table: row count,
  distinct-key count, duplicate-key count, null-key count, and the
  uniqueness verdict. One map-side-combined aggregate per table, union'd
  into the audit report.
- ``eval_spearman_footrule``: Spearman's footrule distance (L1 between two
  rankings) comparing the acctbal ranking of customers against their
  total-spend ranking — an exact-integer ranking-agreement metric
  (completes rho/tau with the L1 member of the family). Both rankings come
  from the two-pass range-partitioned global ranking; ties broken by key
  so both engines rank identically.

Reference parity note: the reference engine (SURVEY.md §0) has no
analytics surface; these extend the batch side per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .ranking import global_row_number
from .relational import spread, tbl

# ---------------------------------------------------------------------------
# dq_uniqueness_audit
# ---------------------------------------------------------------------------

_UNIQ_TABLES = [
    ("orders", "o_orderkey"),
    ("customer", "c_custkey"),
    ("part", "p_partkey"),
    ("supplier", "s_suppkey"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
]

_UNIQ_ORACLE = " UNION ALL ".join(
    f"""
SELECT '{t}.{k}' AS pk,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT {k}) AS BIGINT) AS n_keys,
       CAST(COUNT(*) - COUNT({k}) AS BIGINT) AS n_null_keys,
       CAST(COUNT({k}) - COUNT(DISTINCT {k}) AS BIGINT) AS n_dup_rows,
       COUNT({k}) = COUNT(DISTINCT {k}) AND COUNT(*) = COUNT({k}) AS unique_ok
FROM {t}"""
    for t, k in _UNIQ_TABLES
)


@register(
    "dq_uniqueness_audit",
    oracle=_UNIQ_ORACLE,
    description="Primary-key uniqueness audit over the six keyed tables "
    "(row/distinct/null/duplicate counts + verdict) — the PK half of the "
    "data contract next to dq_referential_orphans' FK half",
    tags=("quality", "audit", "extension"),
)
def dq_uniqueness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One aggregate per table (count-distinct partial-aggregates map-side;
    no joins at all) union'd into the report — at 100 TB each leg is a
    single scan with a two-phase distinct, the cheapest possible contract
    check. The verdict column folds null-keys into the failure condition,
    as PK semantics demand."""
    legs = []
    for t, k in _UNIQ_TABLES:
        d = tbl(spark, sf_dir, t)
        legs.append(
            d.agg(
                F.lit(f"{t}.{k}").alias("pk"),
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct(k).alias("n_keys"),
                (F.count(F.lit(1)) - F.count(k)).alias("n_null_keys"),
                (F.count(k) - F.countDistinct(k)).alias("n_dup_rows"),
                (
                    (F.count(k) == F.countDistinct(k))
                    & (F.count(F.lit(1)) == F.count(k))
                ).alias("unique_ok"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionAll(leg)
    return out.select(
        "pk",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("n_null_keys").cast("long").alias("n_null_keys"),
        F.col("n_dup_rows").cast("long").alias("n_dup_rows"),
        "unique_ok",
    )


# ---------------------------------------------------------------------------
# eval_spearman_footrule
# ---------------------------------------------------------------------------

_FOOTRULE_ORACLE = """
WITH spend AS (
  SELECT c.c_custkey,
         CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS bal_c,
         COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)), 0) AS spend_c
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_acctbal
),
ranked AS (
  SELECT c_custkey,
         ROW_NUMBER() OVER (ORDER BY bal_c DESC, c_custkey) AS r_bal,
         ROW_NUMBER() OVER (ORDER BY spend_c DESC, c_custkey) AS r_spend
  FROM spend
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(ABS(r_bal - r_spend)) AS BIGINT) AS footrule,
       CAST(ROUND(1.0 - 3.0 * SUM(ABS(r_bal - r_spend))
                  / (CAST(COUNT(*) AS DOUBLE) * COUNT(*) - 1), 6) AS DOUBLE)
         AS footrule_similarity
FROM ranked
"""


@register(
    "eval_spearman_footrule",
    oracle=_FOOTRULE_ORACLE,
    description="Spearman's footrule (exact L1 distance between the acctbal "
    "ranking and the total-spend ranking of customers, normalized to the "
    "[−0.5, 1] similarity) — the L1 member of the rank-agreement family "
    "next to rho and tau-b; both rankings via the two-pass global ranking",
    tags=("statistics", "ranking", "eval", "extension"),
)
def eval_spearman_footrule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two global rankings over the same per-customer frame (each a
    two-pass range-partitioned row_number — no single-partition windows),
    then one exact integer L1 aggregate. Ties broken by c_custkey make the
    rankings bit-identical across engines; the normalizer 3F/(n²−1) is the
    classical footrule similarity, one double division at the end."""
    c = tbl(spark, sf_dir, "customer").select(
        "c_custkey", F.expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)").alias("bal_c")
    )
    o = (
        spread(tbl(spark, sf_dir, "orders"))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.expr("SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))").alias("spend_raw")
        )
    )
    spend = (
        c.join(o, "c_custkey", "left")
        .select(
            "c_custkey",
            "bal_c",
            F.coalesce(F.col("spend_raw"), F.lit(0)).alias("spend_c"),
        )
    )
    by_bal, _ = global_row_number(
        spend.select("c_custkey", F.col("bal_c").alias("neg_key")),
        order_by=[F.col("neg_key").desc(), F.col("c_custkey")],
        rn_col="r_bal",
    )
    by_spend, _ = global_row_number(
        spend.select(F.col("c_custkey").alias("ck2"), F.col("spend_c").alias("neg_s")),
        order_by=[F.col("neg_s").desc(), F.col("ck2")],
        rn_col="r_spend",
    )
    joined = by_bal.join(by_spend, F.col("c_custkey") == F.col("ck2"))
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.abs(F.col("r_bal") - F.col("r_spend"))).cast("long").alias("footrule"),
        F.round(
            F.lit(1.0)
            - F.lit(3.0)
            * F.sum(F.abs(F.col("r_bal") - F.col("r_spend")))
            / (
                F.count(F.lit(1)).cast("double") * F.count(F.lit(1))
                - F.lit(1)
            ),
            6,
        )
        .cast("double")
        .alias("footrule_similarity"),
    )
