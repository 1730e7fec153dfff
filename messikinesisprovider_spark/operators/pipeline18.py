"""Privacy-audit operators, round 3 (appended).

``k_anonymity_audit``: the release-gating privacy check a curation
pipeline runs before exporting user-adjacent data — group sizes over a
quasi-identifier tuple (nation, account-balance band, market segment),
k=5 violations flagged per group, and the re-identification accounting
(how many records sit in too-small groups) carried per row so the global
suppression rate is one SUM away. One map-side-combined groupBy; the
audit output is |QI-combinations| rows regardless of table size.

Reference parity note: the reference (SURVEY.md §0) has no relational
surface; these extend the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import tbl

K_ANON = 5
_BAL_BAND = 1000.0

_KANON_ORACLE = f"""
WITH qi AS (
  SELECT c_nationkey,
         CAST(floor(c_acctbal / {_BAL_BAND}) AS BIGINT) AS bal_band,
         c_mktsegment,
         COUNT(*) AS n
  FROM customer
  GROUP BY 1, 2, 3
)
SELECT c_nationkey, bal_band, c_mktsegment, CAST(n AS BIGINT) AS n,
       n < {K_ANON} AS is_violation,
       CAST(CASE WHEN n < {K_ANON} THEN n ELSE 0 END AS BIGINT) AS n_at_risk
FROM qi
"""


@register(
    "k_anonymity_audit",
    oracle=_KANON_ORACLE,
    description=f"k-anonymity audit (k={K_ANON}) over the (nation, balance "
    "band, segment) quasi-identifier: group sizes, violations, at-risk rows",
    tags=("privacy", "audit", "aggregate", "extension"),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-QI-group audit; suppression candidates = rows where n < k.

    At 100 TB this is one pass with map-side partials; the output is the
    QI-combination count, not the record count, so the report stays
    driver-safe. A NULL in any QI column forms its own group (GROUP BY
    semantics in both engines) — NULLs are the most re-identifiable bucket
    and must not vanish from the audit."""
    qi = (
        tbl(spark, sf_dir, "customer")
        .groupBy(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / _BAL_BAND).cast("long").alias("bal_band"),
            "c_mktsegment",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return qi.select(
        "c_nationkey",
        "bal_band",
        "c_mktsegment",
        F.col("n").cast("long").alias("n"),
        (F.col("n") < K_ANON).alias("is_violation"),
        F.when(F.col("n") < K_ANON, F.col("n")).otherwise(0).cast("long").alias("n_at_risk"),
    )


L_DIVERSITY = 3

_LDIV_ORACLE = f"""
WITH qi AS (
  SELECT c_nationkey, c_mktsegment,
         COUNT(*) AS n,
         COUNT(DISTINCT CAST(floor(c_acctbal / {_BAL_BAND}) AS BIGINT)) AS l_distinct
  FROM customer
  GROUP BY 1, 2
)
SELECT c_nationkey, c_mktsegment, CAST(n AS BIGINT) AS n,
       CAST(l_distinct AS BIGINT) AS l_distinct,
       l_distinct < {L_DIVERSITY} AS is_violation,
       CAST(CASE WHEN l_distinct < {L_DIVERSITY} THEN n ELSE 0 END AS BIGINT)
         AS n_at_risk
FROM qi
"""


@register(
    "l_diversity_audit",
    oracle=_LDIV_ORACLE,
    description=f"l-diversity audit (l={L_DIVERSITY}): distinct sensitive "
    "balance bands per (nation, segment) quasi-identifier group",
    tags=("privacy", "audit", "aggregate", "extension"),
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complement of k-anonymity: a group can be large (k-anonymous)
    yet expose its members if everyone shares one sensitive value —
    l-diversity requires >= l distinct sensitive values per QI group.
    Same one-pass shape as `k_anonymity_audit` (COUNT DISTINCT is the
    only addition — a two-level aggregate under AQE); |QI| output rows."""
    qi = (
        tbl(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(
                F.floor(F.col("c_acctbal") / _BAL_BAND).cast("long")
            ).alias("l_distinct"),
        )
    )
    return qi.select(
        "c_nationkey",
        "c_mktsegment",
        F.col("n").cast("long").alias("n"),
        F.col("l_distinct").cast("long").alias("l_distinct"),
        (F.col("l_distinct") < L_DIVERSITY).alias("is_violation"),
        F.when(F.col("l_distinct") < L_DIVERSITY, F.col("n"))
        .otherwise(0)
        .cast("long")
        .alias("n_at_risk"),
    )
