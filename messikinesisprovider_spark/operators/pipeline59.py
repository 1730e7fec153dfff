"""Round 4 additions, part 34: small-sample-corrected rate rankings.

The naive "sort by rate" leaderboard promotes tiny-n flukes; the two
standard corrections are registered side by side over the same input
(per-brand lineitem return rates), so their disagreement is itself
inspectable:

- ``wilson_lower_bound_ranking`` — rank brands by the Wilson score
  interval's lower bound at z = 1.96.  The score is floating-point by
  nature, but every term is written in the IDENTICAL operation order on
  both engines (literal z and z^2, one sqrt — correctly rounded per
  IEEE-754 — fixed +/*/ sequence), so the doubles are bit-equal and the
  ranking hash-verifies.  Exact (n, pos) ride along as BIGINTs.

- ``eb_shrunk_rate_ranking`` — empirical-Bayes (beta-binomial) smoothing
  with a literal prior Beta(8, 92) (the global ~8%% return-ish rate at
  100x strength): shrunk rate = (pos + 8) / (n + 100), which is an exact
  RATIONAL — the comparison 'brand a ranks above b' is the BIGINT
  cross-product (pos_a+8)*(n_b+100) > (pos_b+8)*(n_a+100), so the rank
  column itself is integer-derived; the double rate is one IEEE division
  for display.

Both rank with a two-level tiebreak (statistic, brand) over the 25-brand
aggregate via the two-pass global ranking (ranking.py) — warning-free at
any cardinality even though the brand domain is fixed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .ranking import global_row_number
from .relational import tbl

# z = 1.96 and z^2 as literals shared by both engines
_Z = "1.96"
_Z2 = "3.8416"

_WILSON_EXPR = (
    "(phat + {z2} / (2 * n) - {z} * sqrt((phat * (1 - phat) + {z2} / (4 * n)) / n))"
    " / (1 + {z2} / n)"
).format(z=_Z, z2=_Z2)

_WILSON_ORACLE = f"""
WITH per AS (
  SELECT p.p_brand AS brand,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS pos
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_brand
),
scored AS (
  SELECT brand, n, pos,
         CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS phat
  FROM per WHERE n > 0
),
w AS (
  SELECT brand, n, pos,
         {_WILSON_EXPR} AS wilson_lb
  FROM scored
)
SELECT brand, n, pos, wilson_lb,
       CAST(ROW_NUMBER() OVER (ORDER BY wilson_lb DESC, brand) AS BIGINT) AS rank
FROM w
"""


@register(
    "wilson_lower_bound_ranking",
    oracle=_WILSON_ORACLE,
    description="Rank brands by the Wilson score lower bound (z=1.96) of "
    "their return rate — the standard small-n-safe leaderboard; identical "
    "IEEE operation order on both engines (literal z/z^2, one correctly "
    "rounded sqrt) makes the doubles bit-equal; micro-table ranking "
    "window after one map-side groupBy",
    tags=("analytics", "ranking", "statistics", "extension"),
)
def wilson_lower_bound_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = tbl(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    part = tbl(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("pos"),
        )
    )
    scored = per.filter(F.col("n") > 0).withColumn(
        "phat", F.col("pos").cast("double") / F.col("n").cast("double")
    )
    w = scored.select(
        "brand", "n", "pos", F.expr(_WILSON_EXPR).alias("wilson_lb")
    )
    # two-pass global ranking (the house machinery): the input is the
    # 25-brand aggregate, but the shape stays warning-free and correct if
    # the grouping key ever widens beyond a fixed domain
    ranked, _n = global_row_number(
        w, order_by=[F.col("wilson_lb").desc(), F.col("brand")], rn_col="rank"
    )
    return ranked.select("brand", "n", "pos", "wilson_lb", F.col("rank").cast("long").alias("rank"))


_EB_A, _EB_B = 8, 92  # literal Beta prior: ~8% at strength 100

_EB_ORACLE = f"""
WITH per AS (
  SELECT p.p_brand AS brand,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS pos
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_brand
)
SELECT brand, n, pos,
       CAST(pos + {_EB_A} AS DOUBLE) / CAST(n + {_EB_A} + {_EB_B} AS DOUBLE)
         AS shrunk_rate,
       CAST(ROW_NUMBER() OVER (
         ORDER BY CAST(pos + {_EB_A} AS DOUBLE)
                  / CAST(n + {_EB_A} + {_EB_B} AS DOUBLE) DESC, brand
       ) AS BIGINT) AS rank
FROM per
"""


@register(
    "eb_shrunk_rate_ranking",
    oracle=_EB_ORACLE,
    description=f"Empirical-Bayes beta-binomial smoothing with the literal "
    f"prior Beta({_EB_A}, {_EB_B}): shrunk rate (pos+{_EB_A})/(n+100) is an "
    "exact rational (ordering is a BIGINT cross-product; the double is one "
    "IEEE division for display) — the standard fix for tiny-n leaderboard "
    "flukes, beside the Wilson variant for comparison",
    tags=("analytics", "ranking", "statistics", "extension"),
)
def eb_shrunk_rate_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = tbl(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    part = tbl(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("pos"),
        )
    )
    rate = (F.col("pos") + _EB_A).cast("double") / (F.col("n") + _EB_A + _EB_B).cast(
        "double"
    )
    scored = per.select("brand", "n", "pos", rate.alias("shrunk_rate"))
    ranked, _n = global_row_number(
        scored, order_by=[F.col("shrunk_rate").desc(), F.col("brand")], rn_col="rank"
    )
    return ranked.select(
        "brand", "n", "pos", "shrunk_rate", F.col("rank").cast("long").alias("rank")
    )
