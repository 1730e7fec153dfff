"""Round 5 additions, part 6: the aggregate-pushdown range join.

``range_join_preagg`` computes EXACTLY the same result as
``range_join_binned`` (orders placed in the 7 days before each urgent
order) through the rewrite that survives any data density: the right side
only contributes a COUNT, so aggregate it to per-day counts FIRST (a
|days|-bounded micro-table), then join each urgent order to its 7 prior
days via a 7-row offset spine and sum.

Why both queries exist: the binned range join (relational5) is the pattern
for range joins whose OUTPUT needs the matched pairs — its cost is
necessarily proportional to the matched-pair cardinality, which grows
QUADRATICALLY when row density grows over a fixed time domain (the
synthetic sf1 fixture measures it at 148x for 10x data: ~1.3e9 matched
pairs before the aggregation). When the downstream is an aggregate, this
rewrite pushes it below the join and the matched-pair explosion never
materializes: work is |orders| (daily aggregation) + 7x|urgent| (spine
join) — linear at ANY density. The two queries share one oracle shape, so
the driver proves the rewrite exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import tbl

_WINDOW_DAYS = 7

_PREAGG_ORACLE = f"""
WITH a AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
  FROM orders WHERE o_orderpriority = '1-URGENT'
),
b AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders)
SELECT a.o_orderkey, COUNT(b.o_orderkey) AS n_prior_week
FROM a LEFT JOIN b ON b.d >= a.d - {_WINDOW_DAYS} AND b.d < a.d
GROUP BY a.o_orderkey
"""


@register(
    "range_join_preagg",
    oracle=_PREAGG_ORACLE,
    description=f"Aggregate-pushdown twin of range_join_binned: per-day "
    f"counts first (|days| micro-table), then a {_WINDOW_DAYS}-row offset "
    "spine per urgent order — identical output, LINEAR at any row density "
    "(the binned pattern is matched-pair-bound and goes quadratic when "
    "density grows over a fixed time domain)",
    tags=("join", "range", "scale", "extension"),
)
def range_join_preagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("d"), "o_orderpriority"
    )
    daily = o.groupBy("d").agg(F.count(F.lit(1)).alias("n_day"))
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey", "d")
    spine = spark.range(1, _WINDOW_DAYS + 1).select(F.col("id").cast("int").alias("back"))
    probes = urgent.crossJoin(F.broadcast(spine)).select(
        "o_orderkey", F.expr("date_sub(d, back)").alias("pd")
    )
    return (
        probes.join(daily, probes.pd == daily.d, "left")
        .groupBy("o_orderkey")
        .agg(F.coalesce(F.sum("n_day"), F.lit(0)).cast("long").alias("n_prior_week"))
    )
