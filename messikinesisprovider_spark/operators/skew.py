"""Skew-handling primitives: salted two-phase aggregation and salted joins.

AQE's skew-join splitting handles most cases automatically
(`spark.sql.adaptive.skewJoin.enabled` is on in session.py); these
explicit primitives cover what AQE can't: a single groupBy key so hot that
one reducer's hash-map dominates the stage, and broadcast-impossible skewed
joins. Salting trades one extra narrow shuffle for even partitioning —
correctness is identical because count/sum are associative.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame, key: str, value: Column | str, n_salts: int = 16
) -> DataFrame:
    """groupBy(key) → (sum_value, n_rows), computed skew-proof.

    Phase 1 groups by (key, salt) — the hot key's rows spread over n_salts
    reducers; phase 2 combines the n_salts partials per key (tiny shuffle).
    Decimal summation keeps the result bit-identical to the unsalted plan.
    """
    value_col = F.col(value) if isinstance(value, str) else value
    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts)))
    partial = salted.groupBy(key, "__salt").agg(
        F.sum(value_col.cast("decimal(18,6)")).alias("__psum"),
        F.count(F.lit(1)).alias("__pcnt"),
    )
    return partial.groupBy(key).agg(
        F.sum("__psum").cast("double").alias("sum_value"),
        F.sum("__pcnt").alias("n_rows"),
    )


def salted_join_broadcast_hot_keys(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: list,
) -> DataFrame:
    """Split a skewed equi-join: hot keys join via broadcast of their dim
    slice; the long tail joins normally. Union of the two plans — the manual
    form of AQE's skew-join split for cases AQE can't detect (e.g. skew only
    materializes after upstream filters)."""
    hot_fact = fact.filter(F.col(key).isin(hot_keys))
    cold_fact = fact.filter(~F.col(key).isin(hot_keys))
    hot_dim = dim.filter(F.col(key).isin(hot_keys))
    return hot_fact.join(F.broadcast(hot_dim), key).unionByName(cold_fact.join(dim, key))


from ..registry import register
from .relational import events_tbl


@register(
    "skew_salted_agg",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           COUNT(*) AS n_rows
    FROM events
    GROUP BY event_type
    """,
    description="Skew-proof two-phase salted aggregation over a 5-value hot key "
    "(bit-identical to the plain groupBy, oracle-checked)",
    tags=("skew", "agg", "extension"),
)
def skew_salted_agg(spark, sf_dir):
    """The worst realistic skew case: a groupBy key with only a handful of
    distinct values (event_type), where every row of a 100 TB table funnels
    into 5 reducers. salted_sum_count spreads each key over 16 salt slots in
    phase 1, then combines 16 tiny partials per key — identical results
    (decimal sums are associative), even partitioning. Registered so the
    skew path itself sits in the driver's correctness gate, not just unit
    tests."""
    ev = events_tbl(spark, sf_dir).select("event_type", "value")
    return salted_sum_count(ev, "event_type", "value", n_salts=16)
