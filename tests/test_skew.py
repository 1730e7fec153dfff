"""Salted aggregation/join equal their unsalted plans on skewed data."""

from pyspark.sql import functions as F

from messikinesisprovider_spark.operators.skew import (
    salted_join_broadcast_hot_keys,
    salted_sum_count,
)


def _skewed_df(spark):
    # 90% of rows share one key — the classic hot-key shape
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    tail = spark.range(1000).select(
        F.concat(F.lit("u"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") % 31).cast("double").alias("v"),
    )
    return hot.unionByName(tail)


def test_salted_agg_matches_plain(spark):
    df = _skewed_df(spark)
    plain = {
        r["k"]: (r["s"], r["c"])
        for r in df.groupBy("k")
        .agg(F.sum(F.col("v").cast("decimal(18,6)")).cast("double").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    salted = {
        r["k"]: (r["sum_value"], r["n_rows"])
        for r in salted_sum_count(df, "k", "v", n_salts=8).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    fact = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", 1.5)] + [(f"u{i}", 1.0 + i) for i in range(50)], ["k", "w"]
    )
    plain = fact.join(dim, "k").agg(F.count(F.lit(1)), F.sum(F.col("w"))).collect()[0]
    split = (
        salted_join_broadcast_hot_keys(fact, dim, "k", ["hot"])
        .agg(F.count(F.lit(1)), F.sum(F.col("w")))
        .collect()[0]
    )
    assert plain[0] == split[0]
    assert abs(plain[1] - split[1]) < 1e-6
