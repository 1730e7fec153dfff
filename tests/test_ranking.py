"""Two-pass global ranking helper (operators/ranking.py) vs Spark's own
global window on data small enough that the single-partition plan is fine —
the reference implementation the helper must reproduce exactly."""

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from messikinesisprovider_spark.operators.ranking import (
    cume_dist_of,
    global_row_number,
    ntile_of,
    percent_rank_of,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def test_row_number_matches_global_window(spark):
    rng = random.Random(7)
    rows = [(rng.randint(0, 50), f"r{i}") for i in range(500)]
    df = _df(spark, rows)
    got, n = global_row_number(df, [F.col("k"), F.col("v")], rn_col="rn", num_partitions=7)
    assert n == 500
    expect = df.select(
        "k", "v", F.row_number().over(W.orderBy("k", "v")).cast("bigint").alias("rn")
    )
    assert got.select("k", "v", "rn").exceptAll(expect).count() == 0
    assert expect.exceptAll(got.select("k", "v", "rn")).count() == 0


def test_running_sum_matches_global_window(spark):
    rng = random.Random(11)
    rows = [(rng.randint(0, 30), f"r{i}") for i in range(300)]
    df = _df(spark, rows).withColumn("w", F.col("k").cast("bigint") * 3 + 1)
    got, _ = global_row_number(
        df,
        [F.col("k"), F.col("v")],
        rn_col="rn",
        running_sums={"w": "cum_w"},
        num_partitions=5,
    )
    wspec = W.orderBy("k", "v").rowsBetween(W.unboundedPreceding, W.currentRow)
    expect = df.select("k", "v", F.sum("w").over(wspec).alias("cum_w"))
    assert got.select("k", "v", "cum_w").exceptAll(expect).count() == 0
    assert expect.exceptAll(got.select("k", "v", "cum_w")).count() == 0


def test_derived_rank_functions_match_spark(spark):
    # unique sort key: rank == row_number; percent_rank/cume_dist/ntile are
    # arithmetic on (rn, n) and must equal Spark's own window functions
    rows = [(i * 7 % 101, f"u{i:03d}") for i in range(101)]
    df = _df(spark, rows)
    got, n = global_row_number(df, [F.col("k"), F.col("v")], rn_col="rn", num_partitions=4)
    derived = got.select(
        "k",
        "v",
        F.round(percent_rank_of(F.col("rn"), n), 9).alias("pr"),
        F.round(cume_dist_of(F.col("rn"), n), 9).alias("cd"),
        ntile_of(F.col("rn"), n, 7).alias("nt"),
    )
    w = W.orderBy("k", "v")
    expect = df.select(
        "k",
        "v",
        F.round(F.percent_rank().over(w), 9).alias("pr"),
        F.round(F.cume_dist().over(w), 9).alias("cd"),
        F.ntile(7).over(w).cast("bigint").alias("nt"),
    )
    assert derived.exceptAll(expect).count() == 0
    assert expect.exceptAll(derived).count() == 0


def test_ntile_remainder_placement(spark):
    # 10 rows, 4 tiles: sizes must be 3,3,2,2 (first n%k tiles get the extra)
    rows = [(i, f"x{i}") for i in range(10)]
    df = _df(spark, rows)
    got, n = global_row_number(df, [F.col("k")], rn_col="rn", num_partitions=3)
    tiles = (
        got.select(ntile_of(F.col("rn"), n, 4).alias("t"))
        .groupBy("t")
        .count()
        .orderBy("t")
        .collect()
    )
    assert [(r["t"], r["count"]) for r in tiles] == [(1, 3), (2, 3), (3, 2), (4, 2)]


def test_more_partitions_than_rows(spark):
    rows = [(3, "a"), (1, "b"), (2, "c")]
    df = _df(spark, rows)
    got, n = global_row_number(df, [F.col("k")], rn_col="rn", num_partitions=16)
    assert n == 3
    assert [r["v"] for r in got.orderBy("rn").collect()] == ["b", "c", "a"]


def test_descending_order(spark):
    rows = [(i, f"x{i}") for i in range(20)]
    df = _df(spark, rows)
    got, _ = global_row_number(
        df, [F.col("k").desc()], rn_col="rn", num_partitions=4
    )
    top = got.filter(F.col("rn") == 1).collect()
    assert len(top) == 1 and top[0]["k"] == 19
