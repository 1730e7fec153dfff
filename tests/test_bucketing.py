"""Bucketed-table co-located join: the 100 TB strategy for repeated big-big
joins — both sides bucketed on the join key → sort-merge join with ZERO
exchange (no shuffle) in the plan."""

import os

from pyspark.sql import functions as F

from messikinesisprovider_spark.plans import inspect


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    warehouse = str(tmp_path / "wh")
    spark.sql("CREATE DATABASE IF NOT EXISTS buckets LOCATION '" + warehouse + "'")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("buckets.orders_b")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("buckets.lineitem_b")
    )
    # disable broadcast so the join would normally shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ob = spark.table("buckets.orders_b")
        lb = spark.table("buckets.lineitem_b")
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy("o_orderpriority").count()
        plan = inspect.physical_plan(joined)
        assert "SortMergeJoin" in plan
        # bucketed co-location: no Exchange feeding the join (the only
        # exchange allowed is the one for the final small aggregation)
        join_section = plan.split("HashAggregate")[0]
        assert "Exchange" not in join_section.split("SortMergeJoin")[-1]
        n = joined.agg(F.sum("count")).collect()[0][0]
        assert n == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
