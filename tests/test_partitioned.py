"""Partition-pruning evidence for the day-partitioned events layout."""

import datetime
import os

from pyspark.sql import functions as F

from messikinesisprovider_spark.operators import partitioned
from messikinesisprovider_spark.operators.relational import events_tbl
from messikinesisprovider_spark.plans import inspect

SF = "/root/testdata/sf0.001"


def test_partition_filters_reach_the_scan(spark):
    plan = inspect.physical_plan(partitioned.partition_pruned_daily(spark, SF))
    # the day predicate must prune at the DIRECTORY level, not as a data
    # filter after reading everything
    assert "PartitionFilters" in plan
    assert "day" in plan.split("PartitionFilters", 1)[1][:300]


def test_scan_reads_only_three_partitions(spark):
    root = partitioned.ensure_day_partitioned_events(spark, SF)
    n_dirs = len([d for d in os.listdir(root) if d.startswith("day=")])
    assert n_dirs > 10  # the layout genuinely has many day partitions
    lo = events_tbl(spark, SF).agg(F.min(F.to_date("ts")).alias("d")).collect()[0]["d"]
    d0 = lo + datetime.timedelta(days=5)
    d2 = d0 + datetime.timedelta(days=2)
    pruned = spark.read.parquet(root).filter(
        (F.col("day") >= F.lit(d0)) & (F.col("day") <= F.lit(d2))
    )
    files = {r[0] for r in pruned.select(F.input_file_name()).distinct().collect()}
    days = {f.split("day=")[1].split("/")[0] for f in files}
    assert days == {str(d0 + datetime.timedelta(days=i)) for i in range(3)}


def test_partitioned_roundtrip_loses_nothing(spark):
    root = partitioned.ensure_day_partitioned_events(spark, SF)
    n_part = spark.read.parquet(root).count()
    n_raw = events_tbl(spark, SF).count()
    assert n_part == n_raw
