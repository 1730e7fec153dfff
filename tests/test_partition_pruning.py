"""Partition-layout evidence: a date-partitioned write + a date filter must
plan a pruned scan (partition filters, not a full-table scan) — the layout
contract a 100 TB event log lives or dies by.

This is the write-side complement to the plan tests in test_plans.py (which
assert predicate pushdown into row groups of unpartitioned parquet).
"""

import os
import tempfile

from pyspark.sql import functions as F

from messikinesisprovider_spark.operators.relational import events_tbl
from messikinesisprovider_spark.plans import inspect

SF = "/root/testdata/sf0.001"


def test_date_partitioned_scan_prunes_partitions(spark):
    out = os.path.join(tempfile.mkdtemp(prefix="part_"), "events_by_day")
    ev = events_tbl(spark, SF).withColumn("day", F.to_date("ts"))
    ev.write.partitionBy("day").mode("overwrite").parquet(out)

    df = spark.read.parquet(out).filter(F.col("day") == "2024-01-05")
    plan = inspect.physical_plan(df)
    flat = plan.replace(" ", "").lower()
    # the day predicate must appear as a PARTITION filter on the scan
    assert "partitionfilters" in flat
    assert "day" in flat.split("partitionfilters", 1)[1][:200]

    # and the pruned read returns exactly that day's rows
    want = ev.filter(F.to_date("ts") == "2024-01-05").count()
    assert df.count() == want
    assert want > 0

    # pruning actually reduces the input: reading one day touches one
    # partition directory of ~30
    days = [d for d in os.listdir(out) if d.startswith("day=")]
    assert len(days) > 10
