"""Day-partitioned table layout + partition-pruned scans, round 3 (appended).

Partition pruning is THE dominant scan optimization at 100 TB: a
date-partitioned fact table turns a 3-day query into a 3-directory read
regardless of corpus size. This module owns the offline layout step
(``ensure_day_partitioned_events`` — the `partitionBy("day")` writer, the
analog of `bucketed.ensure_bucketed_tables`) and the registry query that
proves both halves:

``partition_pruned_daily``: reads the partitioned layout with a literal
3-day predicate — Catalyst turns it into `PartitionFilters` (no data read
outside the three directories; `tests/test_partitioned.py` pins the scan's
partition count) — and aggregates per (day, event_type). The oracle runs
the same 3-day window over the RAW events table, so the compare also
proves the partitioned round-trip lost nothing.

The 3-day window starts at min(day)+5; the lower bound is a driver-side
single-row lookup on the raw table (footer-cheap, the sanctioned cursor
point-lookup shape) because static partition pruning needs a LITERAL
predicate — exactly how a production daily job parameterizes its run date.
"""

from __future__ import annotations

import datetime
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import events_tbl

_PARTITIONED: dict[tuple[int, str], str] = {}


def ensure_day_partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Write (once per session+sf) the events table partitioned by day."""
    key = (id(spark), sf_dir)
    if key in _PARTITIONED and os.path.isdir(_PARTITIONED[key]):
        return _PARTITIONED[key]
    out = os.path.join(tempfile.mkdtemp(prefix="events_by_day_"), "events")
    (
        events_tbl(spark, sf_dir)
        .withColumn("day", F.to_date("ts"))
        .write.partitionBy("day")
        .mode("overwrite")
        .parquet(out)
    )
    _PARTITIONED[key] = out
    return out


_PRUNED_ORACLE = """
WITH b AS (SELECT CAST(MIN(ts) AS DATE) + 5 AS d0 FROM events)
SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
FROM events CROSS JOIN b
WHERE CAST(ts AS DATE) >= d0 AND CAST(ts AS DATE) <= d0 + 2
GROUP BY 1, 2
"""


@register(
    "partition_pruned_daily",
    oracle=_PRUNED_ORACLE,
    description="3-day aggregate over the day-partitioned events layout — "
    "PartitionFilters prune the scan to 3 directories; oracle on raw events "
    "proves the partitioned round-trip",
    tags=("layout", "partitioning", "pruning", "extension"),
)
def partition_pruned_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal-bounded read of the partitioned layout (see module doc)."""
    root = ensure_day_partitioned_events(spark, sf_dir)
    lo = (
        events_tbl(spark, sf_dir)
        .agg(F.min(F.to_date("ts")).alias("d0"))
        .collect()[0]["d0"]
    )
    schema = "day timestamp, event_type string, n bigint, n_users bigint, value_sum double"
    if lo is None:  # empty source: nothing was partitioned
        return spark.createDataFrame([], schema)
    d0 = lo + datetime.timedelta(days=5)
    d2 = d0 + datetime.timedelta(days=2)
    part = spark.read.parquet(root).filter(
        (F.col("day") >= F.lit(d0)) & (F.col("day") <= F.lit(d2))
    )
    return part.groupBy(
        F.col("day").cast("timestamp").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.expr("CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)").alias("value_sum"),
    )
