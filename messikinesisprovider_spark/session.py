"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` but every default here is chosen to also
hold on a large multi-executor cluster reading ~100 TB:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting,
  broadcast demotion/promotion) — the single most important knob at scale.
- Arrow on for the Pandas-UDF slow path.
- UTC session timezone so timestamp semantics match the DuckDB oracle.
- shuffle.partitions sized to the local core count for tests; on a real
  cluster AQE's coalescing makes the initial number mostly a ceiling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(app_name: str = "messikinesisprovider_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # UDTFs ride Arrow too — row-at-a-time Python is banned repo-wide
        # (tests/test_plans.py sweeps every registered plan for it)
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # AQE may rewrite a sort-merge join to a shuffled-hash join at
        # runtime when every post-shuffle partition of the build side is
        # under this threshold (guide §3.1) — sizes are KNOWN at that point,
        # so unlike preferSortMergeJoin=false this cannot OOM on a
        # mis-estimate. Scale-safe by construction: the bound is per
        # partition, not per table, and 64 MB/partition is modest against
        # the executor memory both locally and on a cluster. Parameterised
        # for experiments; "0" disables (the Spark default).
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_AQE_SHJ_THRESHOLD", "64m"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, register: bool = True):
    """Load the driver's parquet tables; optionally register temp views.

    Plain ``spark.read.parquet`` — Catalyst handles column pruning and
    predicate pushdown into the scan, so no manual projection here.
    """
    dfs = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            dfs[name] = df
            if register:
                df.createOrReplaceTempView(name)
    return dfs
