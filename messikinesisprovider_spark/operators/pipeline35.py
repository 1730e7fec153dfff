"""Round 4 additions, part 10: resize stage end-to-end, dynamic partition
pruning.

- ``multimodal_resize_pipeline`` — registers the RESIZE stage (binary in,
  binary out, mapInPandas — the plumbing a real PIL.resize uses) as an
  oracle-checked query: synthesize FIMG containers, clamp to 256px
  (python: ``int(w * (256 / max(w, h)))``; the oracle replicates the SAME
  IEEE op order — divide first, then multiply, then truncate), and reduce
  to per-branch accounting (resized vs passthrough: counts, dim sums/
  maxes, output byte totals). Proves the rewrite stage is lossless where
  it should be and clamped where it must be.

- ``dpp_dim_filter_join`` — Spark's dynamic partition pruning made
  visible and pinned: a day-partitioned fact table joined to a small
  day-dimension filtered on day-of-week. At planning time the partition
  filter is unknown; DPP injects ``dynamicpruningexpression`` into the
  fact scan's PartitionFilters so only matching day partitions are read —
  at 100 TB the difference between scanning 30 partitions and 8. The
  executed plan is pinned by tests/test_plans.py::test_dpp_is_planned.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .multimodal import resize_image_meta, synthesize_image_column
from .partitioned import ensure_day_partitioned_events
from .relational import spread, tbl

# ---------------------------------------------------------------------------
# multimodal_resize_pipeline
# ---------------------------------------------------------------------------

_MAX_DIM = 256

_RESIZE_ORACLE = f"""
WITH m AS (
  SELECT 1 + (('0x' || substr(md5(text), 1, 4))::INT % 2048) AS w0,
         1 + (('0x' || substr(md5(text), 5, 4))::INT % 2048) AS h0,
         9 + octet_length(encode(text)) AS nb
  FROM documents WHERE text IS NOT NULL
),
r AS (
  SELECT GREATEST(w0, h0) > {_MAX_DIM} AS was_resized,
         CASE WHEN GREATEST(w0, h0) <= {_MAX_DIM} THEN w0
              ELSE GREATEST(1, CAST(trunc(w0 * ({_MAX_DIM}.0 / GREATEST(w0, h0))) AS INT)) END AS w,
         CASE WHEN GREATEST(w0, h0) <= {_MAX_DIM} THEN h0
              ELSE GREATEST(1, CAST(trunc(h0 * ({_MAX_DIM}.0 / GREATEST(w0, h0))) AS INT)) END AS h,
         nb
  FROM m
)
SELECT was_resized,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(w) AS BIGINT) AS width_sum,
       CAST(SUM(h) AS BIGINT) AS height_sum,
       CAST(MAX(w) AS BIGINT) AS max_width,
       CAST(MAX(h) AS BIGINT) AS max_height,
       CAST(SUM(nb) AS BIGINT) AS total_bytes
FROM r GROUP BY 1
"""


@register(
    "multimodal_resize_pipeline",
    oracle=_RESIZE_ORACLE,
    description=f"Binary resize stage end-to-end: synthesize -> mapInPandas "
    f"clamp to {_MAX_DIM}px (container rewrite, binary in/binary out) -> "
    "per-branch accounting; the oracle replicates the exact IEEE op order "
    "of the python scale math (divide, multiply, truncate)",
    tags=("multimodal", "mapinpandas", "extension"),
)
def multimodal_resize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(tbl(spark, sf_dir, "documents").filter(F.col("text").isNotNull()))
    resized = resize_image_meta(synthesize_image_column(d), max_dim=_MAX_DIM)
    return resized.groupBy("was_resized").agg(
        F.count(F.lit(1)).cast("long").alias("n_images"),
        F.sum("width").cast("long").alias("width_sum"),
        F.sum("height").cast("long").alias("height_sum"),
        F.max("width").cast("long").alias("max_width"),
        F.max("height").cast("long").alias("max_height"),
        F.sum(F.length("image")).cast("long").alias("total_bytes"),
    )


# ---------------------------------------------------------------------------
# dpp_dim_filter_join
# ---------------------------------------------------------------------------

_DPP_DOWS = (2, 3)  # Spark dayofweek: 1 = Sunday ... 7 = Saturday
_DIM_DIRS: dict[tuple[int, str], str] = {}


def ensure_day_dim(spark: SparkSession, sf_dir: str) -> str:
    """Layout step (once per session+sf): the day dimension (day, dow)
    written as its OWN parquet source — DPP requires the dim to be a
    separate scan whose runtime filter can be injected into the fact."""
    key = (id(spark), sf_dir)
    if key in _DIM_DIRS and os.path.isdir(_DIM_DIRS[key]):
        return _DIM_DIRS[key]
    root = ensure_day_partitioned_events(spark, sf_dir)
    out = os.path.join(tempfile.mkdtemp(prefix="daydim_"), "daydim")
    (
        spark.read.parquet(root)
        .select("day")
        .distinct()
        .withColumn("dow", F.dayofweek("day"))
        .write.mode("overwrite")
        .parquet(out)
    )
    _DIM_DIRS[key] = out
    return out


def dpp_join_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DPP join itself (shared with the plan-pin test)."""
    ev = spark.read.parquet(ensure_day_partitioned_events(spark, sf_dir))
    dim = spark.read.parquet(ensure_day_dim(spark, sf_dir)).filter(
        F.col("dow").isin(*_DPP_DOWS)
    )
    return (
        ev.filter(F.col("value").isNotNull())
        .join(dim, "day")
        .groupBy("dow")
        .agg(
            F.count_distinct("day").cast("long").alias("n_days"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("value_sum"),
        )
    )


@register(
    "dpp_dim_filter_join",
    oracle=f"""
    SELECT EXTRACT(dow FROM CAST(ts AS DATE)) + 1 AS dow,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
    FROM events
    WHERE ts IS NOT NULL AND value IS NOT NULL
      AND EXTRACT(dow FROM CAST(ts AS DATE)) + 1 IN {_DPP_DOWS}
    GROUP BY 1
    """,
    description="Dynamic partition pruning demonstrated and pinned: "
    "day-partitioned facts joined to a dow-filtered day dimension — the "
    "fact scan's PartitionFilters carry a dynamicpruningexpression, so "
    "only matching day partitions are read at runtime",
    tags=("lakeops", "join", "pruning", "extension"),
)
def dpp_dim_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .relational import events_tbl

    schema = "dow bigint, n_days bigint, n_events bigint, value_sum double"
    # empty source: the partitioned write emits no files and the read-back
    # cannot infer a schema (the partition_pruned_daily guard)
    if events_tbl(spark, sf_dir).limit(1).count() == 0:
        return spark.createDataFrame([], schema)
    out = dpp_join_frame(spark, sf_dir)
    return out.select(
        F.col("dow").cast("long").alias("dow"), "n_days", "n_events", "value_sum"
    )
