"""Bounded-state streaming dedup, round 4 (appended).

``streaming_dedup_within_watermark`` pins `dropDuplicatesWithinWatermark`
— the production dedup for at-least-once sources. Plain `dropDuplicates`
(used by `streaming_dedup_count`) keeps EVERY key in the state store
forever: at 100 TB the state grows without bound and the job eventually
dies. The WithinWatermark variant evicts keys once the watermark passes
their event time + delay, so state is bounded by the stream's time skew —
at the price that only duplicates arriving within the watermark window
are deduplicated (exactly the at-least-once replay profile: Kinesis
redelivers close in time, not days later).

Protocol (fresh log, one checkpoint, one query shape):

1. pass 1 — all events PLUS immediate duplicates of a hash-selected
   subset (same batch → nothing is late, dedup must drop them by KEY);
2. pass 2 — duplicates again: recent ones (within the watermark window)
   are dropped from STATE as duplicates; old ones are dropped as LATE.
   Either path, nothing new may be emitted — the TCK asserts pass 2
   added zero rows, and distinguishes the two mechanisms by count.

The emitted set must therefore equal the distinct original events — the
oracle is the raw events table, so the compare hash-verifies that every
duplicate died and every original survived.
"""

from __future__ import annotations

import os
import tempfile
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..operators.dedup import h60_duck, h60_spark
from ..operators.relational import events_tbl
from .verified import pk_encode

_DUP_MOD = 7  # duplicate every 7th event (hash-selected)
_WM = "1 hour"

_DEDUP_WM_ORACLE = """
SELECT CAST(event_id AS VARCHAR) AS external_id, ts,
       CAST(1 AS BIGINT) AS n_emitted
FROM events
WHERE ts IS NOT NULL AND event_id IS NOT NULL
"""


@register(
    "streaming_dedup_within_watermark",
    oracle=_DEDUP_WM_ORACLE,
    description="Bounded-state streaming dedup: dropDuplicatesWithinWatermark "
    "over a replayed log (immediate + cross-batch duplicate injection); "
    "emitted set must equal the distinct originals — state bounded by the "
    "watermark window instead of growing forever",
    tags=("streaming", "dedup", "watermark", "verified"),
)
def streaming_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..log import MessiLog, ingest_dataframe
    from . import consume

    schema = "external_id string, ts timestamp, n_emitted bigint"
    ev = events_tbl(spark, sf_dir).filter(
        F.col("ts").isNotNull() & F.col("event_id").isNotNull()
    )
    src = ev.select(
        pk_encode(F.col("user_id")).alias("partition_key"),
        F.col("event_id").cast("string").alias("external_id"),
        "ts",
    )
    dup_cond = F.expr(h60_spark("CAST(event_id AS STRING)")) % _DUP_MOD == 0
    dups = ev.filter(dup_cond).select(
        pk_encode(F.col("user_id")).alias("partition_key"),
        F.col("event_id").cast("string").alias("external_id"),
        "ts",
    )
    root = os.path.join(tempfile.mkdtemp(prefix="dedupwm_"), "log")
    os.makedirs(root, exist_ok=True)
    stage_root = os.path.join(tempfile.mkdtemp(prefix="dedupwm_stage_"), "log")
    stage_log = MessiLog(spark, stage_root, n_shards=4)
    ckpt = tempfile.mkdtemp(prefix="dwm_ckpt_")
    out_dir = tempfile.mkdtemp(prefix="dwm_out_") + "/out"
    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)

    def drain():
        deduped = (
            consume.stream_log(spark, root, files_per_trigger=1_000_000)
            .withWatermark("ts", _WM)
            .dropDuplicatesWithinWatermark(["external_id"])
            .select("external_id", "ts", F.lit(1).cast("bigint").alias("n_emitted"))
        )
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # ONE staged ingest (round-8: the per-pass ingest jobs and both
    # limit-count probe jobs were the fixed cost here); pass boundaries are
    # enforced by promoting stage dirs between drains — absent stage dirs
    # double as the empty-source / no-duplicates checks for free.
    from .verified8 import _promote_stage

    staged = src.withColumn("stage", F.lit(1)).unionByName(
        dups.withColumn("stage", F.lit(1))
    ).unionByName(dups.withColumn("stage", F.lit(2)))
    ingest_dataframe(stage_log, staged, "events", now=t0, stage_col="stage")
    with consume.state_partitions(spark):
        # pass 1: originals + same-batch duplicates (dedup by key, nothing late)
        if not _promote_stage(stage_root, root, 1):  # empty source
            return spark.createDataFrame([], schema)
        drain()
        # pass 2: the duplicates AGAIN — recent ones die as in-state
        # duplicates, old ones as late rows; zero new emissions either way
        if _promote_stage(stage_root, root, 2):
            drain()
    return spark.read.schema(schema).parquet(out_dir)
