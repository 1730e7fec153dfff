"""Streaming upsert materializer: log → latest-state snapshot (CDC pattern).

A message log is an insert-only change stream; most consumers want the
current state per business key. `upsert_snapshot` runs a foreachBatch
MERGE-equivalent: each microbatch reduces to its latest row per key (highest
(shard, sequence)), unions with the existing snapshot, and keeps the winner.
The snapshot is rewritten atomically per batch (overwrite) — at warehouse
scale the same logic targets a MERGE-capable table format; the reduction
logic is identical.

Late/duplicate deliveries are harmless: the winner is chosen by broker
sequence, not arrival, so reprocessing a batch converges to the same state
(idempotent — the at-least-once story O4 needs exactly this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def latest_per_key(
    df: DataFrame, key: str = "external_id", order_cols: tuple[str, ...] | None = None
) -> DataFrame:
    """Reduce to the newest row per key.

    Default winner order is broker position (shard_id, sequence_number) —
    the reference's semantics. Pass `order_cols` to rank by payload fields
    instead (e.g. an event-time + unique-id pair) when the winner must be
    deterministic regardless of ingest parallelism — distributed bulk
    ingest assigns sequences in partition-iteration order, which is not a
    function of the payload.
    """
    cols = order_cols or ("shard_id", "sequence_number")
    w = W.partitionBy(key).orderBy(*[F.col(c).desc() for c in cols])
    return (
        df.filter(F.col(key).isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_snapshot(
    stream_df: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    key: str = "external_id",
    order_cols: tuple[str, ...] | None = None,
):
    """Start a streaming query maintaining `snapshot_dir` as latest-per-key.

    Returns the StreamingQuery. Use trigger availableNow + awaitTermination
    in batch-drain tests.
    """
    spark = stream_df.sparkSession

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        import os
        import shutil

        staged = snapshot_dir + ".staging"
        # Crash recovery for the stage-then-swap below: if a previous batch
        # died between rmtree(snapshot) and rename(staged), the snapshot is
        # gone but the staged dir holds the COMPLETE merged state (its write
        # finished before the swap began — _SUCCESS marker present). Recover
        # it instead of falling through to the first-batch branch, which
        # would silently rebuild from the delta alone and lose history. A
        # staging dir WITHOUT _SUCCESS is an incomplete first-batch write —
        # discard it.
        if os.path.exists(staged) and not os.path.exists(snapshot_dir):
            if os.path.exists(os.path.join(staged, "_SUCCESS")):
                os.rename(staged, snapshot_dir)
            else:
                shutil.rmtree(staged)

        incoming = latest_per_key(batch_df, key, order_cols)
        # Existence check, NOT try/except: a corrupt or unreadable existing
        # snapshot must FAIL the batch (retry/alert), never be silently
        # replaced by the delta alone — that would drop every previously
        # materialized key.
        if os.path.exists(snapshot_dir):
            current = spark.read.parquet(snapshot_dir)
            merged = latest_per_key(current.unionByName(incoming), key, order_cols)
        else:  # first batch: no snapshot yet
            merged = incoming
        # stage-then-swap write: a failed write leaves the old snapshot
        # intact; a crash between rmtree and rename is healed by the
        # recovery block at batch entry above.
        merged.write.mode("overwrite").parquet(staged)
        if os.path.exists(snapshot_dir):
            shutil.rmtree(snapshot_dir)
        os.rename(staged, snapshot_dir)

    return (
        stream_df.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
