"""Training-shard writers: the last mile of the corpus pipeline.

Two write paths:

- `write_training_shards` (batch): deterministic, size-targeted parquet
  shards, globally range-ordered by a sort key (so a reader streaming
  shards in file order sees quality-descending or time-ordered data).
- `foreach_batch_shard_writer` (streaming): the canonical idempotent
  foreachBatch sink — each microbatch lands in a directory named by its
  batch id, and a replayed batch id is skipped, turning Structured
  Streaming's at-least-once batch redelivery into exactly-once output.
  Mirrors the reference's sink-side delivery contract
  (KinesisMessiProducer.java:60,103-160 retries; FileBasedProgressTracker
  debounce implies replay) re-expressed for a file sink.

Scale notes: `repartitionByRange` samples the sort key to build balanced
range bounds — one shuffle, no global sort of the full data;
`maxRecordsPerFile` splits within each range partition without another
exchange. At 100 TB, bump `n_partitions` to keep ~128 MB files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    order_by: str,
    n_partitions: int = 8,
    max_records_per_file: int = 10_000,
    descending: bool = True,
) -> int:
    """Write `df` as range-ordered parquet shards; returns rows written.

    Global order across shards comes from repartitionByRange (shard i holds
    strictly better/earlier keys than shard i+1); order within a file from
    sortWithinPartitions. No global sort, no driver collection.
    """
    key = F.col(order_by).desc() if descending else F.col(order_by).asc()
    (
        df.repartitionByRange(n_partitions, key)
        .sortWithinPartitions(key)
        .write.option("maxRecordsPerFile", max_records_per_file)
        .mode("overwrite")
        .parquet(path)
    )
    return df.sparkSession.read.parquet(path).count()


def foreach_batch_shard_writer(base_path: str):
    """Returns a foreachBatch function writing each microbatch to
    `base_path/batch_id=N`, skipping batch ids that already exist.

    Structured Streaming replays the last uncommitted batch after a crash —
    with a plain append sink that duplicates rows. Writing into a
    batch-id-named directory and testing existence first makes the sink
    idempotent: replay of batch N finds batch_id=N complete and skips it.
    The _SUCCESS marker (written atomically last by the parquet committer)
    is the completeness test, so a torn first attempt is re-written, not
    skipped.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        target = os.path.join(base_path, f"batch_id={batch_id}")
        if os.path.exists(os.path.join(target, "_SUCCESS")):
            return
        batch_df.write.mode("overwrite").parquet(target)

    return write
