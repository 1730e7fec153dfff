"""Publishing sink with the reference producer's delivery semantics (S1-S3).

The reference batches messages into one PutRecords call, then loops re-putting
only the failed subset until none remain, logging a warning that retries can
reorder within the batch (KinesisMessiProducer.java:60,103-160, warning :112).

Spark-first shape: a `foreachBatch` sink. The DEFAULT publisher is the
executor-side `foreach_partition_publisher` — each partition opens its own
transport and puts in 500-record chunks, so publish throughput scales with
executors and nothing is collected to the driver. The driver-side
`foreach_batch_publisher` remains for simulator-backed tests and tiny
streams (its transport needn't be serializable), bounded by microbatch
admission. Both run the failed-subset retry loop; ULIDs are assigned before
the first attempt, so retries are idempotent and a downstream
`effectively_once` consumer collapses any duplicates (the reference's
logical-order-recovery story, SURVEY.md §7.4 item 5).
"""

from __future__ import annotations

import logging
from collections.abc import Callable

from pyspark.sql import DataFrame

log = logging.getLogger(__name__)


class SinkError(RuntimeError):
    pass


class PartialFailure(Exception):
    """Transport reported per-record failures: `failed` holds input indices
    (the analog of PutRecordsResponse entries with errorCode set)."""

    def __init__(self, failed: list[int]):
        super().__init__(f"{len(failed)} records failed")
        self.failed = failed


def publish_with_retry(
    records: list[dict],
    transport: Callable[[list[dict]], None],
    max_rounds: int = 10,
) -> int:
    """Send `records`; on PartialFailure keep re-sending only the failed
    subset until clean or `max_rounds` exhausted. Returns rounds used."""
    batch = records
    rounds = 0
    while batch:
        rounds += 1
        if rounds > max_rounds:
            raise SinkError(f"still {len(batch)} failed records after {max_rounds} rounds")
        try:
            transport(batch)
            return rounds
        except PartialFailure as pf:
            if rounds == 1 and pf.failed:
                # KinesisMessiProducer.java:112 — acknowledged reordering hazard
                log.warning(
                    "Records failed when publishing batch, retrying %d failed; "
                    "this may re-order messages within the batch",
                    len(pf.failed),
                )
            batch = [batch[i] for i in pf.failed]
    return rounds


def foreach_partition_publisher(
    transport_factory: Callable[[], Callable[[list[dict]], None]],
    max_rounds: int = 10,
    batch_size: int = 500,
):
    """The DEFAULT publishing sink: executor-side, cluster-scale. Each
    partition opens its own transport (factory must be serializable) and
    publishes its rows in `batch_size` chunks — the analog of the
    reference's one-PutRecords-per-500-records ceiling — with the same
    failed-subset retry loop per chunk. Nothing is collected to the driver;
    throughput scales with executor count.

    Usage:
        df.writeStream.foreachBatch(foreach_partition_publisher(make_transport))
    The returned function is also directly usable on a batch DataFrame.
    """

    def handle(batch_df: DataFrame, batch_id: int = 0) -> None:
        def publish_partition(rows_iter) -> None:
            transport = transport_factory()
            chunk: list[dict] = []
            for row in rows_iter:
                chunk.append(row.asDict(recursive=True))
                if len(chunk) >= batch_size:
                    publish_with_retry(chunk, transport, max_rounds=max_rounds)
                    chunk = []
            if chunk:
                publish_with_retry(chunk, transport, max_rounds=max_rounds)

        batch_df.foreachPartition(publish_partition)

    return handle


def foreach_batch_publisher(
    transport_factory: Callable[[], Callable[[list[dict]], None]],
    max_rounds: int = 10,
):
    """Driver-side publisher for SIMULATOR tests and tiny streams — use
    `foreach_partition_publisher` (above) for anything cluster-scale.
    `transport_factory` is invoked per batch on the driver, so the
    transport needn't be serializable (handy for in-process fakes); the
    collect is bounded by microbatch admission (maxFilesPerTrigger).

    Usage:
        df.writeStream.foreachBatch(foreach_batch_publisher(make_transport))
          .option("checkpointLocation", ...).start()
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        transport = transport_factory()
        records = [r.asDict(recursive=True) for r in batch_df.collect()]
        if records:
            publish_with_retry(records, transport, max_rounds=max_rounds)

    return handle
