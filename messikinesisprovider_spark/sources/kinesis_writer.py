"""First-class Spark write path for ``format("kinesismessi")`` (S1-S3).

The reference's producer is a library call (KinesisMessiProducer.java:60,
103-160); the Spark-native packaging so far was the `foreachBatch` /
`foreachPartition` publishers in streaming/sink.py. This module completes
the surface with PySpark 4's Python Data Source WRITE API, so the sink is
a real format:

    df.write.format("kinesismessi").option("streamname", "s")....save()
    df.writeStream.format("kinesismessi").option("checkpointLocation", ...)
      .start()

Row contract (enforced with a clear error): a ``partition_key`` string
column and a ``payload`` binary column — the wire-encoded envelope
(``wire.encode_column`` produces it). Everything else is ignored, so any
projection of the message schema can be written back.

Semantics, matching the reference producer:

- executor-side: each input partition opens its own transport and puts in
  500-record chunks (the PutRecords ceiling) through
  ``publish_with_retry`` — the failed-subset retry loop with the
  documented reorder warning (S2). Nothing is collected to the driver;
  throughput scales with partitions.
- delivery is AT-LEAST-ONCE across task retries (a re-run partition
  re-publishes): exactly the reference's contract, whose remedy is
  ULID-keyed downstream dedup (O4, `streaming/consume.effectively_once`).
  The commit messages carry per-partition record counts so the driver can
  log an audit line; Kinesis has no transactional multi-shard publish to
  bind a commit to, and the reference makes the same trade.
- streaming: one commit message set per microbatch; `commit(batchId)` is
  the bookkeeping hook (audit log), `abort` logs the failed batch. The
  checkpoint makes REPLAY deterministic (same batch re-published on
  restart), which together with ULID dedup yields effectively-once.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

_CHUNK = 500  # PutRecords ceiling (KinesisMessiProducer.java:60)


@dataclass
class KinesisCommitMessage(WriterCommitMessage):
    n_records: int
    n_chunks: int


def _publish_rows(options: dict, iterator) -> KinesisCommitMessage:
    """Executor-side publish loop shared by the batch and stream writers."""
    from ..streaming.sink import publish_with_retry
    from .kinesis_source import _make_client

    client = _make_client(options)
    stream = options["streamname"]
    from .kinesis import KinesisTransport

    transport = KinesisTransport(stream, client=client)
    n = chunks = 0
    chunk: list[dict] = []
    for row in iterator:
        d = row.asDict()
        if d.get("partition_key") is None or d.get("payload") is None:
            raise ValueError(
                "kinesismessi writer needs 'partition_key' (string) and "
                "'payload' (binary, wire-encoded envelope) columns; got "
                f"row fields {sorted(d)}"
            )
        chunk.append({"partition_key": d["partition_key"], "payload": bytes(d["payload"])})
        if len(chunk) >= _CHUNK:
            publish_with_retry(chunk, transport)
            n += len(chunk)
            chunks += 1
            chunk = []
    if chunk:
        publish_with_retry(chunk, transport)
        n += len(chunk)
        chunks += 1
    return KinesisCommitMessage(n_records=n, n_chunks=chunks)


class KinesisBatchWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.options = dict(options)
        if "streamname" not in self.options:
            raise ValueError("kinesismessi writer requires option('streamname', ...)")

    def write(self, iterator) -> KinesisCommitMessage:
        return _publish_rows(self.options, iterator)

    def commit(self, messages) -> None:
        import logging

        total = sum(m.n_records for m in messages if m is not None)
        logging.getLogger(__name__).info(
            "kinesismessi batch write committed: %d records from %d partitions",
            total,
            len(messages),
        )

    def abort(self, messages) -> None:
        import logging

        logging.getLogger(__name__).warning(
            "kinesismessi batch write aborted; published partitions are NOT "
            "rolled back (at-least-once, the reference producer's contract) — "
            "downstream ULID dedup collapses replays"
        )


class KinesisStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict):
        self.options = dict(options)
        if "streamname" not in self.options:
            raise ValueError("kinesismessi writer requires option('streamname', ...)")

    def write(self, iterator) -> KinesisCommitMessage:
        return _publish_rows(self.options, iterator)

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 (API name)
        import logging

        total = sum(m.n_records for m in messages if m is not None)
        logging.getLogger(__name__).info(
            "kinesismessi microbatch %d committed: %d records", batchId, total
        )

    def abort(self, messages, batchId: int) -> None:  # noqa: N803 (API name)
        import logging

        logging.getLogger(__name__).warning(
            "kinesismessi microbatch %d aborted; replay will re-publish "
            "(at-least-once + ULID dedup = effectively once)",
            batchId,
        )
