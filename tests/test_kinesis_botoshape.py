"""Transport conformance against REAL AWS wire shapes (round-5 item 6).

Every test here drives the engine's transport/consumer/admin code against
``sources.kinesis_mock.MockKinesisClient``, whose errors are botocore
``ClientError``-shaped (``.response["Error"]["Code"]``) and whose responses
carry the real field formats (shardId-000000000000 ids, 21-digit sequence
numbers, opaque base64 iterators, per-record PutRecords error entries) — the
shapes ``KinesisStreamingBuffer.java:121-135`` and
``KinesisMessiProducer.java:103-160`` handle natively. The file-backed
simulator (kinesis_sim) keeps covering the Spark-source multi-process paths;
this suite covers the wire-shape half the simulator's plain exceptions never
touched."""

from __future__ import annotations

import base64
import json

import pytest

from messikinesisprovider_spark.cursor import MessiCursor
from messikinesisprovider_spark.sources.kinesis import (
    KinesisShardConsumer,
    KinesisTransport,
    ensure_stream,
    error_code,
    list_shard_ids,
    list_stream_names,
)
from messikinesisprovider_spark.sources.kinesis_mock import (
    MockClientError,
    MockKinesisClient,
)
from messikinesisprovider_spark.streaming.policy import REFERENCE_POLICY
from messikinesisprovider_spark.streaming.sink import publish_with_retry
from messikinesisprovider_spark.wire import encode_message


class FakeClock:
    def __init__(self):
        self.t = 1_000_000.0

    def __call__(self):
        return self.t

    def sleep(self, s):
        self.t += max(0.0, s)


def _msg(i: int) -> dict:
    return {
        "partition_key": f"pk-{i}",
        "payload": encode_message(
            {"partition_key": f"pk-{i}", "external_id": f"x{i}", "data": {"n": str(i).encode()}}
        ),
    }


def _publish(client, stream: str, n: int, pk=None) -> None:
    client.put_records(
        StreamName=stream,
        Records=[
            {"PartitionKey": pk or f"pk-{i}", "Data": _msg(i)["payload"]}
            for i in range(n)
        ],
    )


def test_client_error_shape_and_classification():
    """error_code() must classify the botocore response-dict shape — the
    path the plain simulator exceptions never exercise."""
    client = MockKinesisClient()
    with pytest.raises(MockClientError) as ei:
        client.describe_stream(StreamName="missing")
    exc = ei.value
    assert error_code(exc) == "ResourceNotFoundException"
    assert exc.response["ResponseMetadata"]["HTTPStatusCode"] == 400
    assert (
        "An error occurred (ResourceNotFoundException) when calling the "
        "DescribeStream operation" in str(exc)
    )


def test_create_existing_stream_is_resource_in_use():
    client = MockKinesisClient()
    client.create_stream(StreamName="s", ShardCount=1)
    with pytest.raises(MockClientError) as ei:
        client.create_stream(StreamName="s", ShardCount=1)
    assert error_code(ei.value) == "ResourceInUseException"


def test_ensure_stream_is_idempotent_via_list():
    client = MockKinesisClient()
    ensure_stream(client, "s", shard_count=2, poll_s=0)
    ensure_stream(client, "s", shard_count=2, poll_s=0)  # no ResourceInUse
    assert list_stream_names(client) == ["s"]


def test_stream_and_shard_pagination_with_real_formats():
    client = MockKinesisClient()
    for i in range(25):
        client.create_stream(StreamName=f"stream-{i:02d}", ShardCount=1)
    names = list_stream_names(client)
    assert names == sorted(f"stream-{i:02d}" for i in range(25))  # 2 pages of 20
    client.create_stream(StreamName="wide", ShardCount=32)
    sids = list_shard_ids(client, "wide")  # 4 pages of 10
    assert sids == [f"shardId-{i:012d}" for i in range(32)]
    desc = client.describe_stream(StreamName="wide")["StreamDescription"]
    assert desc["StreamARN"].endswith(":stream/wide")
    first = desc["Shards"][0]
    assert first["HashKeyRange"]["StartingHashKey"] == "0"
    assert "SequenceNumberRange" in first


def test_iterators_are_opaque_base64():
    client = MockKinesisClient()
    client.create_stream(StreamName="s", ShardCount=1)
    it = client.get_shard_iterator(
        StreamName="s", ShardId="shardId-000000000000", ShardIteratorType="TRIM_HORIZON"
    )["ShardIterator"]
    # decodes as base64 (opaque token), NOT the simulator's shard;seq;epoch
    assert ";" not in it
    payload = json.loads(base64.b64decode(it))
    assert set(payload) >= {"s", "i", "q"}


def test_get_records_validation_error():
    client = MockKinesisClient()
    client.create_stream(StreamName="s", ShardCount=1)
    it = client.get_shard_iterator(
        StreamName="s", ShardId="shardId-000000000000", ShardIteratorType="LATEST"
    )["ShardIterator"]
    with pytest.raises(MockClientError) as ei:
        client.get_records(ShardIterator=it, Limit=20000)
    assert error_code(ei.value) == "ValidationException"


def test_consumer_end_to_end_against_wire_shapes():
    clock = FakeClock()
    client = MockKinesisClient(clock=clock)
    client.create_stream(StreamName="s", ShardCount=1)
    _publish(client, "s", 5, pk="same")
    c = KinesisShardConsumer(
        client,
        "s",
        "shardId-000000000000",
        cursor=MessiCursor.oldest(),
        clock=clock,
        sleep=clock.sleep,
    )
    got = [c.receive(timeout_s=1.0) for _ in range(5)]
    assert [m["external_id"] for m in got] == [f"x{i}" for i in range(5)]
    # sequence numbers surface in the real 21-digit format
    assert got[0]["provider"]["sequence_number"] == "0" * 21


def test_consumer_rate_limit_backoff_wire_shape():
    """F4 against the ProvisionedThroughputExceededException CLIENT-ERROR
    shape: the consumer must defer the next fetch by the 3x backoff."""
    clock = FakeClock()
    client = MockKinesisClient(clock=clock)
    client.create_stream(StreamName="s", ShardCount=1)
    _publish(client, "s", 3, pk="same")
    c = KinesisShardConsumer(
        client,
        "s",
        "shardId-000000000000",
        cursor=MessiCursor.oldest(),
        clock=clock,
        sleep=clock.sleep,
    )
    client.arm_rate_limit()
    t0 = clock()
    assert c.receive(timeout_s=30.0)["external_id"] == "x0"
    # the first fetch hit the armed fault; delivery waited out the 3x backoff
    assert clock() - t0 >= REFERENCE_POLICY.rate_limit_backoff_ms / 1000
    assert c.receive(timeout_s=1.0)["external_id"] == "x1"


def test_consumer_iterator_expiry_recovery_wire_shape():
    """F5 against the ExpiredIteratorException CLIENT-ERROR shape: re-resolve
    and resume exactly after the last buffered record — no loss, no repeat."""
    clock = FakeClock()
    client = MockKinesisClient(clock=clock)
    client.create_stream(StreamName="s", ShardCount=1)
    _publish(client, "s", 2, pk="same")
    c = KinesisShardConsumer(
        client,
        "s",
        "shardId-000000000000",
        cursor=MessiCursor.oldest(),
        clock=clock,
        sleep=clock.sleep,
    )
    assert c.receive(timeout_s=1.0)["external_id"] == "x0"
    assert c.receive(timeout_s=1.0)["external_id"] == "x1"
    client.expire_all_iterators()
    _publish(client, "s", 3, pk="same")  # x0..x2 again, seq 2..4
    got = [c.receive(timeout_s=30.0)["provider"]["sequence_number"] for _ in range(3)]
    assert got == [str(i).zfill(21) for i in (2, 3, 4)]


def test_consumer_ttl_expiry_recovery():
    """Real iterators also expire by AGE (5 min): advance the clock past the
    TTL between fetches and the consumer must recover identically."""
    clock = FakeClock()
    client = MockKinesisClient(clock=clock)
    client.create_stream(StreamName="s", ShardCount=1)
    _publish(client, "s", 1, pk="same")
    c = KinesisShardConsumer(
        client,
        "s",
        "shardId-000000000000",
        cursor=MessiCursor.oldest(),
        clock=clock,
        sleep=clock.sleep,
    )
    assert c.receive(timeout_s=1.0)["external_id"] == "x0"
    clock.t += 600  # > 5-minute iterator TTL
    _publish(client, "s", 1, pk="same")
    assert c.receive(timeout_s=30.0)["provider"]["sequence_number"] == "1".zfill(21)


def test_transport_partial_failure_retry_wire_shape():
    """The PutRecords partial-failure RESPONSE shape (FailedRecordCount +
    per-record ErrorCode entries) must drive the failed-subset retry loop to
    a clean finish with every record delivered exactly once."""
    client = MockKinesisClient()
    client.create_stream(StreamName="s", ShardCount=2)
    transport = KinesisTransport("s", client=client)
    records = [_msg(i) for i in range(10)]
    client.arm_partial_failure(every=3)  # fail records 2, 5, 8 on round 1
    rounds = publish_with_retry(records, transport)
    assert rounds == 2
    # drain both shards: all 10 unique payloads arrived, none duplicated
    seen = []
    for shard in ("shardId-000000000000", "shardId-000000000001"):
        it = client.get_shard_iterator(
            StreamName="s", ShardId=shard, ShardIteratorType="TRIM_HORIZON"
        )["ShardIterator"]
        seen.extend(r["PartitionKey"] for r in client.get_records(ShardIterator=it)["Records"])
    assert sorted(seen) == sorted(f"pk-{i}" for i in range(10))
