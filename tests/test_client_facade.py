"""Client-facade TCK: the reference's navigation and consumer loop shape.

Mirrors MessiClientTck.java's usage pattern: client → topicOf → shardOf →
producer/streamingConsumer, receive-until-null, seek interleaving."""

from datetime import datetime, timedelta, timezone

import pytest

from messikinesisprovider_spark.client import MessiClient
from messikinesisprovider_spark.log import UnsupportedOperation

T0 = datetime(2026, 7, 1, tzinfo=timezone.utc)


@pytest.fixture()
def client(spark, tmp_path):
    return MessiClient(spark, str(tmp_path / "clog"), n_shards=1)


def _publish_abcd(client):
    producer = client.topic_of("the-topic").producer()
    for i, e in enumerate("abcd"):
        producer.publish(
            {"partition_key": "pk1", "external_id": e}, now=T0 + timedelta(milliseconds=10 * i)
        )


def test_receive_until_null(client):
    _publish_abcd(client)
    topic = client.topic_of("the-topic")
    shard = topic.shard_of(topic.first_shard())
    consumer = shard.streaming_consumer(shard.cursor_at_trim_horizon())
    got = []
    while (m := consumer.receive()) is not None:
        got.append(m["external_id"])
    assert got == ["a", "b", "c", "d"]


def test_checkpoint_roundtrip_through_facade(client):
    _publish_abcd(client)
    topic = client.topic_of("the-topic")
    shard = topic.shard_of(topic.first_shard())
    consumer = shard.streaming_consumer(shard.cursor_at_trim_horizon())
    consumer.receive()  # a
    b = consumer.receive()
    ckpt = shard.cursor_after(b).checkpoint()
    resumed = shard.streaming_consumer(shard.cursor_of_checkpoint(ckpt))
    assert [resumed.receive()["external_id"], resumed.receive()["external_id"]] == ["c", "d"]
    assert resumed.receive() is None


def test_seek_interleaved(client):
    # MessiClientTck.java:434-467: forward and backward seeks on one consumer
    _publish_abcd(client)
    topic = client.topic_of("the-topic")
    shard = topic.shard_of(topic.first_shard())
    consumer = shard.streaming_consumer(shard.cursor_at_trim_horizon())
    assert consumer.receive()["external_id"] == "a"
    consumer.seek(T0 + timedelta(milliseconds=25))
    assert consumer.receive()["external_id"] == "d"
    consumer.seek(T0 + timedelta(milliseconds=5))
    assert consumer.receive()["external_id"] == "b"


def test_shards_shared_across_topics(client):
    t1, t2 = client.topic_of("t1"), client.topic_of("t2")
    assert t1.shards() == t2.shards()


def test_unsupported_surface(client):
    with pytest.raises(UnsupportedOperation):
        client.last_message("t", "0")
    with pytest.raises(UnsupportedOperation):
        client.metadata_client()
    topic = client.topic_of("t")
    consumer = topic.shard_of(topic.first_shard()).streaming_consumer(
        topic.shard_of(topic.first_shard()).cursor_at_trim_horizon()
    )
    with pytest.raises(UnsupportedOperation):
        consumer.current_position()


def test_closed_client_rejects(client):
    client.close()
    assert client.is_closed()
    with pytest.raises(RuntimeError):
        client.topic_of("t")


def test_empty_topic_receives_null(client):
    topic = client.topic_of("nothing-here")
    shard = topic.shard_of(topic.first_shard())
    consumer = shard.streaming_consumer(shard.cursor_at_trim_horizon())
    assert consumer.receive() is None


def test_publish_async_returns_future_and_preserves_order(spark, tmp_path):
    client = MessiClient(spark, str(tmp_path / "alog"), n_shards=1)
    producer = client.topic_of("t").producer()
    f1 = producer.publish_async({"partition_key": "k", "external_id": "a"})
    f2 = producer.publish_async({"partition_key": "k", "external_id": "b"})
    r1, r2 = f1.result(timeout=120), f2.result(timeout=120)
    assert r1[0]["external_id"] == "a" and r2[0]["external_id"] == "b"
    # async publishes from one producer keep ULID monotonic order (O1)
    assert r1[0]["ulid"] < r2[0]["ulid"]
    shard = client.topic_of("t").shard_of("0")
    consumer = shard.streaming_consumer(shard.cursor_at_trim_horizon())
    got = [consumer.receive()["external_id"] for _ in range(2)]
    assert got == ["a", "b"]


# -- receive_async (KinesisMessiStreamingConsumer.java:162-173) --------------


def test_receive_async_drains_in_order(client):
    _publish_abcd(client)
    topic = client.topic_of("the-topic")
    shard = topic.shard_of(topic.first_shard())
    consumer = shard.streaming_consumer(shard.cursor_at_trim_horizon())
    futures = [consumer.receive_async() for _ in range(4)]
    assert [f.result(timeout=30)["external_id"] for f in futures] == ["a", "b", "c", "d"]


def test_receive_async_times_out_null_on_empty(client):
    topic = client.topic_of("the-topic")
    shard = topic.shard_of(topic.first_shard())
    consumer = shard.streaming_consumer(shard.cursor_at_trim_horizon())
    # reference semantics: resolves to null at the internal timeout
    f = consumer.receive_async(timeout=timedelta(milliseconds=200))
    assert f.result(timeout=30) is None


def test_receive_async_picks_up_late_publish(client):
    """Unlike sync receive (None at the tail), a pending async receive keeps
    re-scanning and resolves once a message arrives within the bound."""
    _publish_abcd(client)
    topic = client.topic_of("the-topic")
    shard = topic.shard_of(topic.first_shard())
    consumer = shard.streaming_consumer(shard.cursor_at_trim_horizon())
    for _ in range(4):
        assert consumer.receive_async().result(timeout=30) is not None
    pending = consumer.receive_async(timeout=timedelta(seconds=20))
    topic.producer().publish(
        {"partition_key": "pk1", "external_id": "late"},
        now=T0 + timedelta(seconds=1),
    )
    assert pending.result(timeout=30)["external_id"] == "late"


def test_receive_async_then_sync_does_not_replay(client):
    _publish_abcd(client)
    topic = client.topic_of("the-topic")
    shard = topic.shard_of(topic.first_shard())
    consumer = shard.streaming_consumer(shard.cursor_at_trim_horizon())
    assert consumer.receive_async().result(timeout=30)["external_id"] == "a"
    assert consumer.receive()["external_id"] == "b"
