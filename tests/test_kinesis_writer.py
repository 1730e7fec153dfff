"""Tests for the PySpark-4 Python Data Source WRITE path of
``format("kinesismessi")`` (sources/kinesis_writer.py) — the batch
`writer` and streaming `streamWriter` completing S1-S3 as a real format.

Everything runs against the file-backed broker simulator (executor write
tasks are forked worker processes, so only cross-process state works)."""

from __future__ import annotations

import uuid

import pytest

from messikinesisprovider_spark import wire
from messikinesisprovider_spark.sources import kinesis_sim, kinesis_source
from messikinesisprovider_spark.sources.kinesis import KinesisShardConsumer
from messikinesisprovider_spark.streaming.policy import PollPolicy


def _drain_all(client, stream, n_shards):
    out = []
    for sid in range(n_shards):
        c = KinesisShardConsumer(
            client, stream, str(sid), policy=PollPolicy(poll_interval_ms=1, fetch_limit=1000)
        )
        while True:
            m = c.poll(timeout_s=0.05)
            if m is None:
                break
            out.append(m)
    return out


def _writer_opts(df_writer, statedir):
    return (
        df_writer.format("kinesismessi")
        .option("streamname", "s")
        .option(
            "clientfactory",
            "messikinesisprovider_spark.sources.kinesis_sim:client_from_options",
        )
        .option("statedir", statedir)
    )


def test_batch_write_roundtrip(spark, tmp_path):
    statedir = str(tmp_path / "b")
    client = kinesis_sim.FakeKinesisClient(statedir)
    client.create_stream(StreamName="s", ShardCount=3)
    kinesis_source.register(spark)

    rows = [(f"pk{i}", wire.encode_message({"external_id": f"e{i}"})) for i in range(40)]
    df = spark.createDataFrame(rows, "partition_key string, payload binary")
    _writer_opts(df.repartition(4).write, statedir).mode("append").save()

    msgs = _drain_all(client, "s", 3)
    assert sorted(m["external_id"] for m in msgs) == sorted(f"e{i}" for i in range(40))
    # md5 partition-key routing spread the records over the shards
    assert len({m["provider"]["shard_id"] for m in msgs}) > 1


def test_batch_write_rejects_missing_columns(spark, tmp_path):
    statedir = str(tmp_path / "b2")
    kinesis_sim.FakeKinesisClient(statedir).create_stream(StreamName="s", ShardCount=1)
    kinesis_source.register(spark)
    df = spark.createDataFrame([("x",)], "partition_key string")
    with pytest.raises(Exception, match="payload"):
        _writer_opts(df.write, statedir).mode("append").save()


def test_stream_write_microbatches(spark, tmp_path):
    """readStream(messilog-staged parquet) -> writeStream(kinesismessi):
    the full Spark-native pipe, delivered exactly once per microbatch."""
    statedir = str(tmp_path / "bs")
    client = kinesis_sim.FakeKinesisClient(statedir)
    client.create_stream(StreamName="s", ShardCount=2)
    kinesis_source.register(spark)

    src_dir = str(tmp_path / "src")
    rows = [(f"pk{i}", wire.encode_message({"external_id": f"s{i}"})) for i in range(25)]
    spark.createDataFrame(rows, "partition_key string, payload binary").write.parquet(src_dir)

    stream = (
        spark.readStream.schema("partition_key string, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        _writer_opts(stream.writeStream, statedir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    msgs = _drain_all(client, "s", 2)
    assert sorted(m["external_id"] for m in msgs) == sorted(f"s{i}" for i in range(25))

    # restart with the same checkpoint: nothing new to publish, no duplicates
    q = (
        _writer_opts(
            spark.readStream.schema("partition_key string, payload binary")
            .parquet(src_dir)
            .writeStream,
            statedir,
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(_drain_all(client, "s", 2)) == 25


def test_write_requires_streamname(spark, tmp_path):
    kinesis_source.register(spark)
    df = spark.createDataFrame([("x", b"y")], "partition_key string, payload binary")
    with pytest.raises(Exception, match="streamname"):
        (
            df.write.format("kinesismessi")
            .option(
                "clientfactory",
                "messikinesisprovider_spark.sources.kinesis_sim:client_from_options",
            )
            .option("statedir", str(tmp_path / "nostream"))
            .mode("append")
            .save()
        )
