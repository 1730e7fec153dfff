"""Custom Python DataSource (format="messilog") tests: batch scan, streaming
offsets, LATEST semantics, admission control, incremental restart."""

import tempfile
import uuid
from datetime import datetime, timezone

import pytest

from messikinesisprovider_spark.log import MessiLog
from messikinesisprovider_spark.sources import messilog_source

T0 = datetime(2026, 3, 1, tzinfo=timezone.utc)


@pytest.fixture()
def log(spark, tmp_path):
    messilog_source.register(spark)
    log = MessiLog(spark, str(tmp_path / "dslog"), n_shards=2)
    log.publish(
        "t", [{"partition_key": f"k{i}", "external_id": str(i)} for i in range(10)], now=T0
    )
    return log


def drain(spark, log, ckpt, starting="TRIM_HORIZON", max_per_shard=None):
    name = "ds" + uuid.uuid4().hex[:10]
    reader = spark.readStream.format("messilog").option("path", log.root).option(
        "startingposition", starting
    )
    if max_per_shard:
        reader = reader.option("maxrecordspershard", str(max_per_shard))
    q = (
        reader.load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_batch_read_all_shards_in_order(spark, log):
    df = spark.read.format("messilog").option("path", log.root).load()
    rows = df.orderBy("shard_id", "sequence_number").collect()
    assert len(rows) == 10
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], []).append(r["sequence_number"])
    for seqs in by_shard.values():
        assert seqs == list(range(len(seqs)))  # dense per-shard order


def test_batch_schema_matches_log_schema(spark, log):
    from messikinesisprovider_spark.schema import LOG_SCHEMA

    df = spark.read.format("messilog").option("path", log.root).load()
    assert df.schema == LOG_SCHEMA


def test_stream_trim_horizon_delivers_all(spark, log, tmp_path):
    out = drain(spark, log, str(tmp_path / "c1"))
    assert out.count() == 10


def test_stream_latest_skips_existing(spark, log, tmp_path):
    out = drain(spark, log, str(tmp_path / "c2"), starting="LATEST")
    assert out.count() == 0


def test_stream_incremental_restart(spark, log, tmp_path):
    # memory sink can't recover a checkpoint; parquet (fault-tolerant) can
    ckpt, out_dir = str(tmp_path / "c3"), str(tmp_path / "out3")

    def drain_parquet():
        q = (
            spark.readStream.format("messilog")
            .option("path", log.root)
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out_dir)

    assert drain_parquet().count() == 10
    log.publish("t", [{"partition_key": "k1", "external_id": "new"}], now=T0)
    out2 = drain_parquet()
    # exactly-once across restart: 10 originals + only the new record
    assert out2.count() == 11
    assert out2.filter(out2.external_id == "new").count() == 1


def test_admission_control_bounds_each_microbatch(log):
    # Spark's Python DataSource API can't announce AvailableNow support, so
    # an availableNow query collapses to a single batch; assert the admission
    # contract at the offset-API level instead (what the engine calls).
    reader = messilog_source.MessiLogStreamReader(
        {"path": log.root, "maxrecordspershard": "2"}
    )
    start = reader.initialOffset()
    assert set(start.values()) == {0}
    o1 = reader.latestOffset()
    assert all(v <= 2 for v in o1.values())  # first batch: ≤2 per shard
    o2 = reader.latestOffset()
    assert all(o2[s] <= o1[s] + 2 for s in o2)  # advances ≤2 per call
    # partitions() plans one slice per shard with work to do
    parts = reader.partitions(start, o1)
    assert {p.shard_id for p in parts} <= set(start)
    # and eventually converges on everything available
    final = o1
    for _ in range(20):
        final = reader.latestOffset()
    assert sum(final.values()) == 10
