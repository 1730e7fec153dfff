"""Distributed bulk ingestion: routing, monotonic ULIDs, dense sequences."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from messikinesisprovider_spark.cursor import MessiCursor
from messikinesisprovider_spark.log import MessiLog, PublishError, ingest_dataframe, shard_for_key
from messikinesisprovider_spark.ulid import Ulid

T0 = datetime(2026, 8, 1, tzinfo=timezone.utc)


def test_bulk_ingest_end_to_end(spark, tmp_path):
    log = MessiLog(spark, str(tmp_path / "bulk"), n_shards=4)
    src = spark.range(5000).select(
        F.concat(F.lit("user-"), (F.col("id") % 137).cast("string")).alias("partition_key"),
        F.col("id").cast("string").alias("external_id"),
    )
    ingest_dataframe(log, src, "bulk-topic", now=T0)
    all_rows = log.read(MessiCursor.oldest()).collect()
    assert len(all_rows) == 5000

    by_shard = {}
    for r in all_rows:
        by_shard.setdefault(r["shard_id"], []).append(r)
    assert set(by_shard) == {"0", "1", "2", "3"}
    for sid, rows in by_shard.items():
        # JVM routing matches the Python client's routing exactly
        assert all(shard_for_key(r["partition_key"], 4) == sid for r in rows)
        rows.sort(key=lambda r: r["sequence_number"])
        # dense sequences from 0
        assert [r["sequence_number"] for r in rows] == list(range(len(rows)))
        # broker order == ULID order within the batch
        ulids = [r["ulid"] for r in rows]
        assert ulids == sorted(ulids)
        # ULIDs parse and carry the ingest timestamp
        assert all(Ulid.parse(u).timestamp_ms == int(T0.timestamp() * 1000) for u in ulids)


def test_bulk_ingest_appends_after_client_publish(spark, tmp_path):
    log = MessiLog(spark, str(tmp_path / "mix"), n_shards=1)
    log.publish("t", [{"partition_key": "pk", "external_id": "first"}], now=T0)
    src = spark.createDataFrame([("pk", "second"), ("pk", "third")], ["partition_key", "external_id"])
    ingest_dataframe(log, src, "t", now=T0)
    rows = log.receive_all(MessiCursor.oldest(), "0")
    assert [r["sequence_number"] for r in rows] == [0, 1, 2]
    assert rows[0]["external_id"] == "first"


def test_bulk_ingest_rejects_missing_partition_key(spark, tmp_path):
    log = MessiLog(spark, str(tmp_path / "bad"), n_shards=1)
    with pytest.raises(PublishError):
        ingest_dataframe(log, spark.createDataFrame([("x",)], ["external_id"]), "t")
    with pytest.raises(PublishError):
        ingest_dataframe(
            log, spark.createDataFrame([(None, "x")], "partition_key string, external_id string"), "t"
        )


def test_staged_ingest_stage_col(spark, tmp_path):
    """stage_col writes stage=N/shard_id=X dirs whose union is the input,
    with LOG_SCHEMA intact inside each stage (round-8 staged backfills)."""
    import os

    log = MessiLog(spark, str(tmp_path / "staged"), n_shards=4)
    src = spark.range(900).select(
        F.concat(F.lit("u-"), (F.col("id") % 53).cast("string")).alias("partition_key"),
        F.col("id").cast("string").alias("external_id"),
        ((F.col("id") % 3) + 1).cast("int").alias("stage"),
    )
    ingest_dataframe(log, src, "t", now=T0, stage_col="stage")
    for s in (1, 2, 3):
        assert os.path.isdir(os.path.join(log.root, f"stage={s}"))
    df = spark.read.parquet(log.root)
    assert df.count() == 900
    # per-stage counts match the modulus split; external_ids round-trip
    got = {r["stage"]: r["n"] for r in df.groupBy("stage").agg(F.count("*").alias("n")).collect()}
    assert got == {1: 300, 2: 300, 3: 300}
    ids = sorted(int(r["external_id"]) for r in df.select("external_id").collect())
    assert ids == list(range(900))
    # sequences stay dense per shard across the whole staged batch
    seqs = {
        r["shard_id"]: r["mx"]
        for r in df.groupBy("shard_id")
        .agg(F.max("sequence_number").alias("mx"), F.count("*").alias("n"))
        .withColumn("ok", F.col("mx") == F.col("n") - 1)
        .collect()
    }
    per_shard = {r["shard_id"]: r["n"] for r in df.groupBy("shard_id").agg(F.count("*").alias("n")).collect()}
    for sid, mx in seqs.items():
        assert mx == per_shard[sid] - 1
