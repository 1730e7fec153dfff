"""transformWithStateInPandas: typed value state across microbatches.

Round 4: `high_watermarks` dispatches — transformWithStateInPandas when the
worker-side protobuf package exists, else the applyInPandasWithState twin
with the identical output schema and fold — so this test RUNS in every
environment (no skip) and exercises the strongest available API.
"""

from datetime import datetime, timedelta, timezone

from messikinesisprovider_spark.log import MessiLog
from messikinesisprovider_spark.streaming import consume
from messikinesisprovider_spark.streaming.tws import (
    HAVE_TWS,
    high_watermarks,
    high_watermarks_apws,
    rocksdb_conf,
)

T0 = datetime(2026, 9, 1, tzinfo=timezone.utc)


def test_high_watermark_across_batches(spark, tmp_path):
    if HAVE_TWS:
        rocksdb_conf(spark)  # transformWithState requires the RocksDB provider
    log = MessiLog(spark, str(tmp_path / "twslog"), n_shards=1)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")

    def drain():
        q = (
            high_watermarks(consume.stream_log(spark, log.root))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out_dir)

    log.publish("t", [{"partition_key": "u1", "external_id": "a"},
                      {"partition_key": "u1", "external_id": "b"}], now=T0)
    first = drain().collect()
    assert {(r["partition_key"], r["high_water_seq"], r["n_seen"], r["n_regressions"]) for r in first} == {
        ("u1", 1, 2, 0)
    }

    # next batch: state persisted — high-water advances, counts accumulate
    log.publish("t", [{"partition_key": "u1", "external_id": "c"}], now=T0 + timedelta(seconds=1))
    rows = drain().collect()
    latest = max(
        (r for r in rows if r["partition_key"] == "u1"), key=lambda r: r["n_seen"]
    )
    assert (latest["high_water_seq"], latest["n_seen"], latest["n_regressions"]) == (2, 3, 0)


def test_apws_twin_directly(spark, tmp_path):
    """The fallback engine path, exercised explicitly (on protobuf-equipped
    boxes the dispatch test above covers transformWithState instead)."""
    log = MessiLog(spark, str(tmp_path / "twslog2"), n_shards=1)
    out_dir, ckpt = str(tmp_path / "out2"), str(tmp_path / "ck2")
    log.publish("t", [{"partition_key": "u7", "external_id": "x"},
                      {"partition_key": "u7", "external_id": "y"},
                      {"partition_key": "u8", "external_id": "z"}], now=T0)
    q = (
        high_watermarks_apws(consume.stream_log(spark, log.root))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["partition_key"]: (r["high_water_seq"], r["n_seen"], r["n_regressions"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got["u7"] == (1, 2, 0) and got["u8"][1] == 1
