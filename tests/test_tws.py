"""transformWithStateInPandas: typed value state across microbatches."""

from datetime import datetime, timedelta, timezone

import pytest

from messikinesisprovider_spark.log import MessiLog
from messikinesisprovider_spark.streaming import consume
from messikinesisprovider_spark.streaming.tws import high_watermarks, rocksdb_conf

T0 = datetime(2026, 9, 1, tzinfo=timezone.utc)


def test_high_watermark_across_batches(spark, tmp_path):
    from messikinesisprovider_spark.streaming.tws import HAVE_TWS

    if not HAVE_TWS:
        pytest.skip("transformWithState needs the protobuf package on workers")
    rocksdb_conf(spark)
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
