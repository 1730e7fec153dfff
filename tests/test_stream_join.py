"""Stream-stream join: two MessiLogs joined on key within an event-time bound."""

from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from messikinesisprovider_spark.log import MessiLog
from messikinesisprovider_spark.streaming import consume

T0 = datetime(2026, 5, 1, 10, 0, tzinfo=timezone.utc)


def test_stream_stream_interval_join(spark, tmp_path):
    clicks = MessiLog(spark, str(tmp_path / "clicks"), n_shards=1)
    buys = MessiLog(spark, str(tmp_path / "buys"), n_shards=1)
    for i in range(4):
        clicks.publish(
            "c",
            [{"partition_key": "u1", "external_id": f"c{i}", "ts": T0 + timedelta(minutes=10 * i)}],
            now=T0,
        )
    # purchases 5 minutes after clicks 1 and 3; one orphan far away
    for i in [1, 3]:
        buys.publish(
            "b",
            [{"partition_key": "u1", "external_id": f"b{i}", "ts": T0 + timedelta(minutes=10 * i + 5)}],
            now=T0,
        )
    buys.publish("b", [{"partition_key": "u1", "external_id": "orphan",
                        "ts": T0 + timedelta(hours=6)}], now=T0)

    cs = (
        consume.stream_log(spark, clicks.root)
        .select(F.col("external_id").alias("click_id"), F.col("partition_key").alias("user"),
                F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "1 hour")
    )
    bs = (
        consume.stream_log(spark, buys.root)
        .select(F.col("external_id").alias("buy_id"), F.col("partition_key").alias("buser"),
                F.col("ts").alias("buy_ts"))
        .withWatermark("buy_ts", "1 hour")
    )
    joined = cs.join(
        bs,
        (F.col("user") == F.col("buser"))
        & (F.col("buy_ts") > F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 6 MINUTE")),
    ).select("click_id", "buy_id")
    q = (
        joined.writeStream.format("memory").queryName("ssj")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).outputMode("append").start()
    )
    q.awaitTermination()
    got = sorted((r["click_id"], r["buy_id"]) for r in spark.table("ssj").collect())
    assert got == [("c1", "b1"), ("c3", "b3")]
