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


def test_stream_stream_left_outer_join_emits_nulls(spark, tmp_path):
    """Unmatched left rows must surface with NULL right side once the
    watermark passes their join window — the attribution-with-misses shape.
    availableNow finalizes state only on a subsequent run (watermark
    advances at batch end), so the drain runs twice on one checkpoint;
    that restart is the production nightly-batch pattern for outer joins.
    """
    clicks = MessiLog(spark, str(tmp_path / "oc"), n_shards=1)
    buys = MessiLog(spark, str(tmp_path / "ob"), n_shards=1)
    for i in range(3):
        clicks.publish(
            "c",
            [{"partition_key": "u1", "external_id": f"c{i}", "ts": T0 + timedelta(minutes=10 * i)}],
            now=T0,
        )
    # only click 1 gets a purchase; late sentinels on BOTH streams advance
    # the join watermark (it is the min over all inputs) past every real
    # click's window. The sentinels' own windows stay open, so they remain
    # in state and never reach the sink.
    buys.publish("b", [{"partition_key": "u1", "external_id": "b1",
                        "ts": T0 + timedelta(minutes=15)}], now=T0)
    buys.publish("b", [{"partition_key": "u1", "external_id": "sentinel",
                        "ts": T0 + timedelta(hours=12)}], now=T0)
    clicks.publish("c", [{"partition_key": "u2", "external_id": "csentinel",
                          "ts": T0 + timedelta(hours=12)}], now=T0)

    cs = (
        consume.stream_log(spark, clicks.root)
        .select(F.col("external_id").alias("click_id"), F.col("partition_key").alias("user"),
                F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "10 minutes")
    )
    bs = (
        consume.stream_log(spark, buys.root)
        .select(F.col("external_id").alias("buy_id"), F.col("partition_key").alias("buser"),
                F.col("ts").alias("buy_ts"))
        .withWatermark("buy_ts", "10 minutes")
    )
    joined = cs.join(
        bs,
        (F.col("user") == F.col("buser"))
        & (F.col("buy_ts") > F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 6 MINUTE")),
        "left_outer",
    ).select("click_id", "buy_id")

    out_dir, ckpt = str(tmp_path / "oout"), str(tmp_path / "ock")
    for _ in range(3):  # drain + state-finalization passes
        q = (
            joined.writeStream.format("parquet").option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).outputMode("append").start()
        )
        q.awaitTermination()
    got = {(r["click_id"], r["buy_id"]) for r in spark.read.parquet(out_dir).collect()}
    assert got == {("c0", None), ("c1", "b1"), ("c2", None)}
