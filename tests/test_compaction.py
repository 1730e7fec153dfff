"""Log compaction: file-count reduction with bit-identical content, valid
cursors, and an unbroken streaming consumer across the rewrite."""

import tempfile
from datetime import datetime, timedelta, timezone

from messikinesisprovider_spark.cursor import MessiCursor
from messikinesisprovider_spark.log import MessiLog


def _mk_log(spark, n_batches=12):
    root = tempfile.mkdtemp(prefix="compact_") + "/log"
    log = MessiLog(spark, root, n_shards=2)
    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    for b in range(n_batches):
        log.publish(
            "t",
            [
                {"partition_key": f"k{i}", "external_id": f"e{b}-{i}"}
                for i in range(4)
            ],
            now=t0 + timedelta(seconds=b),
        )
    return log


def test_compact_reduces_files_and_preserves_content(spark):
    log = _mk_log(spark)
    before = {
        s: [(r["sequence_number"], r["external_id"], r["ulid"]) for r in
            log.receive_all(MessiCursor.oldest(), s)]
        for s in log.shards()
    }
    stats = log.compact(max_records_per_file=1000)
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] <= len(log.shards())
    after = {
        s: [(r["sequence_number"], r["external_id"], r["ulid"]) for r in
            log.receive_all(MessiCursor.oldest(), s)]
        for s in log.shards()
    }
    assert after == before
    assert stats["rows"] == sum(len(v) for v in before.values())


def test_checkpointed_cursor_survives_compaction(spark):
    log = _mk_log(spark)
    shard = log.shards()[0]
    msgs = log.receive_all(MessiCursor.oldest(), shard)
    mid = msgs[len(msgs) // 2]
    cursor = log.cursor_after(mid)
    ckpt = cursor.checkpoint()  # what a consumer would have durably stored
    expected_tail = [r["external_id"] for r in msgs if r["sequence_number"] > mid["sequence_number"]]

    log.compact()

    restored = MessiCursor.from_checkpoint(ckpt)
    tail = [r["external_id"] for r in log.receive_all(restored, shard)]
    assert tail == expected_tail


def test_streaming_consumer_continues_across_compaction(spark):
    import tempfile as _tf

    from pyspark.sql import functions as F

    log = _mk_log(spark, n_batches=6)
    from messikinesisprovider_spark.sources.messilog_source import MessiLogDataSource

    spark.dataSource.register(MessiLogDataSource)
    out = _tf.mkdtemp(prefix="compact_out_") + "/sink"
    ckpt = _tf.mkdtemp(prefix="compact_ckpt_")

    # The built-in file stream source tracks FILE NAMES, which compaction
    # rewrites — it would replay all history. The engine's own messilog
    # source checkpoints (shard, sequence) offsets, which compaction
    # preserves; this test pins that contract.
    def drain():
        q = (
            spark.readStream.format("messilog")
            .option("path", log.root)
            .load()
            .select("external_id")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert spark.read.parquet(out).count() == 24

    log.compact()
    log.publish(
        "t",
        [{"partition_key": f"k{i}", "external_id": f"post-{i}"} for i in range(4)],
        now=datetime(2026, 1, 2, tzinfo=timezone.utc),
    )
    drain()
    rows = [r["external_id"] for r in spark.read.parquet(out).collect()]
    # exactly the 4 new messages, no replay of compacted history
    assert len(rows) == 28
    assert {r for r in rows if r.startswith("post-")} == {f"post-{i}" for i in range(4)}
