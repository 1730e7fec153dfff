"""Retention enforcement (MessiLog.retention_trim): the broker's
retention-period semantics — trimmed head, cursor repositioning, sequence
floors — the behaviors OLDEST_RETAINED names."""

from datetime import datetime, timedelta, timezone

from messikinesisprovider_spark.cursor import MessiCursor
from messikinesisprovider_spark.log import MessiLog

T0 = datetime(2026, 3, 1, 8, 0, tzinfo=timezone.utc)
T1 = T0 + timedelta(days=2)


def _publish_epoch(log, prefix, n, now):
    log.publish(
        "t",
        [
            {"partition_key": f"k{i}", "external_id": f"{prefix}{i}", "ts": now}
            for i in range(n)
        ],
        now=now,
    )


def _all_rows(log):
    out = []
    for shard in log.shards():
        out.extend(log.receive_all(MessiCursor.oldest(), shard))
    return out


def test_trim_drops_old_epoch_and_keeps_sequences(spark, tmp_path):
    log = MessiLog(spark, str(tmp_path / "log"), n_shards=2)
    _publish_epoch(log, "old", 6, T0)
    _publish_epoch(log, "new", 6, T1)
    before = {r["external_id"]: r for r in _all_rows(log)}

    stats = log.retention_trim(older_than=T1 - timedelta(hours=1))
    assert stats == {"rows_before": 12, "rows_after": 6, "trimmed": 6}

    rows = _all_rows(log)
    assert {r["external_id"] for r in rows} == {f"new{i}" for i in range(6)}
    # sequence numbers of retained rows are bit-identical (no renumbering)
    for r in rows:
        b = before[r["external_id"]]
        assert r["provider"]["sequence_number"] == b["provider"]["sequence_number"]


def test_cursor_below_head_reads_from_oldest_retained(spark, tmp_path):
    log = MessiLog(spark, str(tmp_path / "log"), n_shards=1)
    _publish_epoch(log, "old", 4, T0)
    _publish_epoch(log, "new", 4, T1)
    log.retention_trim(older_than=T1 - timedelta(hours=1))
    # sequence 0 was trimmed; reading from it resumes at the retained head,
    # matching Kinesis' expired-sequence iterator fallback
    shard = log.shards()[0]
    rows = log.receive_all(MessiCursor.at_sequence(shard, 0, inclusive=True), shard)
    assert {r["external_id"] for r in rows} == {f"new{i}" for i in range(4)}


def test_fully_trimmed_shard_never_reuses_sequences(spark, tmp_path):
    log = MessiLog(spark, str(tmp_path / "log"), n_shards=1)
    _publish_epoch(log, "old", 5, T0)
    old_max = max(
        int(r["provider"]["sequence_number"]) for r in _all_rows(log)
    )
    log.retention_trim(older_than=T1)  # trims EVERYTHING
    assert _all_rows(log) == []

    # a fresh handle (no in-memory state) must continue the sequence
    log2 = MessiLog(spark, str(tmp_path / "log"), n_shards=1)
    _publish_epoch(log2, "later", 2, T1)
    seqs = [int(r["provider"]["sequence_number"]) for r in _all_rows(log2)]
    assert min(seqs) == old_max + 1  # floor persisted across trim


def test_checkpoint_into_retained_region_replays_exactly(spark, tmp_path):
    log = MessiLog(spark, str(tmp_path / "log"), n_shards=1)
    _publish_epoch(log, "old", 3, T0)
    _publish_epoch(log, "new", 5, T1)
    shard = log.shards()[0]
    # consume through the first two retained messages, checkpoint there
    rows = log.receive_all(MessiCursor.oldest(), shard)
    newrows = [r for r in rows if r["external_id"].startswith("new")]
    ck_seq = int(newrows[1]["provider"]["sequence_number"])
    ck = MessiCursor.at_sequence(shard, ck_seq, inclusive=False).checkpoint()

    log.retention_trim(older_than=T1 - timedelta(hours=1))
    resumed = log.receive_all(MessiCursor.from_checkpoint(ck), shard)
    assert [r["external_id"] for r in resumed] == [
        r["external_id"] for r in newrows[2:]
    ]


def test_streaming_checkpoint_survives_retention_trim(spark, tmp_path):
    """A long-lived messilog subscription keeps its checkpoint valid across
    a retention trim: committed offsets address sequences, the trim never
    renumbers, and the post-trim drain delivers exactly the new records."""
    from messikinesisprovider_spark.sources import messilog_source

    messilog_source.register(spark)
    log = MessiLog(spark, str(tmp_path / "rlog"), n_shards=1)
    _publish_epoch(log, "old", 4, T0)

    ckpt, out = str(tmp_path / "rck"), str(tmp_path / "rout")

    def drain():
        q = (
            spark.readStream.format("messilog")
            .option("path", log.root)
            .option("startingposition", "TRIM_HORIZON")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return [r["external_id"] for r in spark.read.parquet(out).collect()]

    assert sorted(drain()) == [f"old{i}" for i in range(4)]

    log.retention_trim(older_than=T1 - timedelta(hours=1))  # drops the old epoch
    _publish_epoch(log, "new", 3, T1)

    got = drain()  # resumes from committed offsets over the rewritten log
    # exactly the new records appended: no replay of olds, no loss of news
    assert sorted(got) == sorted([f"old{i}" for i in range(4)] + [f"new{i}" for i in range(3)])


def test_interrupted_trim_swap_recovers_on_open(spark, tmp_path):
    """Crash between the two renames of retention_trim: root is gone, the
    .pre-trim copy holds the full log. Re-opening the log must restore it
    (and the pre-swap seq-floor write must survive), not silently start an
    empty log."""
    import os

    root = str(tmp_path / "log")
    log = MessiLog(spark, root, n_shards=1)
    _publish_epoch(log, "a", 4, T0)
    # trim everything: floors persist (written before the swap)
    log.retention_trim(older_than=T1)
    assert _all_rows(log) == []

    # simulate the crash window on a subsequent maintenance op
    os.rename(root, root + ".pre-trim")
    log2 = MessiLog(spark, root, n_shards=1)
    assert not os.path.exists(root + ".pre-trim")
    # the restored (fully trimmed) log still honors the sequence floor
    stamped = log2.publish(
        "t", [{"partition_key": "p", "external_id": "new"}], now=T1
    )
    assert stamped[0]["sequence_number"] >= 4
