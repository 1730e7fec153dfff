"""CDC upsert materializer: log stream → latest-state snapshot."""

from datetime import datetime, timedelta, timezone

from messikinesisprovider_spark.log import MessiLog
from messikinesisprovider_spark.streaming import consume
from messikinesisprovider_spark.streaming.materialize import upsert_snapshot

T0 = datetime(2026, 6, 1, tzinfo=timezone.utc)


def test_snapshot_keeps_latest_per_key(spark, tmp_path):
    log = MessiLog(spark, str(tmp_path / "log"), n_shards=1)
    snap = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ck")

    def drain():
        q = upsert_snapshot(consume.stream_log(spark, log.root), snap, ckpt)
        q.awaitTermination()
        return {
            r["external_id"]: dict(r["attributes"] or {})
            for r in spark.read.parquet(snap).collect()
        }

    log.publish("t", [
        {"partition_key": "p", "external_id": "k1", "attributes": {"v": "1"}},
        {"partition_key": "p", "external_id": "k2", "attributes": {"v": "2"}},
    ], now=T0)
    assert drain() == {"k1": {"v": "1"}, "k2": {"v": "2"}}

    # update k1, insert k3 — k2 untouched
    log.publish("t", [
        {"partition_key": "p", "external_id": "k1", "attributes": {"v": "10"}},
        {"partition_key": "p", "external_id": "k3", "attributes": {"v": "3"}},
    ], now=T0 + timedelta(seconds=1))
    assert drain() == {"k1": {"v": "10"}, "k2": {"v": "2"}, "k3": {"v": "3"}}

    # in-batch ordering: two updates to the same key in ONE batch → higher seq wins
    log.publish("t", [
        {"partition_key": "p", "external_id": "k2", "attributes": {"v": "20"}},
        {"partition_key": "p", "external_id": "k2", "attributes": {"v": "21"}},
    ], now=T0 + timedelta(seconds=2))
    assert drain()["k2"] == {"v": "21"}
