"""applyInPandasWithState: state persists across microbatches."""

import uuid
from datetime import datetime, timedelta, timezone

from messikinesisprovider_spark.log import MessiLog
from messikinesisprovider_spark.streaming import consume
from messikinesisprovider_spark.streaming.stateful import running_user_counters

T0 = datetime(2026, 4, 1, tzinfo=timezone.utc)


def test_counters_accumulate_across_batches(spark, tmp_path):
    log = MessiLog(spark, str(tmp_path / "stlog"), n_shards=1)
    ckpt = str(tmp_path / "ck")
    out_dir = str(tmp_path / "out")

    def drain():
        counters = running_user_counters(consume.stream_log(spark, log.root))
        q = (
            counters.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out_dir)

    log.publish("t", [{"partition_key": "u1", "external_id": "a"},
                      {"partition_key": "u1", "external_id": "b"},
                      {"partition_key": "u2", "external_id": "c"}], now=T0)
    first = drain()
    got = {r["partition_key"]: (r["n_messages"], r["batch_messages"]) for r in first.collect()}
    assert got == {"u1": (2, 2), "u2": (1, 1)}

    # second batch: state survives the restart via the checkpointed state store
    log.publish("t", [{"partition_key": "u1", "external_id": "d"}], now=T0 + timedelta(seconds=1))
    rows = drain().collect()
    u1_rows = sorted(
        [(r["n_messages"], r["batch_messages"]) for r in rows if r["partition_key"] == "u1"]
    )
    # first emission (2,2) plus cumulative second emission (3,1)
    assert u1_rows == [(2, 2), (3, 1)]
    # high-water sequence advanced monotonically
    u1_maxseq = max(r["max_sequence"] for r in rows if r["partition_key"] == "u1")
    assert u1_maxseq == 3  # 4 messages on one shard → seqs 0..3


class _StubState:
    """GroupState stand-in for exercising the update body directly."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self.removed = True
        self._value = None

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_timed_out_key_is_evicted_not_resurrected():
    from messikinesisprovider_spark.streaming.stateful import _counter_update

    state = _StubState(value=(7, 42), timed_out=True)
    out = list(_counter_update(("u1",), iter(()), state, idle_timeout_ms=1000))
    assert out == []  # nothing emitted for an evicted key
    assert state.removed  # state dropped...
    assert state.timeout_set is None  # ...and the timeout NOT re-armed


def test_update_accumulates_and_rearms_timeout():
    import pandas as pd

    from messikinesisprovider_spark.streaming.stateful import _counter_update

    state = _StubState(value=(3, 5))
    batch = pd.DataFrame({"sequence_number": [6, 9]})
    [o] = list(_counter_update(("u1",), iter([batch]), state, idle_timeout_ms=500))
    assert state.get == (5, 9)
    assert state.timeout_set == 500
    assert o.iloc[0]["n_messages"] == 5 and o.iloc[0]["batch_messages"] == 2
