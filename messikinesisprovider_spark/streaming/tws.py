"""transformWithStateInPandas operators (Spark 4 stateful processor API).

The successor to applyInPandasWithState: typed state variables (value/list/
map state), timers, and explicit lifecycle (init/handleInputRows/close) —
the closest Spark analog to the reference's consumer-side state machines
(prefetch + lookahead buffers, KinesisMessiStreamingConsumer.java:63-148).

`HighWaterMarkProcessor` tracks, per partition key, the max sequence number
and a monotonicity-violation count — the streaming form of the ordering
contract check (`log.validate_ordering_groups` is its batch twin). Requires
the RocksDB state store provider (set by `rocksdb_conf`).

ENVIRONMENT GATE: Spark's transformWithState protocol serializes state
requests with protobuf, so the `protobuf` Python package must be installed
on workers (`HAVE_TWS` below). Round 4: `high_watermarks` now DISPATCHES —
transformWithStateInPandas when protobuf is present, otherwise an
applyInPandasWithState twin (`high_watermarks_apws`) with identical output
schema and per-key fold, so the operator (and its test) runs everywhere
and upgrades itself where the newer API is available. The protocol itself
cannot be vendored offline: the pickled StatefulProcessor round-trips
through Spark's generated StateMessage_pb2 modules on the WORKER, which
hard-import google.protobuf's C-accelerated descriptor machinery.
"""

from __future__ import annotations

try:
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAVE_TWS = True
except ImportError:  # pragma: no cover
    HAVE_TWS = False

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import StatefulProcessor, StatefulProcessorHandle

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("partition_key", T.StringType(), False),
        T.StructField("high_water_seq", T.LongType(), True),
        T.StructField("n_seen", T.LongType(), False),
        T.StructField("n_regressions", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("hw", T.LongType(), True),
        T.StructField("n", T.LongType(), False),
        T.StructField("reg", T.LongType(), False),
    ]
)


class HighWaterMarkProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("hwm", _STATE_SCHEMA)

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues) -> Iterator[pd.DataFrame]:
        hw, n, reg = self._state.get() if self._state.exists() else (None, 0, 0)
        hw, n, reg = _hwm_fold(hw, n, reg, rows)
        self._state.update((hw, n, reg))
        yield pd.DataFrame(
            [{"partition_key": key[0], "high_water_seq": hw, "n_seen": n, "n_regressions": reg}]
        )

    def close(self) -> None:
        pass


def rocksdb_conf(spark) -> None:
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )


def _hwm_fold(hw, n, reg, pdfs: Iterator[pd.DataFrame]):
    """The shared per-key fold both engine paths run: advance the high-water
    sequence, count rows, count replayed/regressed deliveries."""
    for pdf in pdfs:
        ordered = pdf.sort_values("sequence_number")
        for seq in ordered["sequence_number"]:
            seq = int(seq)
            if hw is not None and seq <= hw:
                reg += 1
            hw = seq if hw is None else max(hw, seq)
            n += 1
    return hw, n, reg


def high_watermarks_apws(df: DataFrame) -> DataFrame:
    """applyInPandasWithState twin of `high_watermarks`: identical output
    schema and fold, the older state API (no protobuf dependency)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        hw, n, reg = state.get if state.exists else (None, 0, 0)
        hw, n, reg = _hwm_fold(hw, n, reg, pdfs)
        state.update((hw, n, reg))
        yield pd.DataFrame(
            [{"partition_key": key[0], "high_water_seq": hw, "n_seen": n, "n_regressions": reg}]
        )

    return df.groupBy("partition_key").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def high_watermarks(df: DataFrame) -> DataFrame:
    """Per-key high-water sequence + regression counter across microbatches.

    Dispatches to transformWithStateInPandas when the worker-side protobuf
    dependency is available, else to the applyInPandasWithState twin —
    same schema, same fold, same checkpoint-compatible append output."""
    if not HAVE_TWS:
        return high_watermarks_apws(df)
    return (
        df.groupBy("partition_key")
        .transformWithStateInPandas(
            statefulProcessor=HighWaterMarkProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="None",
        )
    )
