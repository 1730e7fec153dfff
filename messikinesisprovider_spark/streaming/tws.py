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
on workers (`HAVE_TWS` below). Without it, use streaming/stateful.py's
applyInPandasWithState operators — same semantics, older API.
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
        for pdf in rows:
            ordered = pdf.sort_values("sequence_number")
            for seq in ordered["sequence_number"]:
                seq = int(seq)
                if hw is not None and seq <= hw:
                    reg += 1  # replayed/regressed delivery observed
                hw = seq if hw is None else max(hw, seq)
                n += 1
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


def high_watermarks(df: DataFrame) -> DataFrame:
    """Per-key high-water sequence + regression counter across microbatches."""
    return (
        df.groupBy("partition_key")
        .transformWithStateInPandas(
            statefulProcessor=HighWaterMarkProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="None",
        )
    )
