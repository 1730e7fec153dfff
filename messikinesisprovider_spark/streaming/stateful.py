"""Custom stateful streaming operators (applyInPandasWithState).

The reference keeps consumer-side state (prefetch buffers, lookahead replay
buffers — KinesisMessiStreamingConsumer.java:63-148); the Spark-native way to
express arbitrary keyed streaming state is applyInPandasWithState: per-key
state object + Arrow-batched updates per microbatch + timeout-driven
eviction.

`running_user_counters` is the engine's canonical stateful shape: per-key
monotone counters that survive across microbatches (exactly what a
billing/quota/sequence-validation consumer of the log needs). State is a
single tuple per key → state-store size is O(distinct keys), independent of
stream length; a processing-time timeout evicts idle keys so 100 TB/day of
traffic with a bounded active-key set stays bounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

COUNTER_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("partition_key", T.StringType(), False),
        T.StructField("n_messages", T.LongType(), False),
        T.StructField("max_sequence", T.LongType(), True),
        T.StructField("batch_messages", T.LongType(), False),
    ]
)

COUNTER_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_messages", T.LongType(), False),
        T.StructField("max_sequence", T.LongType(), True),
    ]
)


def _counter_update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    idle_timeout_ms: int,
) -> Iterator[pd.DataFrame]:
    """Per-key update body (module-level so the timeout branch is unit-
    testable against a stub state without a streaming query)."""
    if state.hasTimedOut:
        # idle-key eviction: drop the state and emit nothing — updating or
        # re-arming the timeout here would resurrect the key forever
        state.remove()
        return
    (pk,) = key
    n, max_seq = state.get if state.exists else (0, None)
    batch_n = 0
    for pdf in pdfs:
        batch_n += len(pdf)
        if len(pdf):
            batch_max = int(pdf["sequence_number"].max())
            max_seq = batch_max if max_seq is None else max(max_seq, batch_max)
    n += batch_n
    state.update((n, max_seq))
    if idle_timeout_ms:
        state.setTimeoutDuration(idle_timeout_ms)
    yield pd.DataFrame(
        [{"partition_key": pk, "n_messages": n, "max_sequence": max_seq, "batch_messages": batch_n}]
    )


def running_user_counters(df: DataFrame, idle_timeout_ms: int = 0) -> DataFrame:
    """Per-partition-key running counters across microbatches.

    Emits one row per key per microbatch with the cumulative count, the
    high-water sequence number (per-shard ordering evidence, O2), and this
    batch's increment. Operator output mode is "append" (each emitted row is
    final for that batch) so the result composes with append-only sinks like
    parquet.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        yield from _counter_update(key, pdfs, state, idle_timeout_ms)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if idle_timeout_ms else GroupStateTimeout.NoTimeout
    )
    return (
        df.groupBy("partition_key")
        .applyInPandasWithState(
            update,
            outputStructType=COUNTER_OUTPUT_SCHEMA,
            stateStructType=COUNTER_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
