"""MessiClient facade — the reference's API surface over the Spark engine.

A user of the reference navigates client → topic → shard → producer /
streaming-consumer (KinesisMessiClient.java:18-41, KinesisMessiTopic.java:
21-80, KinesisMessiShard.java:23-69). This facade preserves that navigation
and its contracts (shards shared across topics, per-shard consumers, cursor
factories, unsupported ops raising) so reference code ports mechanically;
underneath it is MessiLog + the streaming layer.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import SparkSession

from .cursor import ULID_TIME_TOLERANCE, MessiCursor
from .log import MessiLog, UnsupportedOperation
from .ulid import Ulid


class MessiClient:
    """Handle over one log + checkpoint folder (KinesisMessiClient.java:18-41)."""

    def __init__(self, spark: SparkSession, root: str, n_shards: int = 1):
        self._log = MessiLog(spark, root, n_shards=n_shards)
        self._closed = False

    def topic_of(self, name: str) -> "MessiTopic":
        self._check_open()
        return MessiTopic(self._log, name)

    def last_message(self, topic: str, shard_id: str):
        raise UnsupportedOperation("lastMessage is unsupported (KinesisMessiClient.java:49-51)")

    def metadata_client(self):
        raise UnsupportedOperation("metadata is unsupported (KinesisMessiClient.java:74-77)")

    def close(self) -> None:
        self._closed = True

    def is_closed(self) -> bool:
        return self._closed

    def _check_open(self):
        if self._closed:
            raise RuntimeError("client is closed")


class MessiTopic:
    """Logical name multiplexed within one physical log
    (KinesisMessiTopic.java:21-66): `shards()` ignores the topic."""

    def __init__(self, log: MessiLog, name: str):
        self._log = log
        self.name = name

    def shards(self) -> list[str]:
        return self._log.shards()

    def first_shard(self) -> str:
        return self.shards()[0]

    def shard_of(self, shard_id: str) -> "MessiShard":
        return MessiShard(self._log, self.name, shard_id)

    def producer(self) -> "MessiProducer":
        return MessiProducer(self._log, self.name)


class MessiProducer:
    def __init__(self, log: MessiLog, topic: str):
        self._log = log
        self._topic = topic
        self._pool = None

    def publish(self, *messages: dict, now: datetime | None = None) -> list[dict]:
        return self._log.publish(self._topic, list(messages), now=now)

    def publish_async(self, *messages: dict, now: datetime | None = None):
        """S3: publish on a worker thread, returning a Future — the twin of
        the reference's CompletableFuture wrapper
        (KinesisMessiProducer.java:165-173). Single-threaded executor so
        async publishes from one producer stay in call order, preserving the
        per-producer monotonic-ULID contract (O1)."""
        from concurrent.futures import ThreadPoolExecutor

        if self._pool is None:
            self._pool = ThreadPoolExecutor(max_workers=1)
        return self._pool.submit(self.publish, *messages, now=now)


class MessiShard:
    """Per-shard cursor factory + consumer entry (KinesisMessiShard.java:23-163)."""

    def __init__(self, log: MessiLog, topic: str, shard_id: str):
        self._log = log
        self._topic = topic
        self.shard_id = shard_id

    # -- cursor factories ---------------------------------------------------
    def cursor_at_last_message(self) -> MessiCursor:
        return MessiCursor.now()

    def cursor_at_trim_horizon(self) -> MessiCursor:
        return MessiCursor.oldest()

    def cursor_at(self, msg: dict) -> MessiCursor:
        return self._log.cursor_at(msg)

    def cursor_after(self, msg: dict) -> MessiCursor:
        return self._log.cursor_after(msg)

    def cursor_of_checkpoint(self, payload: str) -> MessiCursor:
        return MessiCursor.from_checkpoint(payload)

    def cursor_at_time(self, t: datetime) -> MessiCursor:
        return MessiCursor.at_time(t)

    def cursor_at_ulid(self, u: Ulid, inclusive: bool = True) -> MessiCursor:
        return MessiCursor.at_ulid(u, inclusive=inclusive)

    def cursor_at_external_id(
        self,
        external_id: str,
        near_time: datetime,
        tolerance: timedelta = ULID_TIME_TOLERANCE,
        inclusive: bool = True,
    ) -> MessiCursor:
        return MessiCursor.at_external_id(external_id, near_time, tolerance, inclusive)

    def streaming_consumer(self, cursor: MessiCursor) -> "MessiStreamingConsumer":
        return MessiStreamingConsumer(self._log, self._topic, self.shard_id, cursor)


# Internal bound on an async receive's wait for late arrivals — the
# reference hard-codes 5 minutes (KinesisMessiStreamingConsumer.java:162-173).
ASYNC_RECEIVE_TIMEOUT = timedelta(minutes=5)


class MessiStreamingConsumer:
    """Pull-based consumer over the batch-replay scan — receive() semantics of
    KinesisMessiStreamingConsumer.java:54-159 (None on exhaustion/timeout),
    receive_async() (:162-173, 5-minute internal timeout) and seek()
    re-positioning (:181-187)."""

    def __init__(self, log: MessiLog, topic: str, shard_id: str, cursor: MessiCursor):
        self._log = log
        self._topic = topic
        self._shard_id = shard_id
        self._cursor = cursor
        self._buffer: list[dict] | None = None
        self._pos = 0
        self._last: dict | None = None
        self._async_ex = None

    def _fill(self) -> None:
        if self._buffer is None:
            rows = self._log.receive_all(self._cursor, self._shard_id, topic=self._topic)
            self._buffer = [r.asDict(recursive=True) for r in rows]
            self._pos = 0

    def receive(self) -> dict | None:
        """Next message in broker order, or None when drained (the batch
        analog of the reference's timeout-null)."""
        self._fill()
        if self._pos >= len(self._buffer):
            return None
        msg = self._buffer[self._pos]
        self._pos += 1
        self._last = msg
        return msg

    def _refresh_tail(self) -> None:
        """Drop a drained buffer and advance the cursor past the last
        delivered message, so the next fill re-scans the log for late
        arrivals without replaying anything."""
        if self._buffer is not None and self._pos >= len(self._buffer):
            if self._last is not None:
                self._cursor = self._log.cursor_after(self._last)
            self._buffer = None

    def receive_async(
        self, timeout: timedelta | None = None, poll_s: float = 0.05
    ) -> "Future[dict | None]":
        """Async receive facade (KinesisMessiStreamingConsumer.java:162-173):
        a Future resolving to the next message, or None when nothing arrives
        within the internal bound (the reference hard-codes 5 minutes;
        `timeout` overrides it, mainly for tests).

        Unlike sync receive() — which returns None at the current tail —
        the async form keeps re-scanning the log for late arrivals until
        the bound. Futures are served by a single worker thread, so
        multiple outstanding receives resolve in broker order."""
        import time as _time
        from concurrent.futures import ThreadPoolExecutor

        if self._async_ex is None:
            self._async_ex = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="messi-receive-async"
            )
        bound_s = (timeout or ASYNC_RECEIVE_TIMEOUT).total_seconds()

        def run() -> dict | None:
            deadline = _time.monotonic() + bound_s
            while True:
                msg = self.receive()
                if msg is not None:
                    return msg
                if _time.monotonic() >= deadline:
                    return None  # the reference's timeout-null
                self._refresh_tail()
                _time.sleep(poll_s)

        return self._async_ex.submit(run)

    def seek(self, t: datetime) -> None:
        """Clear the buffer and re-position at a timestamp
        (KinesisStreamingBuffer.java:295-324 semantics)."""
        self._cursor = MessiCursor.at_time(t)
        self._buffer = None
        self._last = None

    def current_position(self):
        raise UnsupportedOperation(
            "currentPosition is unsupported (TODO in the reference, "
            "KinesisMessiStreamingConsumer.java:176-178)"
        )
