"""Custom Python DataSource for MessiLog (Spark 4 `pyspark.sql.datasource`).

The reference's consumer stack is a polling source with cursor-resolved start
positions and per-shard ordered delivery (KinesisStreamingBuffer.java). The
Spark-native equivalent of that *source contract* is a DataSource V2
implementation: offsets are `{shard_id: next_sequence_number}` dicts — the
same shape as the reference's checkpoint JSON ({shardId, sequenceNumber},
KinesisMessiCursor.java:59-68) — and each microbatch plans one InputPartition
per shard, preserving per-shard order within the batch.

Registration:  spark.dataSource.register(MessiLogDataSource)
Batch:         spark.read.format("messilog").option("path", root).load()
Streaming:     spark.readStream.format("messilog").option("path", root)
                 .option("startingposition", "TRIM_HORIZON" | "LATEST").load()

This source exists alongside the plain parquet path (streaming/consume.py):
the parquet file-stream is the production fast path (vectorized scans); this
DataSource demonstrates the broker-shaped contract — explicit offsets,
per-shard admission (`maxrecordspershard`, the analog of the reference's
GetRecords LIMIT=1000), and offset commit — with the simulator-style log as
backing store.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import pyarrow.dataset as pa_ds
import pyarrow.parquet as pq
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from ..schema import LOG_SCHEMA

_DEFAULT_MAX_PER_SHARD = 1000  # reference GetRecords LIMIT (KinesisStreamingBuffer.java:41)


def _shard_dirs(root: str) -> dict[str, str]:
    out = {}
    if os.path.isdir(root):
        for name in sorted(os.listdir(root)):
            if name.startswith("shard_id="):
                out[name.split("=", 1)[1]] = os.path.join(root, name)
    return out


def _max_seq(shard_dir: str) -> int:
    """Highest sequence_number currently in a shard directory (-1 if empty)."""
    hi = -1
    for f in os.listdir(shard_dir):
        if f.endswith(".parquet"):
            try:
                t = pq.read_table(os.path.join(shard_dir, f), columns=["sequence_number"])
                if t.num_rows:
                    hi = max(hi, max(t.column(0).to_pylist()))
            except OSError:
                continue
    return hi


@dataclass
class ShardSlice(InputPartition):
    shard_id: str
    shard_dir: str
    start_seq: int  # inclusive
    end_seq: int  # exclusive


def _read_slice(part: ShardSlice):
    """Arrow-native scan of one shard's [start_seq, end_seq) slice, in
    sequence order (per-shard FIFO, the O2 contract). Yields RecordBatches —
    zero per-row Python cost; the filter pushes into the parquet scan."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    dataset = pa_ds.dataset(part.shard_dir, format="parquet")
    flt = (pa_ds.field("sequence_number") >= part.start_seq) & (
        pa_ds.field("sequence_number") < part.end_seq
    )
    cols = [f.name for f in LOG_SCHEMA.fields if f.name != "shard_id"]
    table = dataset.to_table(filter=flt, columns=cols)
    table = table.append_column("shard_id", pa.array([part.shard_id] * table.num_rows))
    table = table.select([f.name for f in LOG_SCHEMA.fields]).sort_by("sequence_number")
    yield from table.cast(to_arrow_schema(LOG_SCHEMA)).to_batches()


class MessiLogBatchReader(DataSourceReader):
    def __init__(self, options):
        self.root = options["path"]

    def partitions(self):
        return [
            ShardSlice(sid, d, 0, _max_seq(d) + 1) for sid, d in _shard_dirs(self.root).items()
        ]

    def read(self, partition: ShardSlice):
        return _read_slice(partition)


class MessiLogStreamReader(DataSourceStreamReader):
    """Microbatch reader with per-shard sequence offsets.

    Offset json: {"0": 12, "1": 7} = next sequence to deliver per shard —
    exactly an AT_PROVIDER_SEQUENCE cursor per shard (P4).

    Restart safety: a fresh reader instance cannot see the engine's committed
    checkpoint before the first `partitions(start, end)` call, so a blind
    `latestOffset()` under `maxrecordspershard` admission could plan an end
    behind the committed start. Two guards make this harmless:

    * ``_start_hwm`` records the highest start the engine has *asked us to
      read from*; `latestOffset()` never plans below it, and `partitions()`
      clamps a regressed start back up to it — so a transiently regressed
      offset in the engine's log can never re-deliver rows (no duplicates).
    * Optional ``consumergroup`` option: `commit(end)` durably records the
      committed offsets at ``<root>/_consumers/<group>.json`` (atomic
      rename), and a fresh reader baselines `latestOffset()` from that file.
      This is the analog of the reference's broker-side progress tracking
      (FileBasedProgressTracker debounce / KCL lease table): one active query
      per consumer group. Without it, a restarted availableNow drain with
      admission enabled may need extra drains to advance past the committed
      position (a continuously-triggered stream self-heals either way).
    """

    def __init__(self, options):
        self.root = options["path"]
        self.max_per_shard = int(options.get("maxrecordspershard", _DEFAULT_MAX_PER_SHARD))
        self.starting = options.get("startingposition", "TRIM_HORIZON").upper()
        self.group = options.get("consumergroup")
        self._start_hwm: dict[str, int] = {}
        self._last_planned: dict[str, int] | None = None

    # -- durable consumer-group offsets ------------------------------------
    def _group_path(self) -> str:
        return os.path.join(self.root, "_consumers", f"{self.group}.json")

    def _load_group_offsets(self) -> dict:
        if not self.group:
            return {}
        try:
            with open(self._group_path()) as f:
                return {k: int(v) for k, v in json.load(f).items()}
        except (OSError, ValueError):
            return {}

    def _save_group_offsets(self, offsets: dict) -> None:
        path = self._group_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(offsets, f)
        os.replace(tmp, path)  # atomic on POSIX

    def _bump_hwm(self, offsets: dict) -> None:
        for sid, seq in offsets.items():
            if seq > self._start_hwm.get(sid, 0):
                self._start_hwm[sid] = seq

    def initialOffset(self) -> dict:
        shards = _shard_dirs(self.root)
        if self.starting == "LATEST":  # NOW cursor (P1)
            return {sid: _max_seq(d) + 1 for sid, d in shards.items()}
        return {sid: 0 for sid in shards}  # OLDEST_RETAINED (P2)

    def latestOffset(self) -> dict:
        # Admission control: advance at most max_per_shard per microbatch —
        # the microbatch analog of the bounded prefetch buffer (F1). The
        # planning baseline is the max of everything we know: in-memory
        # progress, starts the engine has planned, and (if configured) the
        # consumer group's durable committed offsets.
        current = dict(self.initialOffset())
        for known in (self._load_group_offsets(), self._start_hwm, self._last_planned or {}):
            for sid, seq in known.items():
                if seq > current.get(sid, 0):
                    current[sid] = seq
        out = {}
        for sid, d in _shard_dirs(self.root).items():
            avail = _max_seq(d) + 1
            cur = current.get(sid, 0)
            out[sid] = min(avail, cur + self.max_per_shard)
        self._last_planned = out
        return out

    def partitions(self, start: dict, end: dict):
        # Clamp a regressed start up to the highest start already planned in
        # this instance (see class docstring) BEFORE recording the new hwm.
        clamped = {sid: max(seq, self._start_hwm.get(sid, 0)) for sid, seq in start.items()}
        self._bump_hwm(start)
        shards = _shard_dirs(self.root)
        parts = []
        for sid, end_seq in end.items():
            start_seq = clamped.get(sid, 0)
            if end_seq > start_seq and sid in shards:
                parts.append(ShardSlice(sid, shards[sid], start_seq, end_seq))
        return parts or [ShardSlice("__empty__", self.root, 0, 0)]

    def read(self, partition: ShardSlice):
        if partition.shard_id == "__empty__":
            return iter(())
        return _read_slice(partition)

    def commit(self, end: dict) -> None:
        # The engine's checkpoint log is the source of truth; the optional
        # consumer-group file lets a *fresh* reader instance baseline its
        # planning at the committed position (the reference's
        # FileBasedProgressTracker role, debounce superseded by microbatch
        # cadence). Never move the durable offsets backwards.
        self._bump_hwm(end)
        if self.group:
            merged = self._load_group_offsets()
            for sid, seq in end.items():
                if seq > merged.get(sid, 0):
                    merged[sid] = seq
            self._save_group_offsets(merged)


class MessiLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "messilog"

    def schema(self):
        return LOG_SCHEMA

    def reader(self, schema):
        return MessiLogBatchReader(self.options)

    def streamReader(self, schema):
        return MessiLogStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(MessiLogDataSource)
