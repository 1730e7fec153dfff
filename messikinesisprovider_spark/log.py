"""MessiLog — the batch-replay core of the engine (SURVEY.md §7.1 M2).

A sharded, append-only message log on partitioned Parquet with the
reference's publish / cursor / checkpoint semantics:

- publish: partition-key routing, required-key validation, monotonic ULID
  assignment, provenance stamping (KinesisMessiProducer.java:47-162,
  KinesisStreamingBuffer.java:178-207).
- read(cursor): the six cursor types resolved into partition-pruned
  DataFrame scans (the batch twin of the shard-iterator switch at
  KinesisStreamingBuffer.java:247-281).
- cursor_at / cursor_after / checkpoint round-trip
  (KinesisMessiShard.java:86-137, KinesisMessiCursor.java:59-68).

Layout: `root/shard_id=<k>/part-*.parquet`, one directory partition per
shard — a shard maps 1:1 to a Spark input partition and `shard_id=` pruning
means any per-shard cursor scan touches exactly one directory. Sequence
numbers are dense per shard; `arrival_ts` is broker time (AT_TIMESTAMP
pushdown), the ULID prefix is client time.

Position resolution (finding the one row an AT_ULID / AT_EXTERNAL_ID cursor
denotes) is a driver-side point lookup over the pruned scan — the same role
as the reference's getShardIterator round-trip — and never materializes data
rows beyond that single match.
"""

from __future__ import annotations

import hashlib
import json
import os
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from .cursor import CursorError, CursorType, MessiCursor
from .operators.relational import events_tbl
from .registry import register
from .schema import LOG_SCHEMA, format_sequence
from .ulid import MonotonicUlidGenerator, Ulid


class PublishError(ValueError):
    pass


class UnsupportedOperation(RuntimeError):
    """Contract parity with the reference's unsupported surface
    (KinesisMessiClient.java:49-51,74-77)."""


def _utc(t: datetime) -> datetime:
    return t if t.tzinfo is not None else t.replace(tzinfo=timezone.utc)


def _naive(t: datetime) -> datetime:
    """Aware → naive UTC (Spark timestamps are naive in a UTC session)."""
    return t.astimezone(timezone.utc).replace(tzinfo=None) if t.tzinfo else t


def shard_for_key(partition_key: str, n_shards: int) -> str:
    """Deterministic md5-based routing (stable across processes/languages)."""
    h = int.from_bytes(hashlib.md5(partition_key.encode()).digest()[:8], "big")
    return str(h % n_shards)


class MessiLog:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_shards: int = 1,
        technology: str = "MessiLog",
    ):
        self.spark = spark
        self.root = root
        self.n_shards = n_shards
        self.technology = technology
        self._ulid_gens: dict[str, MonotonicUlidGenerator] = {}
        self._next_seq: dict[str, int] | None = None
        self._recover_interrupted_swap(root)
        os.makedirs(root, exist_ok=True)

    @staticmethod
    def _recover_interrupted_swap(root: str) -> None:
        """Heal a crash between the two renames of compact/retention_trim.

        The swap is rename(root → .pre-X) then rename(tmp → root): a crash
        in between leaves no live root but a complete moved-aside copy.
        Restore that copy — both ops are idempotent and simply re-run.
        Sequence floors are persisted BEFORE the swap (see retention_trim),
        so no monotone-sequence state is lost on either recovery path.
        Stale rewrite outputs (.trimming/.compacting) are discarded: they
        are not authoritative until the swap completes."""
        import shutil

        base = root.rstrip("/")
        root_live = os.path.isdir(root) and any(
            name.startswith("shard_id=") for name in os.listdir(root)
        )
        for suffix in (".pre-trim", ".pre-compact"):
            old = base + suffix
            if not os.path.isdir(old):
                continue
            if root_live:
                shutil.rmtree(old)  # swap completed; old copy is leftover
            else:
                if os.path.isdir(root):
                    shutil.rmtree(root)  # empty placeholder dir
                os.rename(old, root)
                root_live = True
        for suffix in (".trimming", ".compacting"):
            tmp = base + suffix
            if os.path.isdir(tmp):
                shutil.rmtree(tmp)

    # ------------------------------------------------------------------ admin
    def shards(self) -> list[str]:
        return [str(i) for i in range(self.n_shards)]

    def exists(self) -> bool:
        return any(
            name.startswith("shard_id=") for name in os.listdir(self.root)
        ) if os.path.isdir(self.root) else False

    def last_message(self, shard_id: str):
        raise UnsupportedOperation("lastMessage is unsupported (KinesisMessiClient.java:49-51)")

    def metadata_client(self):
        raise UnsupportedOperation("metadata is unsupported (KinesisMessiClient.java:74-77)")

    # ---------------------------------------------------------------- publish
    def publish(
        self,
        topic: str,
        messages: list[dict],
        now: datetime | None = None,
    ) -> list[dict]:
        """Validate, route, stamp identity+provenance, append one batch.

        One call == one atomic append (the analog of a single PutRecords
        batch). Returns the fully-stamped rows in publish order.
        """
        if not messages:
            return []
        arrival = _utc(now or datetime.now(timezone.utc))
        arrival_ms = int(arrival.timestamp() * 1000)
        seqs = self._sequence_state()
        stamped = []
        for m in messages:
            pk = m.get("partition_key")
            if not pk:
                # KinesisMessiProducer.java:64-66
                raise PublishError("the provider requires a partitionKey")
            shard = shard_for_key(pk, self.n_shards)
            gen = self._ulid_gens.setdefault(shard, MonotonicUlidGenerator(int(shard)))
            if m.get("ulid_msb") is not None and m.get("ulid_lsb") is not None:
                u = Ulid.from_parts(m["ulid_msb"], m["ulid_lsb"])
            else:
                u = gen.next(arrival_ms)
            seq = seqs[shard]
            seqs[shard] += 1
            provider = Row(
                technology=self.technology,
                published_ts=arrival_ms,
                shard_id=shard,
                sequence_number=format_sequence(seq),
            )
            first = m.get("first_provider")
            if first is not None and not isinstance(first, Row):
                first = Row(**first)
            stamped.append(
                dict(
                    ulid_msb=u.msb,
                    ulid_lsb=u.lsb,
                    ulid=u.text(),
                    partition_key=pk,
                    topic=topic,
                    external_id=m.get("external_id"),
                    ordering_group=m.get("ordering_group"),
                    ordering_seq=m.get("ordering_seq"),
                    ts=_naive(_utc(m["ts"])) if m.get("ts") else None,
                    data=m.get("data"),
                    attributes=m.get("attributes"),
                    # first_provider is preserved if already set, else stamped
                    # with this hop (KinesisStreamingBuffer.java:186-193)
                    first_provider=first or provider,
                    provider=provider,
                    source_client_id=m.get("source_client_id"),
                    shard_id=shard,
                    sequence_number=seq,
                    arrival_ts=_naive(arrival),
                )
            )
        df = self.spark.createDataFrame([Row(**r) for r in stamped], schema=LOG_SCHEMA)
        df.write.mode("append").partitionBy("shard_id").parquet(self.root)
        return stamped

    def _seq_floor_path(self) -> str:
        return self.root.rstrip("/") + ".seq_floor.json"

    def _seq_floors(self) -> dict[str, int]:
        """Per-shard next-sequence floors persisted by retention_trim: a
        fully trimmed shard has no rows to derive its next sequence from,
        and re-issuing trimmed numbers would break the monotone-sequence
        contract every cursor relies on."""
        try:
            with open(self._seq_floor_path()) as f:
                return {k: int(v) for k, v in json.load(f).items()}
        except FileNotFoundError:
            return {}

    def _sequence_state(self) -> dict[str, int]:
        if self._next_seq is None:
            self._next_seq = {s: 0 for s in self.shards()}
            if self.exists():
                for shard, mx in self._footer_max_sequences().items():
                    self._next_seq[shard] = mx + 1
            for shard, floor in self._seq_floors().items():
                if floor > self._next_seq.get(shard, 0):
                    self._next_seq[shard] = floor
        return self._next_seq

    def _footer_max_sequences(self) -> dict[str, int]:
        """Per-shard max sequence from parquet FOOTER statistics — a pure
        metadata walk (O(#files) footer reads, no Spark job, no data scan).
        Replaces the former full-log groupBy(shard).max() on first publish;
        at warehouse scale this is the difference between an instant driver
        loop and a cluster job over the whole log."""
        import glob as _glob

        import pyarrow.parquet as pq

        out: dict[str, int] = {}
        for path in _glob.glob(os.path.join(self.root, "shard_id=*", "*.parquet")):
            shard = os.path.basename(os.path.dirname(path)).split("=", 1)[1]
            md = pq.ParquetFile(path).metadata
            # match the FULL dotted path: the flattened parquet schema also
            # contains provider.sequence_number (a string leaf with the same
            # leaf name) — leaf-name matching would read the wrong column
            idx = next(
                i for i in range(md.num_columns)
                if md.schema.column(i).path == "sequence_number"
            )
            mx: int | None = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is not None and st.has_min_max:
                    mx = st.max if mx is None else max(mx, st.max)
                else:  # stats disabled for this file: read the one column
                    col = pq.read_table(path, columns=["sequence_number"])
                    vals = col["sequence_number"].to_pylist()
                    if vals:
                        mx = max(vals) if mx is None else max(mx, max(vals))
                    break
            if mx is not None and mx > out.get(shard, -1):
                out[shard] = mx
        return out

    # ------------------------------------------------------------------- read
    def _raw(self) -> DataFrame:
        return self.spark.read.schema(LOG_SCHEMA).parquet(self.root)

    def read(
        self,
        cursor: MessiCursor,
        shard_id: str | None = None,
        topic: str | None = None,
    ) -> DataFrame:
        """Resolve a cursor into a partition-pruned scan (P1-P6).

        `shard_id` scopes per-shard cursor types the way the reference's
        per-shard consumer does; `topic` applies the multiplex filter
        (KinesisMessiTopic.java:61-66).
        """
        df = self._raw()
        if shard_id is not None:
            df = df.filter(F.col("shard_id") == shard_id)  # directory pruning
        t = cursor.type
        if t is CursorType.OLDEST_RETAINED:
            out = df
        elif t is CursorType.NOW:
            # batch replay of LATEST = nothing already in the log
            out = df.filter(F.lit(False))
        elif t is CursorType.AT_PROVIDER_TIME:
            out = df.filter(F.col("arrival_ts") >= F.lit(_naive(cursor.timestamp)))
        elif t is CursorType.AT_PROVIDER_SEQUENCE:
            if cursor.shard_id is not None:
                df = self._raw().filter(F.col("shard_id") == cursor.shard_id)
            cmp = F.col("sequence_number") >= cursor.sequence_number if cursor.inclusive else (
                F.col("sequence_number") > cursor.sequence_number
            )
            out = df.filter(cmp)
        elif t is CursorType.AT_ULID:
            # Pushdown: arrival within ±60 s of the ULID's embedded time
            # (KinesisStreamingBuffer.java:271-275); residual: ULID compare
            # (KinesisMessiStreamingConsumer.java:81-104). ULID text compare
            # == numeric compare (Crockford base32 is order-preserving).
            u = cursor.ulid
            lo = datetime.fromtimestamp(u.timestamp_ms / 1000, tz=timezone.utc) - cursor.tolerance
            pushed = df.filter(F.col("arrival_ts") >= F.lit(_naive(lo)))
            cmp = F.col("ulid") >= u.text() if cursor.inclusive else F.col("ulid") > u.text()
            out = pushed.filter(cmp)
        elif t is CursorType.AT_EXTERNAL_ID:
            out = self._read_external_id(df, cursor)
        else:  # pragma: no cover
            raise CursorError(f"unknown cursor type {t}")
        if topic is not None:
            out = out.filter(F.col("topic") == topic)
        return out

    def _read_external_id(self, df: DataFrame, cursor: MessiCursor) -> DataFrame:
        """AT_EXTERNAL_ID with fallback replay.

        Pushdown to [t-tol, t+tol]; if the key is found, deliver from its
        sequence (± inclusive); if not, replay the lookahead window from
        t-tol onward (KinesisMessiStreamingConsumer.java:106-148).
        """
        lo = _naive(cursor.timestamp - cursor.tolerance)
        hi = _naive(cursor.timestamp + cursor.tolerance)
        match = (
            df.filter(
                (F.col("arrival_ts") >= F.lit(lo))
                & (F.col("arrival_ts") <= F.lit(hi))
                & (F.col("external_id") == cursor.external_id)
            )
            .select("shard_id", "sequence_number")
            .orderBy("sequence_number")
            .limit(1)
            .collect()  # point lookup == iterator resolution, not a data scan
        )
        if match:
            seq = match[0]["sequence_number"]
            scoped = df.filter(F.col("shard_id") == match[0]["shard_id"])
            cmp = F.col("sequence_number") >= seq if cursor.inclusive else (
                F.col("sequence_number") > seq
            )
            return scoped.filter(cmp)
        # fallback replay from the lower tolerance bound
        return df.filter(F.col("arrival_ts") >= F.lit(lo))

    # ------------------------------------------------- cursors & checkpoints
    def cursor_at(self, msg: Row | dict) -> MessiCursor:
        m = msg.asDict() if isinstance(msg, Row) else msg
        self._validate_provider(m)
        return MessiCursor.at_sequence(m["shard_id"], int(m["sequence_number"]), inclusive=True)

    def cursor_after(self, msg: Row | dict) -> MessiCursor:
        m = msg.asDict() if isinstance(msg, Row) else msg
        self._validate_provider(m)
        return MessiCursor.at_sequence(m["shard_id"], int(m["sequence_number"]), inclusive=False)

    @staticmethod
    def _validate_provider(m: dict) -> None:
        # KinesisMessiShard.java:86-110 validates provider fields
        if m.get("shard_id") is None or m.get("sequence_number") is None:
            raise CursorError("message lacks provider shard/sequence metadata")

    def seek(self, t: datetime) -> MessiCursor:
        """Live reposition == a fresh AT_PROVIDER_TIME cursor
        (KinesisMessiStreamingConsumer.java:181-187)."""
        return MessiCursor.at_time(t)

    # ------------------------------------------------------------ consumption
    def receive_all(self, cursor: MessiCursor, shard_id: str, topic: str | None = None) -> list[Row]:
        """Ordered per-shard delivery (TCK helper): sequence order == the
        broker order the reference's consumer delivers in."""
        return (
            self.read(cursor, shard_id=shard_id, topic=topic)
            .orderBy("sequence_number")
            .collect()
        )

    # ----------------------------------------------------------- maintenance
    def compact(self, max_records_per_file: int = 500_000) -> dict:
        """Rewrite the log with few, sequence-sorted files per shard.

        Every publish() appends new parquet files, so a long-lived log decays
        into thousands of tiny files per shard — the classic streaming-log
        small-file problem; at scale, scan cost becomes file-open cost.
        Compaction rewrites each shard directory as sequence-sorted files of
        bounded size. Rows, sequence numbers, and ULIDs are bit-identical, so
        every outstanding checkpoint/cursor (which address by sequence
        number, never by file) stays valid across the rewrite — verified by
        the mid-stream compaction test. Note this holds for the messilog
        DataSource and MessiCursor consumers, which address by (shard,
        sequence); a plain `readStream.parquet` file-source consumer tracks
        file names and WILL replay after compaction — use the messilog
        source for long-lived subscriptions. Offline maintenance op: run it
        like any table-maintenance job, not concurrently with a publish.

        Returns {"files_before": n, "files_after": m, "rows": r}.
        """
        import glob as _glob
        import shutil

        def _count_files(root: str) -> int:
            return len(_glob.glob(os.path.join(root, "shard_id=*", "*.parquet")))

        files_before = _count_files(self.root)
        df = self._raw()
        tmp = self.root.rstrip("/") + ".compacting"
        (
            df.repartition("shard_id")
            .sortWithinPartitions("shard_id", "sequence_number")
            .write.option("maxRecordsPerFile", max_records_per_file)
            .mode("overwrite")
            .partitionBy("shard_id")
            .parquet(tmp)
        )
        rows = self.spark.read.schema(LOG_SCHEMA).parquet(tmp).count()
        old = self.root.rstrip("/") + ".pre-compact"
        os.rename(self.root, old)
        os.rename(tmp, self.root)
        shutil.rmtree(old)
        return {
            "files_before": files_before,
            "files_after": _count_files(self.root),
            "rows": rows,
        }

    def retention_trim(self, older_than: datetime) -> dict:
        """Drop messages that arrived before `older_than` — the broker's
        retention-period enforcement (Kinesis trims at 24 h-365 d; the
        reference's OLDEST_RETAINED cursor names exactly this boundary).

        Contract after a trim:
        - sequence numbers are NEVER renumbered, so any cursor/checkpoint
          addressing the retained region replays exactly;
        - a cursor positioned below the new head behaves like Kinesis'
          expired-sequence iterator: reads resume from the oldest retained
          record (the `>= sequence` scan filter does this naturally);
        - next-sequence floors are persisted per shard, so a FULLY trimmed
          shard continues its sequence where it left off instead of
          re-issuing trimmed numbers (sidecar read by `_sequence_state`).

        Offline maintenance op, like `compact`: not concurrent with
        publishes. Returns {"rows_before", "rows_after", "trimmed"}.
        """
        import shutil

        cutoff = _naive(older_than)
        df = self._raw()
        rows_before = df.count()
        # floors BEFORE the rewrite: max+1 over the full (untrimmed) log,
        # from parquet footer statistics (metadata walk, no Spark job —
        # same path as _sequence_state)
        floors = self._seq_floors()
        for shard, mx in self._footer_max_sequences().items():
            floors[shard] = max(floors.get(shard, 0), mx + 1)
        kept = df.filter(F.col("arrival_ts") >= F.lit(cutoff))
        tmp = self.root.rstrip("/") + ".trimming"
        (
            kept.repartition("shard_id")
            .sortWithinPartitions("shard_id", "sequence_number")
            .write.mode("overwrite")
            .partitionBy("shard_id")
            .parquet(tmp)
        )
        rows_after = self.spark.read.schema(LOG_SCHEMA).parquet(tmp).count()
        # Persist floors BEFORE the swap: floors only ever raise, so an
        # early write is safe even if the swap never happens — whereas a
        # crash between the renames with floors unwritten would let a fully
        # trimmed shard re-issue trimmed sequence numbers (the sidecar is a
        # sibling file of the root, untouched by the renames; the
        # interrupted swap itself is healed by _recover_interrupted_swap).
        with open(self._seq_floor_path(), "w") as f:
            json.dump(floors, f)
        old = self.root.rstrip("/") + ".pre-trim"
        os.rename(self.root, old)
        os.rename(tmp, self.root)
        shutil.rmtree(old)
        self._next_seq = None  # re-derive (now floor-aware) on next publish
        return {
            "rows_before": rows_before,
            "rows_after": rows_after,
            "trimmed": rows_before - rows_after,
        }


# ---------------------------------------------------------------------------
# Oracle-checkable cursor-semantics queries over the driver's `events` table
# (events ↔ flattened MessiMessage: event_id↔externalId, ts↔timestamp,
# user_id↔partitionKey — SURVEY.md §1.3). These make P3/P5/P6 semantics part
# of the verified surface even though MessiLog itself is tested via the TCK.
# ---------------------------------------------------------------------------


@register(
    "cursor_scan_from_time",
    oracle="""
    SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value
    FROM events
    WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 3 DAY
    """,
    description="AT_PROVIDER_TIME cursor as a batch scan: everything at/after t",
    tags=("cursor", "messi"),
)
def cursor_scan_from_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_tbl(spark, sf_dir)
    m = ev.agg(F.max("ts").alias("m"))
    return (
        ev.crossJoin(F.broadcast(m))
        .filter(F.col("ts") >= F.col("m") - F.expr("INTERVAL 3 DAY"))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


@register(
    "cursor_scan_external_id",
    oracle="""
    WITH target AS (SELECT ts, event_id FROM events WHERE event_id = 500)
    SELECT e.event_id, e.ts::TIMESTAMP AS ts, e.event_type
    FROM events e, target t
    WHERE e.ts > t.ts OR (e.ts = t.ts AND e.event_id >= t.event_id)
    """,
    description="AT_EXTERNAL_ID (inclusive) cursor: deliver from the matched business key onward",
    tags=("cursor", "messi"),
)
def cursor_scan_external_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_tbl(spark, sf_dir)
    target = ev.filter(F.col("event_id") == 500).select(
        F.col("ts").alias("t_ts"), F.col("event_id").alias("t_id")
    )
    return (
        ev.crossJoin(F.broadcast(target))
        .filter(
            (F.col("ts") > F.col("t_ts"))
            | ((F.col("ts") == F.col("t_ts")) & (F.col("event_id") >= F.col("t_id")))
        )
        .select("event_id", "ts", "event_type")
    )


@register(
    "cursor_fallback_replay",
    oracle="""
    WITH anchor AS (SELECT ts FROM events WHERE event_id = 700)
    SELECT e.event_id, e.ts::TIMESTAMP AS ts, e.event_type
    FROM events e, anchor a
    WHERE e.ts >= a.ts - INTERVAL 2 HOUR
      AND e.ts <= a.ts + INTERVAL 2 HOUR
      AND NOT EXISTS (
        SELECT 1 FROM events x, anchor a2
        WHERE x.event_id = -1
          AND x.ts >= a2.ts - INTERVAL 2 HOUR AND x.ts <= a2.ts + INTERVAL 2 HOUR
      )
    """,
    description="AT_EXTERNAL_ID fallback replay: key absent in [t-tol, t+tol] → deliver the window",
    tags=("cursor", "messi"),
)
def cursor_fallback_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Semantics of KinesisMessiStreamingConsumer.java:141-148: the consumer
    # looked for external id -1 near the anchor time; it does not exist, so
    # the buffered lookahead window is replayed.
    ev = events_tbl(spark, sf_dir)
    anchor = ev.filter(F.col("event_id") == 700).select(F.col("ts").alias("a_ts"))
    windowed = (
        ev.crossJoin(F.broadcast(anchor))
        .filter(
            (F.col("ts") >= F.col("a_ts") - F.expr("INTERVAL 2 HOUR"))
            & (F.col("ts") <= F.col("a_ts") + F.expr("INTERVAL 2 HOUR"))
        )
    )
    missing = windowed.filter(F.col("event_id") == -1).limit(1)
    # LEFT ANTI against the (empty) match set == "deliver window iff key absent"
    return windowed.join(missing.select("a_ts"), on="a_ts", how="left_anti").select(
        "event_id", "ts", "event_type"
    )


def validate_ordering_groups(log: "MessiLog") -> DataFrame:
    """Violations of the envelope's ordering contract.

    MessiMessage carries `ordering {group, sequenceNumber}`
    (MessiClientTck.java:73-76): within one group, sequence numbers are
    expected to be non-decreasing along broker order. Returns one row per
    violation: a message whose ordering_seq went backwards relative to its
    predecessor in the same (shard, topic, group).
    """
    from pyspark.sql.window import Window as W

    df = log._raw().filter(F.col("ordering_group").isNotNull())
    w = W.partitionBy("shard_id", "topic", "ordering_group").orderBy("sequence_number")
    with_prev = df.select(
        "shard_id",
        "topic",
        "ordering_group",
        "sequence_number",
        "ordering_seq",
        F.lag("ordering_seq").over(w).alias("prev_seq"),
    )
    return with_prev.filter(
        F.col("prev_seq").isNotNull() & (F.col("ordering_seq") < F.col("prev_seq"))
    )


def ingest_dataframe(
    log: "MessiLog",
    df: DataFrame,
    topic: str,
    now: datetime | None = None,
    stage_col: str | None = None,
) -> None:
    """Distributed bulk publish: the scale path next to `MessiLog.publish`.

    `publish` is the client API (driver-side, one batch, exact reference
    semantics); ingest_dataframe is what a backfill/migration of 100 TB uses:

    1. shard routing as a JVM expression (same md5 math as shard_for_key);
    2. repartition by shard — each output shard is written by its own tasks;
    3. per-partition monotonic ULIDs from an Arrow stage (the distributed
       answer to the reference's single-process AtomicReference,
       KinesisMessiProducer.java:32-33 / SURVEY §7.4 item 1): strictly
       increasing within each writer, globally time-sortable via the shared
       millisecond prefix, unique via per-(partition, pid) random tails;
    4. dense per-shard sequence numbers via one window over the shard
       (broker order = ULID order for a single bulk batch);
    5. one distributed parquet write, partitioned by shard.

    Input df columns: partition_key (required), external_id, ordering_group,
    ordering_seq, ts, data, attributes, source_client_id (all optional).

    `stage_col` (staged backfill): name of an input column to ADDITIONALLY
    partition the output by (dirs `<stage_col>=N/shard_id=X/`). One Spark
    job stamps and writes every stage; the caller promotes stage dirs into
    a live log root with O(1) renames between drains — the multi-pass
    watermark-audit topologies use this to stage N passes with one job
    instead of N (round-7 verdict item 4). Sequence numbers remain dense
    per shard across the whole batch in ULID order, not per stage.
    """
    from pyspark.sql import types as T
    from pyspark.sql.window import Window as W

    arrival = _utc(now or datetime.now(timezone.utc))
    arrival_ms = int(arrival.timestamp() * 1000)
    n_shards = log.n_shards
    technology = log.technology

    if "partition_key" not in df.columns:
        raise PublishError("the provider requires a partitionKey")

    # md5-hex first 16 chars == first 8 bytes big-endian == shard_for_key math
    shard = F.expr(
        f"CAST(pmod(CAST(conv(substring(md5(partition_key), 1, 16), 16, 10) AS DECIMAL(38,0)), {n_shards}) AS STRING)"
    )
    optional = {
        "external_id": "CAST(NULL AS STRING)",
        "ordering_group": "CAST(NULL AS STRING)",
        "ordering_seq": "CAST(NULL AS BIGINT)",
        "ts": "CAST(NULL AS TIMESTAMP)",
        "data": "CAST(NULL AS MAP<STRING, BINARY>)",
        "attributes": "CAST(NULL AS MAP<STRING, STRING>)",
        "source_client_id": "CAST(NULL AS STRING)",
    }
    base = df
    for col, default in optional.items():
        if col not in base.columns:
            base = base.withColumn(col, F.expr(default))
    if base.filter(F.col("partition_key").isNull() | (F.col("partition_key") == "")).limit(1).count():
        raise PublishError("the provider requires a partitionKey")
    routed = base.withColumn("shard_id", shard).repartition(
        max(n_shards, df.sparkSession.sparkContext.defaultParallelism), "shard_id"
    )

    def assign_ulids(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        gen = MonotonicUlidGenerator(partition_id=pid)
        for pdf in batches:
            ulids = [gen.next(arrival_ms) for _ in range(len(pdf))]
            pdf = pdf.assign(
                ulid_msb=[u.msb for u in ulids],
                ulid_lsb=[u.lsb for u in ulids],
                ulid=[u.text() for u in ulids],
            )
            yield pdf

    with_ulids_schema = T.StructType(
        list(routed.schema.fields)
        + [
            T.StructField("ulid_msb", T.LongType(), False),
            T.StructField("ulid_lsb", T.LongType(), False),
            T.StructField("ulid", T.StringType(), False),
        ]
    )
    with_ulids = routed.mapInPandas(assign_ulids, schema=with_ulids_schema)

    # dense per-shard sequences, offset past whatever the shard already holds
    existing = log._sequence_state()
    offsets = F.create_map(
        *[x for s, v in existing.items() for x in (F.lit(s), F.lit(v))]
    )
    w = W.partitionBy("shard_id").orderBy("ulid")
    seq = F.row_number().over(w) - 1 + F.coalesce(offsets[F.col("shard_id")], F.lit(0))
    provider = F.struct(
        F.lit(technology).alias("technology"),
        F.lit(arrival_ms).alias("published_ts"),
        F.col("shard_id").alias("shard_id"),
        F.lpad(F.col("sequence_number").cast("string"), 12, "0").alias("sequence_number"),
    )
    out = (
        with_ulids.withColumn("sequence_number", seq.cast("long"))
        .withColumn("topic", F.lit(topic))
        .withColumn("arrival_ts", F.lit(arrival.replace(tzinfo=None)))
        .withColumn("provider", provider)
        .withColumn("first_provider", provider)
        .select(
            *[f.name for f in LOG_SCHEMA.fields],
            *([stage_col] if stage_col else []),
        )
    )
    part_cols = ([stage_col] if stage_col else []) + ["shard_id"]
    out.write.mode("append").partitionBy(*part_cols).parquet(log.root)
    log._next_seq = None  # force re-read of sequence state
