"""Executor-parallel Kinesis streaming source: one InputPartition per shard.

The `SimpleDataSourceStreamReader` in kinesis_source.py fetches every shard
in the driver-side planning process — fine for tens of shards (per-shard
throughput is API-capped), but the reference's model is consumers on
independent threads (KinesisMessiShard.java:27-29), and a wide stream wants
the fetching spread across executors. This reader is the scale-correct
shape: the driver plans OFFSETS only; each microbatch fans out one
`InputPartition` per shard, and the GetRecords paging, rate-limit backoff
(F4) and expired-iterator recovery (F5) all run inside executor Python
workers. Rows stream out of `read` as an iterator — never materialized
whole — so per-task memory is bounded by one GetRecords page (F1).

Offset design — sequence offsets with an executor-written sidecar
-----------------------------------------------------------------
Kinesis has no "tip sequence" API: the driver cannot know a batch's end
sequence without fetching the data itself (which is exactly the simple
reader). The partitioned reader therefore follows the shape of the public
qubole/kinesis-sql connector (its HDFSMetadataCommitter): each batch's
tasks read from their start sequence to the shard tip *at read time*, and
report the last sequence actually consumed into a metadata directory
(`option("metadatadir", ...)`, one file per (generation, shard), written
atomically). The driver's `latestOffset` folds the sidecar back in:

    offset_n = {"gen": n, "shards": {shard: max sidecar seq so far}}

Sequences only grow, so max-merging across generations is restart-safe: a
replayed batch re-reads from its recorded start and simply extends through
anything that arrived since — the rewritten batch output and the next
batch's start stay consistent (no loss, no duplicates with a
batch-idempotent sink). `commit` garbage-collects old generations.

Caveats (documented, inherent to executor-reported offsets): a speculative
task attempt that out-read the committed attempt can advance the sidecar
past the committed output (max-wins); the sidecar needs a filesystem all
tasks and the driver share (local[n], NFS, or fuse-mounted object store);
and the metadatadir is offset state — pair it 1:1 with one query's
checkpointLocation, never reused or shared.

Reader selection: ``format("kinesismessi")`` uses this reader when
`metadatadir` is set (or `option("reader", "partitioned")` is explicit);
otherwise it falls back to the driver-side simple reader, whose per-shard
consumers carry poll pacing across microbatches. Checkpoints are NOT
interchangeable between the two readers.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator

from pyspark.sql.datasource import DataSourceStreamReader, InputPartition

from .kinesis_source import _make_client, _starting_cursor, _to_row


class KinesisShardSlice(InputPartition):
    """One shard's read assignment: AFTER start_seq ("" = initial position)
    through the shard tip at read time, reporting the end to the sidecar."""

    def __init__(self, shard_id: str, start_seq: str, gen: int, options: dict):
        self.shard_id = shard_id
        self.start_seq = start_seq
        self.gen = gen
        self.options = options


def _sidecar_write(metadatadir: str, gen: int, shard_id: str, last_seq: str) -> None:
    gen_dir = os.path.join(metadatadir, f"gen={gen}")
    os.makedirs(gen_dir, exist_ok=True)
    final = os.path.join(gen_dir, f"shard-{shard_id}.json")
    tmp = final + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"shard_id": shard_id, "last_seq": last_seq}, f)
    os.replace(tmp, final)  # atomic publish


def _closed_write(metadatadir: str, shard_id: str, last_seq: str) -> None:
    """Durable end-of-shard marker (resharding): written when a task read a
    closed shard to its null NextShardIterator. Lives OUTSIDE the gen=N
    directories so commit()'s generation GC never erases it — a GC'd closure
    would resurrect the drained parent in latestOffset with an empty start
    and replay it from the initial position."""
    closed_dir = os.path.join(metadatadir, "closed")
    os.makedirs(closed_dir, exist_ok=True)
    final = os.path.join(closed_dir, f"shard-{shard_id}.json")
    if os.path.exists(final):
        return
    tmp = final + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"shard_id": shard_id, "last_seq": last_seq}, f)
    os.replace(tmp, final)


def _closed_scan(metadatadir: str) -> dict[str, str]:
    """shard_id -> final sequence for every shard read to closure."""
    closed_dir = os.path.join(metadatadir, "closed")
    out: dict[str, str] = {}
    if not os.path.isdir(closed_dir):
        return out
    for fname in os.listdir(closed_dir):
        if not fname.endswith(".json"):
            continue
        try:
            with open(os.path.join(closed_dir, fname)) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            continue
        if rec.get("shard_id"):
            out[rec["shard_id"]] = rec.get("last_seq", "")
    return out


def _sidecar_scan(metadatadir: str) -> tuple[int, dict[str, str]]:
    """(max generation seen, per-shard max last_seq across ALL generations).

    Max-merging is safe because sequences only grow; scanning every
    generation (rather than the newest) tolerates a crashed batch whose
    generation directory is missing some shards."""
    max_gen = 0
    seqs: dict[str, str] = {}
    if not os.path.isdir(metadatadir):
        return 0, {}
    for gen_name in os.listdir(metadatadir):
        if not gen_name.startswith("gen="):
            continue
        try:
            gen = int(gen_name[4:])
        except ValueError:
            continue
        max_gen = max(max_gen, gen)
        gen_dir = os.path.join(metadatadir, gen_name)
        for fname in os.listdir(gen_dir):
            if not fname.endswith(".json"):
                continue
            try:
                with open(os.path.join(gen_dir, fname)) as f:
                    rec = json.load(f)
            except (OSError, ValueError):
                continue  # torn write of a crashed task: ignore
            sid, seq = rec.get("shard_id"), rec.get("last_seq", "")
            if not sid or not seq:
                continue
            if not seqs.get(sid) or int(seq) > int(seqs[sid]):
                seqs[sid] = seq
    return max_gen, seqs


def _read_shard_slice(part: KinesisShardSlice) -> Iterator[tuple]:
    """Executor-side GetRecords loop: AFTER start_seq to the shard tip.

    Same recovery contract as KinesisShardConsumer, in-loop: rate limits
    retry on the reference's 3x-poll-interval ladder (F4,
    KinesisStreamingBuffer.java:133), expired iterators re-resolve from the
    last delivered sequence (F5) — no loss, no duplicates."""
    from .kinesis import cursor_to_iterator_args, decode_record, error_code

    client = _make_client(part.options)
    stream_name = part.options["streamname"]
    topic = part.options.get("topic", stream_name)
    fetch_limit = int(part.options.get("maxrecordspershard", 1000))
    poll_s = int(part.options.get("pollintervalms", 1000)) / 1000.0
    metadatadir = part.options["metadatadir"]

    def iterator_from(last_seq: str):
        if last_seq:
            args = {
                "ShardIteratorType": "AFTER_SEQUENCE_NUMBER",
                "StartingSequenceNumber": last_seq,
            }
        else:
            args = cursor_to_iterator_args(_starting_cursor(part.options))
        return client.get_shard_iterator(
            StreamName=stream_name, ShardId=part.shard_id, **args
        )["ShardIterator"]

    last_seq = part.start_seq
    it = iterator_from(last_seq)
    rate_limit_tries = 0
    shard_ended = False
    try:
        while True:
            try:
                resp = client.get_records(ShardIterator=it, Limit=fetch_limit)
            except Exception as e:  # noqa: BLE001
                code = error_code(e)
                if code == "ProvisionedThroughputExceededException":
                    rate_limit_tries += 1
                    if rate_limit_tries > 5:
                        raise
                    time.sleep(poll_s * 3)  # reference backoff ladder (F4)
                    continue
                if code == "ExpiredIteratorException":
                    it = iterator_from(last_seq)  # F5
                    continue
                raise
            rate_limit_tries = 0
            records = resp.get("Records", [])
            for rec in records:
                msg = decode_record(rec, part.shard_id)
                last_seq = rec["SequenceNumber"]
                yield _to_row(msg, topic)
            it = resp.get("NextShardIterator")
            if it is None:
                # null NextShardIterator: the shard was closed by a split/
                # merge and is now fully drained — record the durable closure
                # so latestOffset retires it and unlocks its children.
                shard_ended = True
                return
            if not records and not resp.get("MillisBehindLatest", 0):
                return  # the tip: batch ends here
    finally:
        # report the end of this slice — also when nothing was read, so the
        # sidecar stays a complete per-shard map for latestOffset
        _sidecar_write(metadatadir, part.gen, part.shard_id, last_seq)
        if shard_ended:
            _closed_write(metadatadir, part.shard_id, last_seq)


class KinesisPartitionedStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.options = dict(options)
        self.stream_name = self.options["streamname"]
        if "metadatadir" not in self.options:
            raise ValueError(
                "the partitioned kinesismessi reader needs option('metadatadir', "
                "...) — a directory shared by driver and executors where tasks "
                "report consumed sequences; or use option('reader', 'simple')"
            )
        # The sidecar is offset state: it must pair 1:1 with ONE query's
        # checkpointLocation. Reusing a metadatadir with a fresh checkpoint
        # (or sharing it between two queries) folds another run's consumed
        # sequences into latestOffset and skips their data.
        self.metadatadir = self.options["metadatadir"]
        self._client = None

    def client(self):
        if self._client is None:
            self._client = _make_client(self.options)
        return self._client

    def _eligible_shards(self, closed: dict[str, str]) -> list[str]:
        """Shard ids this batch may read, honoring resharding semantics:

        - a shard already read to closure (split/merge parent, durable
          `closed/` marker) is retired — its slice would only rewrite an
          empty sidecar entry forever;
        - a child shard is held back until EVERY parent still present in the
          listing is drained (parent-before-child, the per-key ordering
          contract). A parent absent from the listing was trimmed by
          retention — it cannot be read, so it does not block (the KCL
          behavior).
        """
        from .kinesis import list_shards  # paginated (HasMoreShards loop)

        shards = list_shards(self.client(), self.stream_name)
        present = {s["ShardId"] for s in shards}
        out = []
        for s in shards:
            sid = s["ShardId"]
            if sid in closed:
                continue
            parents = [
                p
                for p in (s.get("ParentShardId"), s.get("AdjacentParentShardId"))
                if p and p in present
            ]
            if any(p not in closed for p in parents):
                continue
            out.append(sid)
        return out

    def initialOffset(self) -> dict:
        return {
            "gen": 0,
            "shards": {sid: "" for sid in self._eligible_shards(_closed_scan(self.metadatadir))},
        }

    def latestOffset(self) -> dict:
        # Tip discovery happens in executors, so "latest" = what the sidecar
        # reports + a new generation that makes the next batch visit every
        # eligible shard (re-enumerated, so resharding is picked up; new and
        # newly-unlocked child shards enter at "" = the initial position).
        max_gen, seqs = _sidecar_scan(self.metadatadir)
        closed = _closed_scan(self.metadatadir)
        return {
            "gen": max_gen + 1,
            "shards": {sid: seqs.get(sid, "") for sid in self._eligible_shards(closed)},
        }

    def partitions(self, start: dict, end: dict):
        # Every shard is visited every batch: executors find the tip.
        # The batch's data begins AFTER what the previous batch consumed,
        # which is exactly the sequence map captured in the END offset at
        # planning time (offset_n = consumed-through-batch n-1); the start
        # offset's map is one batch older. Replay re-plans from the same
        # end offset, so the range start is stable.
        return [
            KinesisShardSlice(sid, seq, end["gen"], self.options)
            for sid, seq in end.get("shards", {}).items()
        ]

    def read(self, partition: KinesisShardSlice) -> Iterator[tuple]:
        return _read_shard_slice(partition)

    def commit(self, end: dict) -> None:
        # GC sidecar generations older than the committed one minus one
        # (the max-merge scan needs no history once a newer gen is complete)
        keep_from = int(end.get("gen", 0)) - 1
        if not os.path.isdir(self.metadatadir):
            return
        for gen_name in os.listdir(self.metadatadir):
            if not gen_name.startswith("gen="):
                continue
            try:
                gen = int(gen_name[4:])
            except ValueError:
                continue
            if gen < keep_from:
                import shutil

                shutil.rmtree(os.path.join(self.metadatadir, gen_name), ignore_errors=True)
