"""In-memory broker simulator (twin of S8, simulator/KinesisAsyncClientSimulator.java).

The reference tests its whole client stack against an in-process fake broker
with fault injection (rate-limit trigger at KinesisAsyncClientSimulator.java:
60-62,183-189). Our twin serves the same role for the sink/consumer tests:
an in-memory shard store with per-shard append logs, zero-padded 12-digit
sequence numbers (KinesisShardStream.java:30-33), and injectable faults.

The *source* side of testing uses MessiLog's parquet directory directly
(file-backed append log + readStream) — see streaming/consume.py — so this
class focuses on broker-side write behaviors: partial failures, rate limits,
sequence assignment.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..schema import format_sequence
from ..streaming.sink import PartialFailure


class RateLimitExceeded(Exception):
    """ProvisionedThroughputExceededException twin."""


@dataclass
class SimulatedShard:
    shard_id: str
    records: list[dict] = field(default_factory=list)

    def append(self, record: dict) -> str:
        seq = format_sequence(len(self.records))
        self.records.append({**record, "sequence_number": seq, "shard_id": self.shard_id})
        return seq


class BrokerSimulator:
    """put_records-shaped transport with fault injection.

    Fault hooks (armed for the NEXT call, then auto-cleared — same contract
    as the reference simulator's trigger flag):
      - fail_indices_next: per-record failures → PartialFailure
      - rate_limit_next: whole-call RateLimitExceeded
    """

    def __init__(self, n_shards: int = 1):
        self.shards = {str(i): SimulatedShard(str(i)) for i in range(n_shards)}
        self.fail_indices_next: list[int] | None = None
        self.rate_limit_next: bool = False
        self.calls: int = 0

    def put_records(self, records: list[dict]) -> None:
        self.calls += 1
        if self.rate_limit_next:
            self.rate_limit_next = False
            raise RateLimitExceeded()
        fail = set(self.fail_indices_next or [])
        self.fail_indices_next = None
        ok_indices = [i for i in range(len(records)) if i not in fail]
        for i in ok_indices:
            rec = records[i]
            shard = self._route(rec)
            self.shards[shard].append(rec)
        if fail:
            raise PartialFailure(sorted(fail))

    def _route(self, rec: dict) -> str:
        import hashlib

        pk = rec.get("partition_key") or ""
        h = int.from_bytes(hashlib.md5(pk.encode()).digest()[:8], "big")
        return str(h % len(self.shards))

    def all_records(self) -> list[dict]:
        return [r for s in self.shards.values() for r in s.records]
