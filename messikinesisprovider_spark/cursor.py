"""The six-type resumable cursor model.

Rebuild of the reference's cursor contract (KinesisMessiCursor.java:15-185;
type switch KinesisStreamingBuffer.java:247-281):

- NOW                  → start after the newest record (LATEST)
- OLDEST_RETAINED      → start at the retention horizon (TRIM_HORIZON)
- AT_PROVIDER_TIME     → first record with arrival ts >= t (AT_TIMESTAMP)
- AT_PROVIDER_SEQUENCE → exact restart point (± inclusive); the only
                         checkpoint-serializable type (KinesisMessiCursor.java:59-68)
- AT_ULID              → position at a message by ULID, with ±60 s time slack
                         and a client-side residual scan
- AT_EXTERNAL_ID       → position at a business key near a known time, with
                         tolerance and lookahead-fallback-replay semantics

Cursor comparison is a total order within one shard by (sequence, inclusive);
cross-shard or cross-type comparison raises — same contract as the TCK
(MessiStreamingConsumerTck.java:417-468).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from enum import Enum

from .ulid import Ulid

# Reference constants: ±60 s ULID seek slack (KinesisMessiShard.java:65,
# KinesisMessiStreamingConsumer.java:26)
ULID_TIME_TOLERANCE = timedelta(minutes=1)


class CursorType(Enum):
    NOW = "NOW"
    OLDEST_RETAINED = "OLDEST_RETAINED"
    AT_PROVIDER_TIME = "AT_PROVIDER_TIME"
    AT_PROVIDER_SEQUENCE = "AT_PROVIDER_SEQUENCE"
    AT_ULID = "AT_ULID"
    AT_EXTERNAL_ID = "AT_EXTERNAL_ID"


class CursorError(ValueError):
    pass


class IncomparableCursor(CursorError):
    """Cursors of different shards/types have no defined order
    (KinesisMessiCursor.java:74-86 throws IllegalArgumentException)."""


@dataclass(frozen=True)
class MessiCursor:
    type: CursorType
    shard_id: str | None = None
    sequence_number: int | None = None
    inclusive: bool = True
    timestamp: datetime | None = None
    ulid: Ulid | None = None
    external_id: str | None = None
    tolerance: timedelta = field(default=ULID_TIME_TOLERANCE)

    # -- constructors (KinesisMessiShard.java:145-163 builder equivalents) --
    @staticmethod
    def now() -> "MessiCursor":
        return MessiCursor(CursorType.NOW)

    @staticmethod
    def oldest() -> "MessiCursor":
        return MessiCursor(CursorType.OLDEST_RETAINED)

    @staticmethod
    def at_time(t: datetime) -> "MessiCursor":
        return MessiCursor(CursorType.AT_PROVIDER_TIME, timestamp=_utc(t))

    @staticmethod
    def at_sequence(shard_id: str, seq: int, inclusive: bool = True) -> "MessiCursor":
        return MessiCursor(
            CursorType.AT_PROVIDER_SEQUENCE,
            shard_id=shard_id,
            sequence_number=seq,
            inclusive=inclusive,
        )

    @staticmethod
    def at_ulid(u: Ulid, inclusive: bool = True) -> "MessiCursor":
        return MessiCursor(CursorType.AT_ULID, ulid=u, inclusive=inclusive)

    @staticmethod
    def at_external_id(
        external_id: str,
        near_time: datetime,
        tolerance: timedelta = ULID_TIME_TOLERANCE,
        inclusive: bool = True,
    ) -> "MessiCursor":
        return MessiCursor(
            CursorType.AT_EXTERNAL_ID,
            external_id=external_id,
            timestamp=_utc(near_time),
            tolerance=tolerance,
            inclusive=inclusive,
        )

    # -- checkpoint serde (KinesisMessiCursor.java:59-68,167-178) -----------
    def checkpoint(self) -> str:
        if self.type is not CursorType.AT_PROVIDER_SEQUENCE:
            raise CursorError(
                f"only AT_PROVIDER_SEQUENCE cursors are checkpoint-serializable, got {self.type.name}"
            )
        return json.dumps(
            {
                "shardId": self.shard_id,
                "sequenceNumber": f"{self.sequence_number:012d}",
                "inclusive": self.inclusive,
            }
        )

    @staticmethod
    def from_checkpoint(payload: str, strict: bool = True) -> "MessiCursor":
        """Deserialize a checkpoint.

        strict=True (default): a corrupt payload raises CursorError —
        fail-loud, because silently replaying the retention horizon is a
        data-duplication event someone should page on.

        strict=False: the reference's lossy-recovery contract
        (FileBasedProgressTracker.java:128-143 — on an unreadable progress
        file it WARNS and restarts from the oldest retained record). Opt-in
        twin for deployments that prefer replay over an operator being
        paged; emits the same warning the reference logs.
        """
        try:
            doc = json.loads(payload)
            return MessiCursor.at_sequence(
                shard_id=doc["shardId"],
                seq=int(doc["sequenceNumber"]),
                inclusive=bool(doc["inclusive"]),
            )
        except (json.JSONDecodeError, KeyError, TypeError, ValueError) as e:
            if not strict:
                import warnings

                warnings.warn(
                    f"corrupt checkpoint {payload!r}: falling back to "
                    "OLDEST_RETAINED (records may replay; consumers must "
                    "dedup by ULID)",
                    RuntimeWarning,
                    stacklevel=2,
                )
                return MessiCursor.oldest()
            raise CursorError(f"corrupt checkpoint: {payload!r}") from e

    # -- total order within (shard, AT_PROVIDER_SEQUENCE) -------------------
    def _key(self):
        if self.type is not CursorType.AT_PROVIDER_SEQUENCE:
            raise IncomparableCursor(f"cannot compare cursor of type {self.type.name}")
        # inclusive-at-N positions strictly before exclusive-after-N
        return (self.sequence_number, 0 if self.inclusive else 1)

    def compare_to(self, other: "MessiCursor") -> int:
        if not isinstance(other, MessiCursor):
            raise IncomparableCursor("not a cursor")
        if self.type is not other.type or self.shard_id != other.shard_id:
            raise IncomparableCursor(
                f"incompatible cursors: {self.type.name}/{self.shard_id} vs "
                f"{other.type.name}/{other.shard_id}"
            )
        a, b = self._key(), other._key()
        return (a > b) - (a < b)

    def is_same(self, other: "MessiCursor") -> bool:
        return self.compare_to(other) == 0

    def is_before(self, other: "MessiCursor") -> bool:
        return self.compare_to(other) < 0

    def is_after(self, other: "MessiCursor") -> bool:
        return self.compare_to(other) > 0


def _utc(t: datetime) -> datetime:
    return t if t.tzinfo is not None else t.replace(tzinfo=timezone.utc)
