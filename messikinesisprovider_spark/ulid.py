"""Monotonic, time-sortable 128-bit ULIDs (public spec: ulid/spec on GitHub).

Layout: 48-bit unix-epoch milliseconds | 80-bit randomness. Canonical text
form is 26 chars of Crockford base32 — lexicographic order == numeric order
== time order, which is what makes ULID columns range-prunable in Parquet.

The reference auto-assigns ULIDs monotonically per producer when absent
(KinesisMessiProducer.java:68-80, AtomicReference at :32-33): within the same
millisecond the previous value is incremented, guaranteeing strict per-producer
ordering. Distributed twist (SURVEY.md §7.4): Spark writers guarantee
monotonicity *per partition writer*; global time-sortability still holds via
the millisecond prefix, and cross-writer uniqueness comes from the 80-bit
random tail seeded per (partition, epoch).
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass

_CROCKFORD = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
_DECODE = {c: i for i, c in enumerate(_CROCKFORD)}
# Crockford decoding treats I,L as 1 and O as 0
_DECODE.update({"I": 1, "L": 1, "O": 0})

_MASK128 = (1 << 128) - 1
_MASK80 = (1 << 80) - 1


@dataclass(frozen=True, order=True)
class Ulid:
    value: int  # 128-bit unsigned

    # -- constructors -------------------------------------------------------
    @staticmethod
    def of(timestamp_ms: int, randomness: int) -> "Ulid":
        if not 0 <= timestamp_ms < (1 << 48):
            raise ValueError(f"ULID timestamp out of range: {timestamp_ms}")
        return Ulid(((timestamp_ms & ((1 << 48) - 1)) << 80) | (randomness & _MASK80))

    @staticmethod
    def from_parts(msb: int, lsb: int) -> "Ulid":
        """From the two signed int64 halves used on the wire/in Spark columns."""
        return Ulid(((msb & 0xFFFFFFFFFFFFFFFF) << 64) | (lsb & 0xFFFFFFFFFFFFFFFF))

    @staticmethod
    def parse(text: str) -> "Ulid":
        if len(text) != 26:
            raise ValueError(f"ULID must be 26 chars: {text!r}")
        v = 0
        for ch in text.upper():
            if ch not in _DECODE:
                raise ValueError(f"invalid ULID char {ch!r} in {text!r}")
            v = (v << 5) | _DECODE[ch]
        return Ulid(v & _MASK128)

    @staticmethod
    def generate(timestamp_ms: int, rng: random.Random | None = None) -> "Ulid":
        r = rng.getrandbits(80) if rng is not None else random.getrandbits(80)
        return Ulid.of(timestamp_ms, r)

    # -- accessors ----------------------------------------------------------
    @property
    def timestamp_ms(self) -> int:
        return self.value >> 80

    @property
    def msb(self) -> int:
        """Signed int64 view of the high half (Spark LongType compatible)."""
        v = (self.value >> 64) & 0xFFFFFFFFFFFFFFFF
        return v - (1 << 64) if v >= (1 << 63) else v

    @property
    def lsb(self) -> int:
        v = self.value & 0xFFFFFFFFFFFFFFFF
        return v - (1 << 64) if v >= (1 << 63) else v

    def text(self) -> str:
        chars = []
        v = self.value
        for _ in range(26):
            chars.append(_CROCKFORD[v & 0x1F])
            v >>= 5
        return "".join(reversed(chars))

    def __str__(self) -> str:  # pragma: no cover - convenience
        return self.text()

    # -- monotonic successor (KinesisMessiProducer.java:68-80 contract) -----
    def next_monotonic(self, timestamp_ms: int, rng: random.Random | None = None) -> "Ulid":
        """Strictly-greater ULID at `timestamp_ms`.

        Same millisecond → previous value + 1 (the reference's
        nextMonotonicUlid); later millisecond → fresh randomness.
        """
        if timestamp_ms <= self.timestamp_ms:
            return Ulid((self.value + 1) & _MASK128)
        return Ulid.generate(timestamp_ms, rng)


class MonotonicUlidGenerator:
    """Per-writer monotonic generator (one per Spark task/partition writer).

    Seeded by (seed, partition_id, pid) so concurrent writers draw disjoint
    random tails with overwhelming probability while each stays strictly
    monotonic — the distributed version of the reference's AtomicReference.
    """

    def __init__(self, partition_id: int = 0, seed: int | None = None):
        base = seed if seed is not None else random.SystemRandom().getrandbits(64)
        self._rng = random.Random((base << 32) ^ (partition_id << 16) ^ os.getpid())
        self._prev: Ulid | None = None

    def next(self, timestamp_ms: int) -> Ulid:
        if self._prev is None:
            u = Ulid.generate(timestamp_ms, self._rng)
        else:
            u = self._prev.next_monotonic(max(timestamp_ms, self._prev.timestamp_ms), self._rng)
        self._prev = u
        return u
