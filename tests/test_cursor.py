"""Cursor contract tests (TCK: MessiStreamingConsumerTck.java:417-468,
MessiClientTck.java:387-431 checkpoint round-trip)."""

from datetime import datetime, timezone

import pytest

from messikinesisprovider_spark.cursor import (
    CursorError,
    CursorType,
    IncomparableCursor,
    MessiCursor,
)
from messikinesisprovider_spark.ulid import Ulid


def test_checkpoint_roundtrip():
    c = MessiCursor.at_sequence("3", 17, inclusive=False)
    restored = MessiCursor.from_checkpoint(c.checkpoint())
    assert restored.is_same(c)
    assert restored.shard_id == "3"
    assert restored.sequence_number == 17
    assert restored.inclusive is False


def test_checkpoint_only_for_sequence_type():
    with pytest.raises(CursorError):
        MessiCursor.now().checkpoint()
    with pytest.raises(CursorError):
        MessiCursor.at_time(datetime(2026, 1, 1, tzinfo=timezone.utc)).checkpoint()


def test_corrupt_checkpoint_raises():
    with pytest.raises(CursorError):
        MessiCursor.from_checkpoint("{not json")
    with pytest.raises(CursorError):
        MessiCursor.from_checkpoint('{"shardId": "0"}')


def test_corrupt_checkpoint_lossy_fallback_opt_in():
    """strict=False mirrors the reference's FileBasedProgressTracker
    (java:128-143): warn + restart from OLDEST_RETAINED instead of raising.
    A VALID checkpoint must still resume exactly, never fall back."""
    with pytest.warns(RuntimeWarning, match="OLDEST_RETAINED"):
        c = MessiCursor.from_checkpoint("{not json", strict=False)
    assert c.type is CursorType.OLDEST_RETAINED
    with pytest.warns(RuntimeWarning):
        c2 = MessiCursor.from_checkpoint('{"shardId": "0"}', strict=False)
    assert c2.type is CursorType.OLDEST_RETAINED
    good = MessiCursor.at_sequence("3", 41, inclusive=False)
    restored = MessiCursor.from_checkpoint(good.checkpoint(), strict=False)
    assert restored == good


def test_total_order_axioms():
    # TCK: at(N) < after(N) < at(N+1)
    at3 = MessiCursor.at_sequence("0", 3, inclusive=True)
    after3 = MessiCursor.at_sequence("0", 3, inclusive=False)
    at4 = MessiCursor.at_sequence("0", 4, inclusive=True)
    assert at3.is_before(after3)
    assert after3.is_before(at4)
    assert at4.is_after(at3)
    assert at3.is_same(MessiCursor.at_sequence("0", 3, inclusive=True))


def test_cross_shard_comparison_raises():
    a = MessiCursor.at_sequence("0", 1)
    b = MessiCursor.at_sequence("1", 1)
    with pytest.raises(IncomparableCursor):
        a.compare_to(b)


def test_cross_type_comparison_raises():
    a = MessiCursor.at_sequence("0", 1)
    b = MessiCursor.at_ulid(Ulid.of(1700000000000, 1))
    with pytest.raises(IncomparableCursor):
        a.compare_to(b)
