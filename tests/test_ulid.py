"""ULID unit tests (contract: KinesisMessiProducer.java:68-80 monotonicity)."""

import random

from hypothesis import given, strategies as st

from messikinesisprovider_spark.ulid import MonotonicUlidGenerator, Ulid


def test_roundtrip_text():
    u = Ulid.of(1700000000000, 12345678901234567890)
    assert Ulid.parse(u.text()) == u
    assert len(u.text()) == 26


def test_msb_lsb_roundtrip():
    u = Ulid.of(1700000000000, (1 << 79) + 17)
    assert Ulid.from_parts(u.msb, u.lsb) == u


def test_timestamp_extraction():
    u = Ulid.of(1700000000123, 0)
    assert u.timestamp_ms == 1700000000123


def test_text_order_matches_numeric_order():
    rng = random.Random(7)
    vals = [Ulid.of(rng.randrange(1 << 48), rng.getrandbits(80)) for _ in range(200)]
    by_num = sorted(vals, key=lambda u: u.value)
    by_text = sorted(vals, key=lambda u: u.text())
    assert by_num == by_text


def test_monotonic_same_millisecond():
    prev = Ulid.of(1700000000000, 42)
    nxt = prev.next_monotonic(1700000000000)
    assert nxt.value == prev.value + 1


def test_monotonic_generator_strictly_increasing():
    gen = MonotonicUlidGenerator(partition_id=3, seed=99)
    seq = [gen.next(1700000000000) for _ in range(1000)]
    # same ms: strict increase
    assert all(a.value < b.value for a, b in zip(seq, seq[1:]))
    # later ms: still strictly greater
    later = gen.next(1700000000001)
    assert later.value > seq[-1].value
    assert later.timestamp_ms == 1700000000001


@given(st.integers(0, (1 << 48) - 1), st.integers(0, (1 << 80) - 1))
def test_parse_text_inverse(ts, rnd):
    u = Ulid.of(ts, rnd)
    assert Ulid.parse(u.text()).value == u.value
