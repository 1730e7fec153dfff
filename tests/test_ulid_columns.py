"""Column-level ULID helpers agree with the reference Python implementation."""

import random

from pyspark.sql import functions as F

from messikinesisprovider_spark.functions.ulid_columns import (
    ulid_text,
    ulid_time_bounds_filter,
    ulid_timestamp_ms,
)
from messikinesisprovider_spark.ulid import Ulid


def _sample_ulids(n=300, seed=11):
    rng = random.Random(seed)
    return [Ulid.of(rng.randrange(1 << 48), rng.getrandbits(80)) for _ in range(n)]


def test_vectorized_text_matches_python(spark):
    ulids = _sample_ulids()
    df = spark.createDataFrame(
        [(u.msb, u.lsb, u.text()) for u in ulids], ["msb", "lsb", "expected"]
    )
    got = df.select("expected", ulid_text(F.col("msb"), F.col("lsb")).alias("got")).collect()
    assert all(r["got"] == r["expected"] for r in got)


def test_timestamp_extraction_matches(spark):
    ulids = _sample_ulids(100, seed=5)
    df = spark.createDataFrame([(u.msb, u.timestamp_ms) for u in ulids], ["msb", "expected_ms"])
    rows = df.select("expected_ms", ulid_timestamp_ms(F.col("msb")).alias("got")).collect()
    assert all(r["got"] == r["expected_ms"] for r in rows)


def test_time_bounds_filter_prunes(spark):
    ulids = _sample_ulids(200, seed=9)
    df = spark.createDataFrame([(u.msb, u.timestamp_ms) for u in ulids], ["msb", "ms"])
    lo, hi = 1 << 46, 1 << 47
    got = df.filter(ulid_time_bounds_filter(F.col("msb"), lo, hi)).collect()
    expected = [u for u in ulids if lo <= u.timestamp_ms < hi]
    assert len(got) == len(expected)
    assert all(lo <= r["ms"] < hi for r in got)
