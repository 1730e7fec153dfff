"""Hopping-window streaming topology invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from messikinesisprovider_spark.streaming.verified10 import streaming_hopping_window

SF = "/root/testdata/sf0.001"


def test_every_event_lands_in_exactly_two_windows(spark):
    from messikinesisprovider_spark.operators.relational import events_tbl

    out = streaming_hopping_window(spark, SF)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    n_valid = (
        events_tbl(spark, SF)
        .filter(
            F.col("ts").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("value").isNotNull()
        )
        .count()
    )
    assert total == 2 * n_valid > 0


def test_adjacent_windows_overlap(spark):
    """Window starts are 1h apart while windows are 2h long — consecutive
    windows of one event_type share events, so counts are non-trivial."""
    rows = streaming_hopping_window(spark, SF).collect()
    starts = sorted({r["window_start"] for r in rows})
    gaps = {int((b - a).total_seconds()) for a, b in zip(starts, starts[1:])}
    assert 3600 in gaps  # 1h slide is realized
