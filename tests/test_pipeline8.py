"""Semantic tests for the round-3h operators (pipeline8.py)."""

import datetime
import re

from pyspark.sql import functions as F

from messikinesisprovider_spark.operators import pipeline8
from messikinesisprovider_spark.operators.relational import events_tbl

SF = "/root/testdata/sf0.001"

_EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_sequence_match_counts_match_python_regex(spark):
    # recompute every matched user's count from the raw events in python
    got = {
        r["user_id"]: (r["n_events"], r["n_matches"])
        for r in pipeline8.sequence_pattern_match(spark, SF).collect()
    }
    assert got, "sf0.001 corpus should contain at least one c->v*->p run"
    ev = (
        events_tbl(spark, SF)
        .filter(F.col("user_id").isNotNull())
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    seqs = {}
    for r in sorted(ev, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        seqs.setdefault(r["user_id"], []).append((r["event_type"] or "x")[0])
    pat = re.compile(pipeline8.SEQ_PATTERN)
    for uid, (n_events, n_matches) in got.items():
        seq = "".join(seqs[uid])
        assert n_events == len(seq)
        assert n_matches == len(pat.findall(seq)) > 0
    # non-matching users are excluded, not zero-rowed
    for uid, syms in seqs.items():
        if uid not in got:
            assert not pat.findall("".join(syms))


def test_sequence_match_constructed_cases(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1)

    def ev(i, uid, typ):
        return (i, t0 + datetime.timedelta(seconds=i), uid, typ, 1.0, "{}")

    rows = [
        # user 1: c v v p  -> 1 match
        ev(1, 1, "click"), ev(2, 1, "view"), ev(3, 1, "view"), ev(4, 1, "purchase"),
        # user 2: c v e p  -> error breaks the run, 0 matches
        ev(5, 2, "click"), ev(6, 2, "view"), ev(7, 2, "error"), ev(8, 2, "purchase"),
        # user 3: c p c v p -> 2 matches
        ev(9, 3, "click"), ev(10, 3, "purchase"), ev(11, 3, "click"),
        ev(12, 3, "view"), ev(13, 3, "purchase"),
        # user 4: p c v -> purchase before click, unfinished tail, 0 matches
        ev(14, 4, "purchase"), ev(15, 4, "click"), ev(16, 4, "view"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(f"{sf}/events.parquet")
    got = {
        r["user_id"]: r["n_matches"]
        for r in pipeline8.sequence_pattern_match(spark, sf).collect()
    }
    assert got == {1: 1, 3: 2}


def test_sequence_match_order_is_ts_then_event_id(spark, tmp_path):
    # same timestamp: event_id breaks the tie -> c(1) p(2) matches,
    # p-then-c would not
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 9, "click", 1.0, "{}"),
        (2, t0, 9, "purchase", 1.0, "{}"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(f"{sf}/events.parquet")
    got = pipeline8.sequence_pattern_match(spark, sf).collect()
    assert len(got) == 1 and got[0]["n_matches"] == 1


def test_seasonal_index_identities(spark):
    rows = pipeline8.seasonal_hourly_index(spark, SF).collect()
    by_type = {}
    for r in rows:
        assert 0 <= r["hh"] <= 23
        by_type.setdefault(r["event_type"], []).append(r)
    for typ, rs in by_type.items():
        total = sum(r["n"] for r in rs)
        for r in rs:
            # exact integer-division identity
            assert r["index_scaled"] == (r["n"] * 24 * pipeline8.SEASONAL_SCALE) // total
        # UNWEIGHTED mean of the index over all 24 hours is the baseline
        # (shares sum to 1), up to the per-row integer-division floor
        assert len(rs) == 24, f"{typ}: expected every hour populated at this SF"
        approx = sum(r["index_scaled"] for r in rs) / (24 * pipeline8.SEASONAL_SCALE)
        assert 0.999 <= approx <= 1.0


def test_seasonal_uniform_synthetic_is_exactly_baseline(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(hours=i % 24), 1, "click", 1.0, "{}")
        for i in range(240)  # 10 events in every hour
    ]
    sf = str(tmp_path)
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(f"{sf}/events.parquet")
    out = pipeline8.seasonal_hourly_index(spark, sf).collect()
    assert len(out) == 24
    assert all(r["index_scaled"] == pipeline8.SEASONAL_SCALE for r in out)
