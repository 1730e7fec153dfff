"""Independent-reference tests for the round-7 pipeline88 operators: each
pins the operator against a pure-python replay or a mathematical property,
so a bug that Spark and DuckDB share identically (same wrong formula on
both sides) still fails here."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from messikinesisprovider_spark.operators import pipeline88
from messikinesisprovider_spark.operators.relational import events_tbl

SF = "/root/testdata/sf0.001"


# -- hilbert --------------------------------------------------------------


def _xy2d_ref(n: int, x: int, y: int) -> int:
    """Wikipedia's canonical xy2d, transcribed directly."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        # rot
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_formula_matches_reference():
    """The SQL fold must compute the canonical xy2d on a grid sample."""
    con = duckdb.connect()
    pts = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 13)]
    sql = pipeline88.hilbert_d_duck("x", "y")
    rows = con.execute(
        f"SELECT x, y, {sql} AS d FROM (SELECT UNNEST(?) AS x, UNNEST(?) AS y)",
        [[p[0] for p in pts], [p[1] for p in pts]],
    ).fetchall()
    for x, y, d in rows:
        assert d == _xy2d_ref(256, x, y), (x, y, d)


def test_hilbert_is_a_bijection_with_unit_steps():
    """Curve property: d is a bijection on the 32x32 subgrid (order-8 curve
    restricted consistently), and consecutive d values on the full curve are
    adjacent cells — the locality property Morton lacks."""
    seen = {}
    for x in range(256):
        seen[_xy2d_ref(256, x, 0)] = (x, 0)
    # spot-check the unit-step property on a contiguous d range via d2xy
    # inversion: walk the first 4096 curve positions by brute map
    pos = {}
    for x in range(64):
        for y in range(64):
            pos[_xy2d_ref(64, x, y)] = (x, y)
    assert len(pos) == 64 * 64  # bijection
    for d in range(1, 64 * 64):
        (x0, y0), (x1, y1) = pos[d - 1], pos[d]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, d  # unit steps only


# -- holt -----------------------------------------------------------------


def test_holt_matches_python_replay(spark):
    daily = (
        events_tbl(spark, SF)
        .filter(
            F.col("ts").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("value").isNotNull()
        )
        .groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).cast("timestamp").alias("day")
        )
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("x"))
        .orderBy("event_type", "day")
        .collect()
    )
    series: dict[str, list[float]] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append(r["x"])
    out = {
        r["event_type"]: r
        for r in pipeline88.forecast_holt_linear(spark, SF).collect()
    }
    assert set(out) == set(series)
    for et, xs in series.items():
        level, trend = xs[0], 0.0
        for x in xs[1:]:
            nl = (x + level + trend) / 2.0
            trend = (nl - level) / 4.0 + (3.0 * trend) / 4.0
            level = nl
        assert out[et]["n_days"] == len(xs)
        assert out[et]["level"] == pytest.approx(round(level, 6), abs=1e-9)
        assert out[et]["trend"] == pytest.approx(round(trend, 6), abs=1e-9)


# -- hits -----------------------------------------------------------------


def test_hits_matches_python_replay(spark):
    from messikinesisprovider_spark.operators.graphshared import copurchase_edges

    edges = [(r["a"], r["b"]) for r in copurchase_edges(spark, SF).collect()]
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    deg = {u: len(vs) for u, vs in adj.items()}
    hub1 = {u: sum(deg[v] for v in vs) for u, vs in adj.items()}
    auth2 = {u: sum(hub1[v] for v in vs) for u, vs in adj.items()}
    expect = sorted(auth2.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got = pipeline88.graph_hits_step(spark, SF).collect()
    assert [(r["vertex"], r["auth_score"]) for r in got] == expect
    for r in got:
        assert r["degree"] == deg[r["vertex"]]
        assert r["hub_score"] == hub1[r["vertex"]]
