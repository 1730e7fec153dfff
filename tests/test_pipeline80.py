"""Tests for pipeline80 (adaptive-cell SemDeDup)."""

from __future__ import annotations

from messikinesisprovider_spark.operators.pipeline4 import N_SEM_CELLS, semdedup_cells
from messikinesisprovider_spark.operators.pipeline80 import (
    _MAX_CELLS_LOG2,
    _TARGET_CELL,
    _cells_for,
    semdedup_adaptive,
)

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_cell_ladder():
    """Integer ladder: 16 cells up to 2000 vectors (the fixed query's
    regime), doubling per occupancy-target breach, capped at 4096."""
    assert _cells_for(0) == N_SEM_CELLS
    assert _cells_for(500) == N_SEM_CELLS
    assert _cells_for(_TARGET_CELL * N_SEM_CELLS) == N_SEM_CELLS  # 2000
    assert _cells_for(_TARGET_CELL * N_SEM_CELLS + 1) == 32
    assert _cells_for(4000) == 32
    assert _cells_for(20000) == 256
    assert _cells_for(10**9) == 1 << _MAX_CELLS_LOG2


def _rows(df):
    return sorted(
        (r["vec_id"], r["cid"], r["is_dup"], r["dup_of"]) for r in df.collect()
    )


def test_degenerates_to_fixed_query_below_threshold(spark):
    """At N <= 2000 the ladder picks k = 16 and the centroid selection is
    identical to semdedup_cells (same hash order, same LIMIT), so cells,
    verdicts and dup_of assignments must match bit-for-bit."""
    for sf in (SF, SF01):
        assert _rows(semdedup_adaptive(spark, sf)) == _rows(semdedup_cells(spark, sf))


def test_occupancy_bound_is_linear(spark):
    """The invariant the ladder exists for: expected cell occupancy
    N / k never exceeds TARGET_CELL, so in-cell pair volume is
    O(N * TARGET_CELL) — linear in the corpus, never quadratic."""
    for n in (1, 2000, 2001, 50_000, 400_000):
        k = _cells_for(n)
        if n <= _TARGET_CELL * (1 << _MAX_CELLS_LOG2):
            assert n <= _TARGET_CELL * k
        assert k >= N_SEM_CELLS
