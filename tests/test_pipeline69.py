"""Tests for pipeline69 (adaptive-width LSH kNN graph)."""

from __future__ import annotations

from messikinesisprovider_spark.operators.pipeline3 import _PLANES
from messikinesisprovider_spark.operators.pipeline32 import knn_graph_build
from messikinesisprovider_spark.operators.pipeline69 import (
    _EXT_PLANES,
    _MAX_BITS,
    _MIN_BITS,
    _N_CHUNKS,
    _bits_for,
    knn_graph_adaptive,
)

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_bits_ladder():
    """Integer ladder: floor 4 up to 2000 vectors (the fixed query's regime),
    +1 bit per doubling, capped at 10."""
    assert _bits_for(0) == _MIN_BITS
    assert _bits_for(500) == _MIN_BITS
    assert _bits_for(2000) == _MIN_BITS
    assert _bits_for(2001) == 5
    assert _bits_for(4000) == 5
    assert _bits_for(20000) == 8
    assert _bits_for(10**9) == _MAX_BITS


def test_plane_prefix_matches_fixed_query():
    """Chunk c's first 4 planes ARE pipeline32's planes 4c..4c+3, so small
    corpora reproduce the fixed query's candidate set bit-for-bit."""
    for c in range(_N_CHUNKS):
        for j in range(_MIN_BITS):
            assert (_EXT_PLANES[c][j] == _PLANES[_N_CHUNKS * c + j]).all()
        for j in range(_MAX_BITS):
            assert _EXT_PLANES[c][j].any()


def _rows(df):
    return sorted(
        (r["vec_id"], r["rnk"], r["neighbor_id"], r["cos_sim"]) for r in df.collect()
    )


def test_degenerates_to_fixed_query_below_threshold(spark):
    """At N <= 2000 the adaptive query must equal knn_graph_build exactly —
    same candidates, same rescore, same graph."""
    for sf in (SF, SF01):
        assert _rows(knn_graph_adaptive(spark, sf)) == _rows(knn_graph_build(spark, sf))
