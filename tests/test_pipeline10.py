"""Semantic tests for graph_jaccard_links (pipeline10.py)."""

import collections
import itertools

from messikinesisprovider_spark.operators import pipeline10
from messikinesisprovider_spark.operators.graph2 import _copurchase_edges

SF = "/root/testdata/sf0.001"


def _ref_jaccard_links(edges):
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    out = {}
    for a, b in itertools.combinations(sorted(adj), 2):
        if b in adj[a]:
            continue  # already an edge
        if deg[a] > pipeline10.JACC_MAX_DEGREE or deg[b] > pipeline10.JACC_MAX_DEGREE:
            continue  # capped parts generate no wedges
        common = len(adj[a] & adj[b])
        if common >= pipeline10.JACC_MIN_COMMON:
            score = (pipeline10.JACC_SCALE * common) // (deg[a] + deg[b] - common)
            out[(a, b)] = (common, deg[a], deg[b], score)
    return out


def test_jaccard_links_match_python_reference(spark):
    edges = [(r["a"], r["b"]) for r in _copurchase_edges(spark, SF).collect()]
    want = _ref_jaccard_links(edges)
    got = {
        (r["a"], r["b"]): (r["common"], r["deg_a"], r["deg_b"], r["jaccard_scaled"])
        for r in pipeline10.graph_jaccard_links(spark, SF).collect()
    }
    assert got == want
    assert got, "sf0.001 co-purchase graph should produce candidates"


def test_jaccard_links_excludes_existing_edges(spark):
    edges = {(r["a"], r["b"]) for r in _copurchase_edges(spark, SF).collect()}
    got = {(r["a"], r["b"]) for r in pipeline10.graph_jaccard_links(spark, SF).collect()}
    assert not (got & edges)
