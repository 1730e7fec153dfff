"""Property-based correctness for the distributed graph algorithms:
connected components (large-star/small-star) and triangle counting
(degree-ordered orientation) against plain-Python references on random
graphs. Complements the fixed-corpus parity checks: random structure probes
star-round edge cases (chains, hubs, self-edges, multi-edges, singletons)
the synthetic corpus never produces."""

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from messikinesisprovider_spark.operators.clusters import connected_components


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id of the component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


edge_lists = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=1,
    max_size=60,
)


@settings(max_examples=8, deadline=None)
@given(edge_lists)
def test_connected_components_match_union_find(spark, edges):
    df = spark.createDataFrame(edges, "doc_a BIGINT, doc_b BIGINT")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    nodes = {a for a, _ in edges} | {b for _, b in edges}
    want = _union_find(edges, nodes)
    assert got == want


@settings(max_examples=8, deadline=None)
@given(edge_lists)
def test_oriented_triangle_count_matches_python(spark, edges):
    # canonical undirected simple graph (drop self-loops and multi-edges)
    simple = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    if not simple:
        return
    df = spark.createDataFrame(sorted(simple), "a BIGINT, b BIGINT")
    from messikinesisprovider_spark.operators.graph2 import oriented_triangles

    got = oriented_triangles(df).count()

    adj = {}
    for a, b in simple:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = sum(
        1 for (a, b) in simple for c in (adj[a] & adj[b]) if b < c
    )
    assert got == want


def test_connected_components_path_graph_converges_logarithmically(spark):
    """A 400-node path is the worst diameter case: naive min-label
    propagation needs ~400 rounds; the star algorithm must collapse it to
    one component labeled 0 well inside its O(log n) round budget."""
    n = 400
    edges = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(edges, "doc_a BIGINT, doc_b BIGINT")
    rows = connected_components(df).collect()
    assert len(rows) == n
    assert all(r["component"] == 0 for r in rows)
