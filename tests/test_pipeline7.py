"""Semantic tests for the round-3g operators (pipeline7.py).

Parity proves cross-engine equality; these pin the fusion arithmetic against
a python recomputation, the LPA update rule against a from-scratch sync
reference (hand graph + real data), and the scale-relevant plan shapes
(TakeOrderedAndProject legs, no WindowExec in the RRF plan).
"""

import collections

from pyspark.sql import functions as F

from messikinesisprovider_spark.operators import pipeline7
from messikinesisprovider_spark.operators.graph2 import _copurchase_edges

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# retrieval_rrf_hybrid
# ---------------------------------------------------------------------------


def test_rrf_score_recomputes_from_ranks(spark):
    rows = pipeline7.retrieval_rrf_hybrid(spark, SF).collect()
    assert 0 < len(rows) <= pipeline7.RRF_TOPK
    for r in rows:
        want = 0
        if r["lex_rank"] is not None:
            assert 1 <= r["lex_rank"] <= pipeline7.RRF_LEG_TOPK
            want += pipeline7.RRF_SCALE // (pipeline7.RRF_K + r["lex_rank"])
        if r["sem_rank"] is not None:
            assert 1 <= r["sem_rank"] <= pipeline7.RRF_LEG_TOPK
            want += pipeline7.RRF_SCALE // (pipeline7.RRF_K + r["sem_rank"])
        assert r["lex_rank"] is not None or r["sem_rank"] is not None
        assert r["rrf_scaled"] == want
    # descending by fused score, doc_id tiebreak
    keys = [(-r["rrf_scaled"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)


def test_rrf_both_legs_beat_single_leg_at_same_rank(spark):
    # a doc ranked r in BOTH legs must outscore a doc ranked r in one leg
    k, s = pipeline7.RRF_K, pipeline7.RRF_SCALE
    assert s // (k + 5) + s // (k + 5) > s // (k + 5)
    assert s // (k + 1) + s // (k + 50) > s // (k + 1)


def test_rrf_plan_has_no_window_and_topk_legs(spark):
    plan = (
        pipeline7.retrieval_rrf_hybrid(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowExec" not in plan and "Window" not in plan.split("AdaptiveSparkPlan")[0]
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# graph_label_propagation
# ---------------------------------------------------------------------------


def _lpa_ref(edges, rounds):
    """From-scratch synchronous LPA: most-frequent neighbor label, smallest
    label on ties."""
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    labels = {v: v for v in adj}
    for _ in range(rounds):
        nxt = {}
        for v in adj:
            freq = collections.Counter(labels[n] for n in adj[v])
            best = max(freq.items(), key=lambda kv: (kv[1], -kv[0]))
            # ties: max on (count, -label) == smallest label among max-count
            top = min(l for l, c in freq.items() if c == best[1])
            nxt[v] = top
        labels = nxt
    return labels


def test_lpa_matches_python_reference_on_real_graph(spark):
    edges = [(r["a"], r["b"]) for r in _copurchase_edges(spark, SF).collect()]
    ref = _lpa_ref(edges, pipeline7.LPA_ROUNDS)
    want = collections.defaultdict(list)
    for v, l in ref.items():
        want[l].append(v)
    got = {
        r["community"]: (r["n_members"], r["min_node"], r["max_node"])
        for r in pipeline7.graph_label_propagation(spark, SF).collect()
    }
    assert got == {
        l: (len(vs), min(vs), max(vs)) for l, vs in want.items()
    }


def test_lpa_two_cliques_with_bridge(spark, tmp_path):
    # Two 3-cliques {1,2,3} and {10,11,12} bridged by 3-10: each clique
    # converges to its min label under the deterministic tie-break.
    # Encode the graph as lineitem co-purchases: an edge (a, b) = two rows
    # of one order containing parts a and b (support 2 => duplicate orders).
    sf = str(tmp_path)
    edges = [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12), (3, 10)]
    rows = []
    ok = 0
    for a, b in edges:
        for _ in range(2):  # support-2 mining threshold
            ok += 1
            rows += [(ok, a), (ok, b)]
    base = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    li = spark.read.parquet(f"{SF}/lineitem.parquet").limit(0)
    cols = [f.name for f in li.schema.fields]
    filled = base
    for f_ in li.schema.fields:
        if f_.name not in ("l_orderkey", "l_partkey"):
            filled = filled.withColumn(f_.name, F.lit(None).cast(f_.dataType))
    filled.select(*cols).write.parquet(f"{sf}/lineitem.parquet")

    ref = _lpa_ref(edges, pipeline7.LPA_ROUNDS)
    got = {
        r["community"]: r["n_members"]
        for r in pipeline7.graph_label_propagation(spark, sf).collect()
    }
    want = collections.Counter(ref.values())
    assert got == dict(want)
