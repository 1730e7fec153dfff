"""Independent-reference tests for the round-7 pipeline90 operators."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from messikinesisprovider_spark.operators import pipeline90
from messikinesisprovider_spark.operators.relational import tbl

SF = "/root/testdata/sf0.001"


def test_binary_quantize_matches_python_replay(spark):
    rows = tbl(spark, SF, "embeddings").select("vec_id", "embedding").collect()
    vecs = {}
    for r in rows:
        v = [float(x) for x in r["embedding"]]
        n = math.sqrt(sum(x * x for x in v))
        if n > 0:
            vecs[r["vec_id"]] = (v, n)
    def words(v):
        w1 = w2 = 0
        for i in range(32):
            w1 = w1 * 2 + (1 if v[i] >= 0 else 0)
        for i in range(32, 64):
            w2 = w2 * 2 + (1 if v[i] >= 0 else 0)
        return w1, w2
    bits = {vid: words(v) for vid, (v, _) in vecs.items()}
    got = pipeline90.embedding_binary_quantize_recall(spark, SF).collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    from messikinesisprovider_spark.operators.similarity import N_QUERIES

    for qid in [v for v in vecs if v < N_QUERIES]:
        ham = {
            cid: bin(bits[qid][0] ^ bits[cid][0]).count("1")
            + bin(bits[qid][1] ^ bits[cid][1]).count("1")
            for cid in vecs
            if cid != qid
        }
        expect = sorted(ham.items(), key=lambda kv: (kv[1], kv[0]))[: pipeline90._BQ_TOPK]
        rows_q = sorted(by_q[qid], key=lambda r: r["rnk"])
        assert [(r["neighbor_id"], r["hamming"]) for r in rows_q] == expect
        for r in rows_q:  # attached cosine is the true cosine
            (va, na), (vb, nb) = vecs[qid], vecs[r["neighbor_id"]]
            cos = round(sum(x * y for x, y in zip(va, vb)) / (na * nb), 6)
            assert r["cos_sim"] == pytest.approx(cos, abs=1e-9)


def test_phrase_proximity_matches_python_replay(spark):
    docs = tbl(spark, SF, "documents").filter(F.col("text").isNotNull()).collect()
    freq: dict[str, int] = {}
    for d in docs:
        for w in d["text"].split(" "):
            freq[w] = freq.get(w, 0) + 1
    (t1, _), (t2, _) = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    scores = {}
    for d in docs:
        ws = d["text"].split(" ")
        pa = [i + 1 for i, w in enumerate(ws) if w == t1]
        pb = [i + 1 for i, w in enumerate(ws) if w == t2]
        if pa and pb:
            n_pairs = len(pa) * len(pb)
            md = min(abs(a - b) for a in pa for b in pb)
            scores[d["doc_id"]] = (n_pairs, md, round(n_pairs / (1.0 + md), 6))
    expect = sorted(scores.items(), key=lambda kv: (-kv[1][2], kv[0]))[
        : pipeline90._PROX_TOPK
    ]
    got = pipeline90.bm25_phrase_proximity(spark, SF).collect()
    assert [(r["doc_id"], (r["n_pairs"], r["min_dist"], r["prox_score"])) for r in got] == expect


def test_token_budget_pack_is_contiguous_and_complete(spark):
    docs = {
        r["doc_id"]: (max(0, r["n_chars"] or 0) + 3) // 4
        for r in tbl(spark, SF, "documents").select("doc_id", "n_chars").collect()
    }
    got = sorted(
        pipeline90.shard_token_budget_pack(spark, SF).collect(), key=lambda r: r["shard"]
    )
    assert sum(r["n_docs"] for r in got) == len(docs)
    assert sum(r["tokens"] for r in got) == sum(docs.values())
    # shards are contiguous doc_id ranges in order
    for a, b in zip(got, got[1:]):
        assert a["last_doc"] < b["first_doc"]
    # every shard except possibly the last spans >= the budget when its
    # preceding boundary is crossed: replay the assignment exactly
    cum = 0
    assign: dict[int, int] = {}
    for did in sorted(docs):
        assign[did] = cum // pipeline90._PACK_BUDGET
        cum += docs[did]
    for r in got:
        mine = [d for d, s in assign.items() if s == r["shard"]]
        assert r["n_docs"] == len(mine)
        assert r["first_doc"] == min(mine) and r["last_doc"] == max(mine)
