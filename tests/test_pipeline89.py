"""Independent-reference tests for the round-7 pipeline89 operators —
python replays of MaxSim, greedy MMR, the prune ranking, and the rank-1
ALS closed form (the oracle proves Spark == DuckDB; these prove the shared
formula is the REAL algorithm)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from messikinesisprovider_spark.operators import pipeline89
from messikinesisprovider_spark.operators.relational import events_tbl, tbl

SF = "/root/testdata/sf0.001"


def _vectors(spark):
    rows = (
        tbl(spark, SF, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    out = {}
    for r in rows:
        v = [float(x) for x in r["embedding"]]
        n = math.sqrt(sum(x * x for x in v))
        if n > 0:
            out[r["vec_id"]] = (v, n)
    return out


def _cos(a, b):
    (va, na), (vb, nb) = a, b
    return round(sum(x * y for x, y in zip(va, vb)) / (na * nb), 6)


def test_colbert_maxsim_matches_python_replay(spark):
    vecs = _vectors(spark)
    w = pipeline89._MV_WIDTH
    docs: dict[int, list[int]] = {}
    for vid in vecs:
        docs.setdefault(vid // w, []).append(vid)
    queries = {d: vs for d, vs in docs.items() if d < pipeline89._MV_QUERIES}
    corpus = {d: vs for d, vs in docs.items() if d >= pipeline89._MV_QUERIES}
    got = pipeline89.colbert_maxsim_retrieval(spark, SF).collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["query_doc"], []).append(r)
    for qd, qvs in queries.items():
        scores = {}
        for cd, cvs in corpus.items():
            maxima = sorted(
                max(_cos(vecs[qv], vecs[cv]) for cv in cvs) for qv in qvs
            )
            s = 0.0
            for m in maxima:  # value-sorted sequential fold
                s += m
            scores[cd] = s
        expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[
            : pipeline89._MV_TOPK
        ]
        rows = sorted(by_q[qd], key=lambda r: r["rnk"])
        assert [(r["cand_doc"]) for r in rows] == [cd for cd, _ in expect]
        for r, (cd, s) in zip(rows, expect):
            assert r["score"] == pytest.approx(s, abs=1e-9)


def test_mmr_matches_greedy_replay(spark):
    vecs = _vectors(spark)
    q = vecs[0]
    rel = {vid: _cos(q, v) for vid, v in vecs.items() if vid != 0}
    cand = sorted(rel.items(), key=lambda kv: (-kv[1], kv[0]))[: pipeline89._MMR_CAND]
    cand_ids = [vid for vid, _ in cand]
    picked = [cand_ids[0]]
    scores = [rel[cand_ids[0]]]
    for _ in range(2):
        best = None
        for c in cand_ids:
            if c in picked:
                continue
            pen = max(_cos(vecs[c], vecs[p]) for p in picked)
            m = rel[c] - 0.5 * pen
            key = (-m, c)
            if best is None or key < best[0]:
                best = (key, c, m)
        picked.append(best[1])
        scores.append(best[2])
    got = sorted(pipeline89.mmr_diversified_topk(spark, SF).collect(), key=lambda r: r["rnk"])
    assert [r["vec_id"] for r in got] == picked
    for r, s in zip(got, scores):
        assert r["mmr_score"] == pytest.approx(s, abs=1e-9)


def test_vocab_prune_quartile_boundary(spark):
    rows = pipeline89.tokenizer_vocab_prune(spark, SF).collect()
    assert {r["piece_len"] for r in rows} <= {2, 3, 4}
    total_kept = sum(r["n_kept"] for r in rows)
    total = total_kept + sum(r["n_pruned"] for r in rows)
    # kept = floor-quartile rule: rn * 4 <= n * 3
    assert total_kept == (total * pipeline89._PRUNE_KEEP_NUM) // pipeline89._PRUNE_KEEP_DEN
    for r in rows:
        if r["min_kept_score"] is not None:
            assert r["min_kept_score"] <= r["max_score"]


def test_als_rank1_closed_form(spark):
    ev = (
        events_tbl(spark, SF)
        .filter(F.col("user_id").isNotNull() & F.col("event_type").isNotNull())
        .groupBy("user_id", "event_type")
        .count()
        .collect()
    )
    r: dict[tuple, int] = {(x["user_id"], x["event_type"]): x["count"] for x in ev}
    types = sorted({t for _, t in r})
    k = len(types)
    rowsum: dict[int, int] = {}
    for (u, _), c in r.items():
        rowsum[u] = rowsum.get(u, 0) + c
    s2 = sum(rs * rs for rs in rowsum.values())
    got = {x["event_type"]: x for x in pipeline89.als_rank1_round(spark, SF).collect()}
    assert set(got) == set(types)
    for t in types:
        s1 = sum(c * rowsum[u] for (u, tt), c in r.items() if tt == t)
        assert got[t]["s1"] == s1
        assert got[t]["s2"] == s2
        assert got[t]["k"] == k
        assert got[t]["item_factor"] == pytest.approx(
            round(k * s1 / s2, 6), abs=1e-9
        )
