"""Python reference for pipeline60 (round 4): Matryoshka truncation recall."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from messikinesisprovider_spark.operators import pipeline60
from messikinesisprovider_spark.operators.similarity import N_QUERIES, TOP_K

SF = "/root/testdata/sf0.001"


def _topk(vs: dict[int, np.ndarray], dims: int | None):
    out = {}
    for qid, qv in vs.items():
        if qid >= N_QUERIES:
            continue
        q = qv if dims is None else qv[:dims]
        qn = math.sqrt(float((q * q).sum()))
        scored = []
        for cid, cv in vs.items():
            if cid == qid:
                continue
            c = cv if dims is None else cv[:dims]
            cn = math.sqrt(float((c * c).sum()))
            cos = round(float((q * c).sum()) / (qn * cn), 6)
            scored.append((-cos, cid))
        scored.sort()
        out[qid] = {cid for _, cid in scored[:TOP_K]}
    return out


def test_matryoshka_recall_matches_numpy(spark):
    got = {r["query_id"]: r for r in
           pipeline60.embedding_matryoshka_recall(spark, SF).collect()}
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    vs = {}
    for vid, v in zip(emb["vec_id"], emb["embedding"]):
        a = np.asarray(v, dtype=np.float64)
        if (a * a).sum() > 0 and (a[: pipeline60._TRUNC] ** 2).sum() > 0:
            vs[int(vid)] = a
    full = _topk(vs, None)
    trunc = _topk(vs, pipeline60._TRUNC)
    assert set(got) == set(full)
    recalls = []
    for qid in full:
        overlap = len(full[qid] & trunc[qid])
        r = got[qid]
        assert (r["k"], r["overlap_at_k"]) == (TOP_K, overlap)
        assert abs(r["recall_at_k"] - overlap / TOP_K) < 1e-15
        recalls.append(overlap / TOP_K)
    # truncation loses SOME quality (non-vacuous eval) but not everything
    assert 0 < sum(recalls) / len(recalls) < 1
