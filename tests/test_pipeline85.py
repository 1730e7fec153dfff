"""Python-reference tests for pipeline85 (time-bounded funnel + embedding
centroid distances)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pandas as pd

from messikinesisprovider_spark.operators.pipeline85 import (
    _FUNNEL_TOL_S,
    _Q,
    embedding_source_centroid_dist,
    funnel_time_bounded,
)

SF = "/root/testdata/sf0.001"


def test_funnel_time_bounded_matches_python(spark):
    out = {r["user_id"]: r for r in funnel_time_bounded(spark, SF).collect()}
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    ).dropna(subset=["user_id", "ts"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    expect: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    last_view: dict[int, pd.Timestamp] = {}
    last_qcart: dict[int, pd.Timestamp] = {}
    for r in ev.itertuples():
        if r.event_type == "view":
            last_view[r.user_id] = r.ts
        elif r.event_type == "cart":
            lv = last_view.get(r.user_id)
            if lv is not None and (r.ts - lv).total_seconds() <= _FUNNEL_TOL_S:
                last_qcart[r.user_id] = r.ts
        elif r.event_type == "purchase":
            expect[r.user_id][0] += 1
            qc = last_qcart.get(r.user_id)
            if qc is not None and (r.ts - qc).total_seconds() <= _FUNNEL_TOL_S:
                expect[r.user_id][1] += 1
    assert set(out) == set(expect)
    for uid, (np_, nc) in expect.items():
        assert (out[uid]["n_purchases"], out[uid]["n_converted"]) == (np_, nc)


def test_centroid_distances_match_numpy(spark):
    rows = embedding_source_centroid_dist(spark, SF).collect()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "source"])
    j = emb.merge(docs, left_on="vec_id", right_on="doc_id").dropna(
        subset=["source", "embedding"]
    )
    cents = {}
    for src, grp in j.groupby("source"):
        mat = np.round(
            np.stack(grp["embedding"].to_numpy()).astype("float64") * _Q
        )
        cents[src] = mat.mean(axis=0)
    assert len(rows) == len(cents) * (len(cents) - 1) // 2
    for r in rows:
        d = math.sqrt(((cents[r["source_a"]] - cents[r["source_b"]]) ** 2).sum()) / _Q
        assert abs(r["centroid_dist"] - d) < 1e-5
        assert r["source_a"] < r["source_b"]
