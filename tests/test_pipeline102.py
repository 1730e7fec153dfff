"""Python-reference tests for pipeline102 (KNN-Shapley data valuation)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from messikinesisprovider_spark.operators.pipeline102 import (
    _DS_K,
    _DS_NQ,
    _DS_T,
    data_shapley_knn,
)

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_shapley() -> pd.DataFrame:
    e = pd.read_parquet(f"{SF}/embeddings.parquet")
    e = e[e["label"].notna()].reset_index(drop=True)
    e["hk"] = e["vec_id"].map(lambda i: _h60(f"dsq|{int(i)}"))
    q = e.sort_values(["hk", "vec_id"]).head(_DS_NQ)
    X = np.stack(e["embedding"].to_numpy()).astype(np.float64)
    rows = []
    for _, t in q.iterrows():
        qx = np.asarray(t["embedding"], dtype=np.float64)
        mask = e["vec_id"] != t["vec_id"]
        train = e[mask].copy()
        d = ((X[mask.to_numpy()] - qx) ** 2).sum(axis=1)
        train["dist"] = d
        train = train.sort_values(["dist", "vec_id"]).head(_DS_T).reset_index(drop=True)
        same = (train["label"] == t["label"]).astype(int).to_numpy()
        n = len(train)
        s = np.zeros(n)
        s[n - 1] = same[n - 1] / n
        for m in range(n - 2, -1, -1):
            j = m + 1  # 1-based rank of element m
            s[m] = s[m + 1] + (same[m] - same[m + 1]) * min(_DS_K, j) / (_DS_K * j)
        for m in range(n):
            rows.append(
                (
                    int(t["vec_id"]),
                    int(train["vec_id"][m]),
                    m + 1,
                    bool(same[m]),
                    round(float(train["dist"][m]), 6),
                    round(float(s[m]), 6),
                )
            )
    return pd.DataFrame(
        rows,
        columns=["test_id", "train_id", "rnk", "same_label", "dist_sq", "shapley_value"],
    )


def test_knn_shapley_matches_python_reference(spark):
    got = (
        data_shapley_knn(spark, SF)
        .toPandas()
        .sort_values(["test_id", "rnk"])
        .reset_index(drop=True)
    )
    exp = _py_shapley().sort_values(["test_id", "rnk"]).reset_index(drop=True)
    assert len(got) == len(exp) == _DS_NQ * _DS_T
    for col in ["test_id", "train_id", "rnk", "same_label"]:
        assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col
    assert np.allclose(got["dist_sq"], exp["dist_sq"], atol=1e-6)
    assert np.allclose(got["shapley_value"], exp["shapley_value"], atol=1e-9)


def test_knn_shapley_efficiency_within_neighborhood(spark):
    """Values over the T-neighborhood sum to the truncated utility
    (fraction of same-label points among the K nearest), and sign tracks
    label agreement at the top ranks."""
    got = data_shapley_knn(spark, SF).toPandas()
    for test_id, g in got.groupby("test_id"):
        g = g.sort_values("rnk")
        util = g.head(_DS_K)["same_label"].mean()
        assert abs(g["shapley_value"].sum() - util) < 1e-4
    # the recurrence gives disagreeing neighbors non-positive value
    top = got[got["rnk"] <= _DS_K]
    assert (top.loc[~top["same_label"], "shapley_value"] <= 1e-9).all()
