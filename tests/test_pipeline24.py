"""Semantic tests for the PCA power-iteration step."""

from decimal import ROUND_HALF_UP, Decimal

import numpy as np

from messikinesisprovider_spark.operators import pipeline24
from messikinesisprovider_spark.operators.relational import tbl

SF = "/root/testdata/sf0.001"


def _q6(x: float) -> Decimal:
    return Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)


def test_power_step_matches_sequential_reference(spark):
    vecs = [
        [float(x) for x in r["embedding"]]
        for r in tbl(spark, SF, "embeddings").collect()
        if r["embedding"] is not None and len(r["embedding"]) == 64
    ]
    w0 = pipeline24._W0
    dots = []
    for v in vecs:
        d = 0.0
        for x, w in zip(v, w0):
            d += x * float(w)  # same ascending fold
        dots.append(d)
    y_ref = [sum(_q6(v[d] * dot) for v, dot in zip(vecs, dots)) for d in range(64)]
    ray_ref = sum(_q6(dot * dot) for dot in dots)
    rows = {r["dim"]: r for r in pipeline24.embedding_pca_power_iter(spark, SF).collect()}
    assert set(rows) == set(range(1, 65))
    max_abs = max(abs(float(y)) for y in y_ref)
    for d in range(64):
        r = rows[d + 1]
        assert r["y"] == float(y_ref[d])
        assert r["w0_scaled"] == float(w0[d])
        assert r["w_next"] == float(y_ref[d]) / max_abs
        assert r["rayleigh_num"] == float(ray_ref)
        assert r["psd_ok"] is True
        assert r["n_vectors"] == len(vecs)


def test_power_step_amplifies_dominant_direction(spark):
    """After one step, the iterate must align better with the true top
    eigenvector of X^T X than the random start did (the property the power
    method exists for)."""
    vecs = np.array(
        [
            [float(x) for x in r["embedding"]]
            for r in tbl(spark, SF, "embeddings").collect()
            if r["embedding"] is not None and len(r["embedding"]) == 64
        ]
    )
    a = vecs.T @ vecs
    eigvals, eigvecs = np.linalg.eigh(a)
    top = eigvecs[:, -1]
    w0 = np.array(pipeline24._W0, dtype=float)
    rows = {r["dim"]: r for r in pipeline24.embedding_pca_power_iter(spark, SF).collect()}
    w1 = np.array([rows[d]["w_next"] for d in range(1, 65)])
    cos0 = abs(w0 @ top) / np.linalg.norm(w0)
    cos1 = abs(w1 @ top) / np.linalg.norm(w1)
    assert cos1 > cos0
