"""Python-reference tests for pipeline95 (k-truss peel, JL projection
audit, Fellegi-Sunter match weights)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from messikinesisprovider_spark.operators.pipeline95 import (
    _EDGE_CK,
    _FS_M,
    _FS_MIN_AGREE,
    _JL_IN,
    _JL_OUT,
    _JL_R,
    _TRUSS_K,
    _TRUSS_ROUNDS,
    embedding_jl_distortion,
    er_fellegi_sunter,
    graph_ktruss_peel,
)

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


# --------------------------------------------------------------------------
# graph_ktruss_peel
# --------------------------------------------------------------------------


def _mine_edges(sf: str) -> set[tuple[int, int]]:
    li = pd.read_parquet(f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    op = li.drop_duplicates()
    freq = op.groupby("l_partkey").size()
    keep = set(freq[freq >= 2].index)
    op = op[op["l_partkey"].isin(keep)]
    pairs: dict[tuple[int, int], int] = {}
    for _, grp in op.groupby("l_orderkey"):
        parts = sorted(grp["l_partkey"])
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                key = (int(parts[i]), int(parts[j]))
                pairs[key] = pairs.get(key, 0) + 1
    return {k for k, n in pairs.items() if n >= 2}


def _truss_round(edges: set[tuple[int, int]]):
    """One peel: triangles of the current edge set, per-edge support,
    keep edges with support >= K-2. Returns (n_triangles, kept_edges)."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    sup: dict[tuple[int, int], int] = {}
    n_tri = 0
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # count each triangle once at its lowest edge
                n_tri += 1
                for e in ((a, b), (a, c), (b, c)):
                    sup[e] = sup.get(e, 0) + 1
    kept = {e for e in edges if sup.get(e, 0) >= _TRUSS_K - 2}
    return n_tri, kept


def test_ktruss_matches_python_reference(spark):
    out = {r["round"]: r for r in graph_ktruss_peel(spark, SF).collect()}
    edges = _mine_edges(SF)
    for rnd in range(1, _TRUSS_ROUNDS + 1):
        n_tri, edges = _truss_round(edges)
        assert out[rnd]["n_triangles"] == n_tri
        assert out[rnd]["n_edges"] == len(edges)
        assert out[rnd]["e_checksum"] == sum(a * _EDGE_CK + b for a, b in edges)


def test_ktruss_peels_and_is_nonvacuous(spark):
    rows = sorted(graph_ktruss_peel(spark, SF01).collect(), key=lambda r: r["round"])
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_edges"] <= prev["n_edges"]
        assert cur["n_triangles"] <= prev["n_triangles"]
    # the peel actually removes triangle-free edges at sf0.01
    assert rows[0]["n_edges"] > 0
    assert rows[-1]["n_edges"] < len(_mine_edges(SF01))


# --------------------------------------------------------------------------
# embedding_jl_distortion
# --------------------------------------------------------------------------


def test_jl_matches_numpy_reference(spark):
    out = {
        (r["label"], r["id_a"]): r
        for r in embedding_jl_distortion(spark, SF).collect()
    }
    assert out
    emb = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values("vec_id")
    R = np.asarray(_JL_R, dtype=np.float64)
    assert R.shape == (_JL_OUT, _JL_IN)
    by_label: dict[int, list] = {}
    for _, r in emb.iterrows():
        by_label.setdefault(int(r["label"]), []).append(
            (int(r["vec_id"]), np.asarray(r["embedding"], dtype=np.float64))
        )
    n_pairs = 0
    for label, rows in by_label.items():
        rows.sort()
        for (ia, xa), (ib, xb) in zip(rows, rows[1:]):
            n_pairs += 1
            got = out[(label, ia)]
            assert got["id_b"] == ib
            d_orig = float(((xa - xb) ** 2).sum())
            ya, yb = R @ xa, R @ xb
            d_proj = float(((ya - yb) ** 2).sum()) / _JL_OUT
            assert abs(got["dist_sq_orig"] - round(d_orig, 6)) < 1e-6
            assert abs(got["dist_sq_proj"] - round(d_proj, 6)) < 1e-6
            if d_orig > 0:
                assert abs(got["distortion"] - round(d_proj / d_orig, 6)) < 1e-6
    assert len(out) == n_pairs


def test_jl_distortion_concentrates(spark):
    """The JL promise on real data: distortions center on 1 and the mean
    deviation stays inside the k=16 concentration band (~1/sqrt(k))."""
    rows = [r["distortion"] for r in embedding_jl_distortion(spark, SF01).collect()
            if r["distortion"] is not None]
    assert len(rows) > 100
    mean = sum(rows) / len(rows)
    assert 0.8 < mean < 1.25
    # median deviation well under 2 standard JL sigmas
    devs = sorted(abs(x - 1.0) for x in rows)
    assert devs[len(devs) // 2] < 2.0 / math.sqrt(_JL_OUT)


# --------------------------------------------------------------------------
# er_fellegi_sunter
# --------------------------------------------------------------------------


def test_fs_matches_pandas_reference(spark):
    got = {
        (r["id_a"], r["id_b"]): r for r in er_fellegi_sunter(spark, SF).collect()
    }
    c = pd.read_parquet(f"{SF}/customer.parquet")
    rec = pd.DataFrame(
        {
            "id": c["c_custkey"].astype(int),
            "blk": c["c_nationkey"].astype(int),
            "f_seg": c["c_mktsegment"],
            "f_bal": np.floor(c["c_acctbal"] / 1000).astype(int),
            "f_cents": (np.round(c["c_acctbal"] * 100).astype(int)) % 100,
        }
    )
    # exact u estimation from within-block value frequencies
    pairs2 = sum(n * (n - 1) for n in rec.groupby("blk").size())
    u = {}
    for f in ("seg", "bal", "cents"):
        agree = sum(
            n * (n - 1) for n in rec.groupby(["blk", f"f_{f}"]).size()
        )
        u[f] = agree / pairs2
    expected = {}
    for _, blk in rec.groupby("blk"):
        recs = blk.sort_values("id").to_dict("records")
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                a, b = recs[i], recs[j]
                ag = {f: int(a[f"f_{f}"] == b[f"f_{f}"]) for f in _FS_M}
                if sum(ag.values()) < _FS_MIN_AGREE:
                    continue
                w = sum(
                    math.log2(m / u[f]) if ag[f] else math.log2((1 - m) / (1 - u[f]))
                    for f, m in _FS_M.items()
                )
                expected[(a["id"], b["id"])] = (ag, round(w, 6))
    assert set(got) == set(expected)
    assert expected
    for key, (ag, w) in expected.items():
        r = got[key]
        assert (r["ag_seg"], r["ag_bal"], r["ag_cents"]) == (
            ag["seg"],
            ag["bal"],
            ag["cents"],
        )
        assert abs(r["fs_weight"] - w) < 1e-6


def test_fs_weight_orders_by_agreement(spark):
    """Full agreement outranks any 2/3 agreement (log2(m/u) > 0 for every
    field on this fixture) and weights are finite."""
    rows = er_fellegi_sunter(spark, SF01).collect()
    assert rows
    full = [r["fs_weight"] for r in rows if r["ag_seg"] + r["ag_bal"] + r["ag_cents"] == 3]
    partial = [r["fs_weight"] for r in rows if r["ag_seg"] + r["ag_bal"] + r["ag_cents"] == 2]
    assert all(math.isfinite(w) for w in (full + partial))
    if full and partial:
        assert min(full) > max(partial)
