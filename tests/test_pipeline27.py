"""Python references for pipeline27 (round 4): GDPR cascade, per-dim
standardization, windowed co-occurrence PMI."""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pandas as pd

from messikinesisprovider_spark.operators import pipeline27

SF = "/root/testdata/sf0.001"


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_gdpr_cascade_matches_pandas_reference(spark):
    got = {r["table_name"]: r for r in pipeline27.gdpr_delete_propagation(spark, SF).collect()}
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    forget = {
        k for k in cust["c_custkey"] if h60(str(k)) < pipeline27._FORGET_THRESH
    }
    purged_orders = set(orders[orders["o_custkey"].isin(forget)]["o_orderkey"])
    li_purged = li["l_orderkey"].isin(purged_orders)
    assert (got["customer"]["n_purged"], got["customer"]["n_retained"]) == (
        len(forget),
        len(cust) - len(forget),
    )
    assert got["customer"]["purged_key_checksum"] == sum(forget)
    assert got["orders"]["n_purged"] == len(purged_orders)
    assert got["orders"]["purged_key_checksum"] == sum(purged_orders)
    assert got["lineitem"]["n_purged"] == int(li_purged.sum())
    assert got["lineitem"]["purged_key_checksum"] == int(
        li.loc[li_purged, "l_orderkey"].sum()
    )
    # the audit must conserve rows per table
    for t, df in (("customer", cust), ("orders", orders), ("lineitem", li)):
        assert got[t]["n_purged"] + got[t]["n_retained"] == len(df) == got[t]["n_total"]
    assert len(forget) > 0  # the fixture actually forgets someone


def test_embedding_standardize_matches_numpy(spark):
    rows = pipeline27.embedding_standardize(spark, SF).collect()
    e = pd.read_parquet(f"{SF}/embeddings.parquet")
    mat = np.array(
        [v for v in e["embedding"] if v is not None and len(v) == 64],
        dtype=np.float64,
    )
    assert len(rows) == 64
    for r in rows:
        col = mat[:, r["dim"]]
        assert r["n_vals"] == len(col)
        # the engine quantizes terms to 1e-6 before the exact sum — numpy
        # float means agree within that quantization envelope
        assert abs(r["mean"] - col.mean()) < 2e-6
        assert abs(r["stddev"] - col.std()) < 2e-5


def test_cooccur_window_pmi_matches_python_replay(spark):
    out = pipeline27.cooccur_window_pmi(spark, SF).collect()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    pairs = Counter()
    marg = Counter()
    for t in docs["text"]:
        if t is None:
            continue
        ts = [w for w in t.lower().split(" ") if w != ""]
        for d in (1, 2):
            for i in range(len(ts) - d):
                a, b = ts[i], ts[i + d]
                w1, w2 = min(a, b), max(a, b)
                pairs[(w1, w2)] += 1
                marg[w1] += 1
                marg[w2] += 1
    n_total = sum(pairs.values())
    scored = [
        (1000 * n_total * c // (marg[w1] * marg[w2]), w1, w2, c)
        for (w1, w2), c in pairs.items()
        if c >= pipeline27._CW_MIN_PAIR
    ]
    scored.sort(key=lambda x: (-x[0], x[1], x[2]))
    expect = scored[: pipeline27._CW_TOPK]
    got = [(r["pmi_lift_pm"], r["w1"], r["w2"], r["n_ab"]) for r in out]
    assert got == expect
    assert len(got) == pipeline27._CW_TOPK
