"""Python-reference tests for pipeline34: t-closeness TVD, calibration
ECE, BPE corpus encoding."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from messikinesisprovider_spark.operators.pipeline34 import (
    _MERGES,
    bpe_encode_corpus,
    eval_calibration_ece,
    t_closeness_audit,
)

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _bucket(bal: float) -> str:
    return "neg" if bal < 0 else ("low" if bal < 5000 else "high")


def test_tcloseness_matches_python_reference(spark):
    out = {(r["seg"], r["nat"]): r for r in t_closeness_audit(spark, SF).collect()}
    c = pd.read_parquet(f"{SF}/customer.parquet")
    c = c[c["c_mktsegment"].notna() & c["c_nationkey"].notna() & c["c_acctbal"].notna()]
    c = c.assign(s=[_bucket(b) for b in c["c_acctbal"]])
    n = len(c)
    glob = c.groupby("s").size().to_dict()
    for (seg, nat), grp in c.groupby(["c_mktsegment", "c_nationkey"]):
        n_g = len(grp)
        counts = grp.groupby("s").size().to_dict()
        num = sum(
            abs(counts.get(s, 0) * n - n_s * n_g) for s, n_s in glob.items()
        )
        got = out[(seg, nat)]
        assert got["n_g"] == n_g
        assert got["tvd_num"] == num
        assert got["tvd"] == pytest.approx(num / (2.0 * n_g * n), rel=1e-12)
        assert got["within_t"] == (1000 * num <= 250 * 2 * n_g * n)
        assert 0.0 <= got["tvd"] <= 1.0


def test_ece_matches_python_reference(spark):
    rows = {r["bin"]: r for r in eval_calibration_ece(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    bins: dict[int, list[int]] = {}
    for d in docs["doc_id"]:
        sm = _h60(f"{int(d)}|s") % 1000
        lb = 1 if _h60(f"{int(d)}|l") % 3 == 0 else 0
        bins.setdefault(sm // 100, []).append((sm, lb))
    total_n = sum(len(v) for v in bins.values())
    total_gap = sum(
        abs(1000 * sum(l for _, l in v) - sum(s for s, _ in v)) for v in bins.values()
    )
    for b, v in bins.items():
        got = rows[b]
        assert got["n_preds"] == len(v)
        assert got["confidence"] == pytest.approx(
            sum(s for s, _ in v) / (1000 * len(v)), rel=1e-12
        )
        assert got["accuracy"] == pytest.approx(
            sum(l for _, l in v) / len(v), rel=1e-12
        )
        assert got["ece"] == pytest.approx(total_gap / (1000 * total_n), rel=1e-12)


def _greedy_merge(tokens: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == a and tokens[i + 1] == b:
            out.append(a + "\x1e" + b)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def test_bpe_encode_matches_greedy_python(spark):
    out = {r["source"]: r for r in bpe_encode_corpus(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs["text"].notna()].copy()
    docs["source"] = docs["source"].fillna("")
    for source, grp in docs.groupby("source"):
        before = after = 0
        for text in grp["text"]:
            toks = [t for t in text.lower().split(" ") if t]
            before += len(toks)
            for a, b in _MERGES:
                toks = _greedy_merge(toks, a, b)
            after += len(toks)
        if before == 0:
            assert source not in out
            continue
        got = out[source]
        assert got["tokens_before"] == before
        assert got["tokens_after"] == after
        assert got["merges_applied"] == before - after
        assert got["compression_permille"] == (1000 * after) // before


def test_bpe_encode_is_nonvacuous(spark):
    """The fixed vocabulary actually fires on the corpus."""
    total = sum(r["merges_applied"] for r in bpe_encode_corpus(spark, SF).collect())
    assert total > 0
