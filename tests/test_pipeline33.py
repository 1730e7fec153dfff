"""Python-reference tests for pipeline33: TF-IDF pair similarity, pass@k,
run-length encoding audit."""

from __future__ import annotations

import hashlib
from fractions import Fraction
from math import comb, sqrt

import pandas as pd
import pytest

from messikinesisprovider_spark.operators.pipeline33 import (
    _DF_CAP_ABS,
    _N_ATTEMPTS,
    _PASS_KS,
    _SUCCESS_MOD,
    _pass_table,
    encoding_runlength_audit,
    eval_pass_at_k,
    tfidf_topk_pairs,
)

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _tokens(text: str) -> list[str]:
    return [t for t in text.lower().split(" ") if t]


def test_tfidf_pairs_match_python_reference(spark):
    got = [(r["doc_a"], r["doc_b"], r["cos_sim"]) for r in tfidf_topk_pairs(spark, SF).collect()]
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs["text"].notna()]
    n_docs = len(docs)
    tf: dict[tuple[int, str], int] = {}
    for _, r in docs.iterrows():
        for t in _tokens(r["text"]):
            tf[(int(r["doc_id"]), t)] = tf.get((int(r["doc_id"]), t), 0) + 1
    df: dict[str, int] = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    cap = min(n_docs // 10, _DF_CAP_ABS)
    w = {
        (d, t): c * ((n_docs * 1000) // df[t])
        for (d, t), c in tf.items()
        if df[t] <= cap
    }
    norms: dict[int, float] = {}
    for (d, _), wv in w.items():
        norms[d] = norms.get(d, 0) + wv * wv
    norms = {d: sqrt(float(v)) for d, v in norms.items()}
    postings: dict[str, list[int]] = {}
    for (d, t) in w:
        postings.setdefault(t, []).append(d)
    dots: dict[tuple[int, int], int] = {}
    for t, ds in postings.items():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                key = (ds[i], ds[j])
                dots[key] = dots.get(key, 0) + w[(ds[i], t)] * w[(ds[j], t)]
    scored = sorted(
        (
            (-round(dot / (norms[a] * norms[b]), 6), a, b)
            for (a, b), dot in dots.items()
        )
    )[:50]
    expect = [(a, b, -s) for s, a, b in scored]
    assert got == expect


def test_pass_table_is_exact_rationals():
    for k in _PASS_KS:
        tab = _pass_table(k)
        for c in range(_N_ATTEMPTS + 1):
            frac = 1 - Fraction(comb(_N_ATTEMPTS - c, k), comb(_N_ATTEMPTS, k))
            assert float(tab[c]) == pytest.approx(float(frac), abs=5e-10)
        assert float(tab[0]) == 0.0  # zero successes -> pass@k = 0
        assert float(tab[_N_ATTEMPTS]) == 1.0  # all succeed -> pass@k = 1


def test_pass_at_k_matches_python_reference(spark):
    rows = {r["source"]: r for r in eval_pass_at_k(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs["source"] = docs["source"].fillna("")
    tabs = {k: [round(float(v) * 1e9) for v in _pass_table(k)] for k in _PASS_KS}
    for source, grp in docs.groupby("source"):
        cs = [
            sum(
                1
                for i in range(_N_ATTEMPTS)
                if _h60(f"{int(d)}|{i}") % _SUCCESS_MOD == 0
            )
            for d in grp["doc_id"]
        ]
        got = rows[source]
        assert got["n_tasks"] == len(grp)
        for k in _PASS_KS:
            mean = (sum(tabs[k][c] for c in cs) / 1e9) / len(cs)
            assert got[f"mean_pass_at_{k}"] == pytest.approx(mean, rel=1e-12)
        # pass@5 >= pass@1 always (more draws can only help)
        assert got["mean_pass_at_5"] >= got["mean_pass_at_1"]


def test_runlength_audit_matches_pandas_reference(spark):
    out = {r["day"].date(): r for r in encoding_runlength_audit(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["ts"].notna() & ev["event_type"].notna()].copy()
    ev["day"] = ev["ts"].dt.date
    for day, grp in ev.groupby("day"):
        grp = grp.sort_values(["ts", "event_id"])
        runs = int((grp["event_type"] != grp["event_type"].shift()).sum())
        got = out[day]
        assert got["n_rows"] == len(grp)
        assert got["n_runs"] == runs
        assert got["n_distinct"] == grp["event_type"].nunique()
        assert got["runlen_permille"] == (len(grp) * 1000) // runs
