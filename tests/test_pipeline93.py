"""Independent-reference tests for the round-8 pipeline93 operators."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import pandas as pd
import pytest

from messikinesisprovider_spark.operators import pipeline93

SF = "/root/testdata/sf0.001"


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_kneser_ney_matches_python_replay(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    cb: Counter = Counter()
    for t in docs["text"].dropna():
        toks = t.split(" ")
        for a, b in zip(toks, toks[1:]):
            cb[(a, b)] += 1
    c1: Counter = Counter()
    n1_fwd: Counter = Counter()
    n1_bwd: Counter = Counter()
    for (a, b), c in cb.items():
        c1[a] += c
        n1_fwd[a] += 1
        n1_bwd[b] += 1
    D = len(cb)
    top = sorted(cb.items(), key=lambda kv: (-kv[1], kv[0]))[: pipeline93._KN_TOPK]
    got = pipeline93.ngram_lm_kneser_ney(spark, SF).collect()
    assert len(got) == len(top)
    for row, ((w1, w2), c) in zip(
        sorted(got, key=lambda r: (-r["c"], r["w1"], r["w2"])), top
    ):
        assert (row["w1"], row["w2"], row["c"]) == (w1, w2, c)
        assert row["c1"] == c1[w1] and row["n1_fwd"] == n1_fwd[w1]
        assert row["n1_bwd"] == n1_bwd[w2] and row["d_bigrams"] == D
        pk = max(4 * c - 3, 0) / (4 * c1[w1]) + (3 * n1_fwd[w1] * n1_bwd[w2]) / (
            4 * c1[w1] * D
        )
        import math

        assert row["p_kn"] == pytest.approx(
            math.floor(pk * 1e6 + 0.5) / 1e6, abs=1e-9
        )


def test_dynamic_session_matches_interval_union(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["ts"].notna()]
    got = sorted(
        (
            r["user_id"],
            pd.Timestamp(r["session_start"]),
            pd.Timestamp(r["session_end"]),
            r["n_events"],
        )
        for r in pipeline93.session_window_dynamic_gap(spark, SF).collect()
    )
    expect = []
    gap = {
        True: pd.Timedelta(seconds=pipeline93._GAP_LONG_S),
        False: pd.Timedelta(seconds=pipeline93._GAP_SHORT_S),
    }
    for uid, g in ev.groupby("user_id", dropna=False):
        rows = sorted(
            (pd.Timestamp(r.ts), gap[r.event_type == "purchase"]) for r in g.itertuples()
        )
        cur = None
        for ts, gp in rows:
            end = ts + gp
            if cur is None or ts >= cur[1]:  # half-open: equality starts anew
                if cur:
                    expect.append((uid, cur[0], cur[1], cur[2]))
                cur = [ts, end, 1]
            else:
                cur[1] = max(cur[1], end)
                cur[2] += 1
        if cur:
            expect.append((uid, cur[0], cur[1], cur[2]))
    def key(t):
        return (float("inf") if pd.isna(t[0]) else t[0], t[1], t[2], t[3])
    assert sorted(got, key=key) == sorted(
        [(None if pd.isna(u) else int(u), s, e, n) for u, s, e, n in expect], key=key
    )


def test_cdc_chunks_match_python_replay(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    W, MOD, MINL = pipeline93._CDC_WIN, pipeline93._CDC_MOD, pipeline93._CDC_MIN_LEN
    pows = [31 ** (W - 1 - k) for k in range(W)]
    occ: dict[int, list] = defaultdict(list)  # chunk_h -> (doc, len)
    for r in docs.itertuples():
        t = r.text
        if t is None or len(t) < W:
            continue
        cuts = {0, len(t)}
        for i in range(W, len(t) + 1):
            h = sum(ord(t[i - W + k]) * pows[k] for k in range(W))
            if h % MOD == 0:
                cuts.add(i)
        cuts = sorted(cuts)
        for a, b in zip(cuts, cuts[1:]):
            chunk = t[a:b]
            if len(chunk) >= MINL:
                occ[h60(chunk)].append((r.doc_id, len(chunk)))
    expect = {
        h: (min(l for _, l in v), len({d for d, _ in v}), len(v))
        for h, v in occ.items()
        if len({d for d, _ in v}) >= 2
    }
    got = {
        r["chunk_h"]: (r["clen"], r["n_docs"], r["n_occ"])
        for r in pipeline93.dedup_cdc_chunks(spark, SF).collect()
    }
    assert expect, "no duplicate chunks at this SF — the signal is vacuous"
    assert got == expect


def test_rbo_matches_python_replay(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs.assign(lang=docs["lang"].fillna(""))
    got = {r["lang"]: r for r in pipeline93.eval_rank_biased_overlap(spark, SF).collect()}
    D, W = pipeline93._RBO_DEPTH, pipeline93._RBO_W
    for lang, g in docs.groupby("lang"):
        ids = list(g["doc_id"])
        ra = {d: i + 1 for i, d in enumerate(
            sorted(ids, key=lambda d: (-h60(f"{int(d)}|score"), d)))}
        rb = {d: i + 1 for i, d in enumerate(
            sorted(ids, key=lambda d: (-h60(f"{int(d)}|score2"), d)))}
        rbo = 0.0
        for depth in range(1, D + 1):
            o = sum(1 for d in ids if ra[d] <= depth and rb[d] <= depth)
            rbo += W[depth - 1] * (o / depth)
            if depth == D:
                assert got[lang][f"overlap_at_{D}"] == o
        assert got[lang]["n_docs"] == len(ids)
        assert got[lang][f"rbo_at_{D}"] == pytest.approx(round(rbo, 6), abs=1e-9)
