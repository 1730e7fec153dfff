"""Python references for pipeline47 (round 4): bag set-ops, span
corruption, URL canonicalization."""

from __future__ import annotations

import hashlib
from collections import Counter

import pandas as pd

from messikinesisprovider_spark.operators import pipeline47

SF = "/root/testdata/sf0.001"


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_bag_set_ops_matches_counter_arithmetic(spark):
    rows = {(r["op"], r["p"]): r["n"] for r in pipeline47.bag_set_ops_all(spark, SF).collect()}
    o = pd.read_parquet(f"{SF}/orders.parquet")
    a = Counter(o[o["o_orderkey"] % 2 == 1]["o_orderpriority"])
    b = Counter(o[o["o_orderkey"] % 2 == 0]["o_orderpriority"])
    expect = {}
    for p in set(a) | set(b):
        if min(a[p], b[p]) > 0:
            expect[("intersect_all", p)] = min(a[p], b[p])
        if a[p] - b[p] > 0:
            expect[("a_except_all_b", p)] = a[p] - b[p]
        if b[p] - a[p] > 0:
            expect[("b_except_all_a", p)] = b[p] - a[p]
    assert rows == expect
    # bag semantics are non-vacuous: some multiplicity exceeds 1
    assert max(rows.values()) > 1


def test_span_corruption_matches_python(spark):
    got = {r["source"]: r for r in pipeline47.span_corruption_masking(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    agg: dict[str, list[int]] = {}
    for _, d in docs.iterrows():
        src = d["source"] if pd.notna(d["source"]) else "<null>"
        text = d["text"]
        if text is None or (isinstance(text, float) and pd.isna(text)):
            continue
        toks = [t for t in text.split(" ") if t != ""]
        if not toks:
            continue
        st = agg.setdefault(src, [0, 0, 0, 0, 0, 0])
        st[0] += 1
        st[1] += len(toks)
        prev = False
        for i, t in enumerate(toks, start=1):
            m = h60(f"msk|{d['doc_id']}|{i}") % pipeline47._MASK_DENOM == 0
            if m:
                st[2] += 1
                if not prev:
                    st[3] += 1
                st[4] += len(t)
                st[5] += h60(t) % pipeline47._CK_MOD
            prev = m
    for src, (nd, nt, nm, ns, tc, ck) in agg.items():
        r = got[src]
        assert (
            r["n_docs"], r["n_tokens"], r["n_masked"], r["n_spans"],
            r["target_chars"], r["masked_checksum"],
        ) == (nd, nt, nm, ns, tc, ck), src
    assert set(got) == set(agg)
    # spans < masked somewhere: adjacent masks actually collapsed
    assert any(r["n_spans"] < r["n_masked"] for r in got.values())


def _canon(url: str) -> str:
    noq = url.split("?")[0]
    after = noq[noq.index("://") + 3 :]
    host, sep, path = after.partition("/")
    host = host.lower()
    if host.startswith("www."):
        host = host[4:]
    joined = "https://" + host + sep + path
    return joined[:-1] if joined.endswith("/") else joined


def test_url_canonicalize_matches_python(spark):
    rows = {r["n_variants"]: r for r in pipeline47.url_canonicalize_dedup(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    canon = Counter()
    for doc_id in docs["doc_id"]:
        raw = (
            "HTTPS://"
            + ("WWW." if doc_id % 3 == 0 else "")
            + f"Example{doc_id % 7}.COM/Path/{doc_id % 50}"
            + ("/" if doc_id % 4 == 0 else "")
            + (f"?utm_source=x&sid={doc_id % 11}" if doc_id % 5 == 0 else "")
        )
        canon[_canon(raw)] += 1
    hist = Counter(canon.values())
    assert {k: r["n_canonicals"] for k, r in rows.items()} == dict(hist)
    for k, r in rows.items():
        expect_ck = sum(
            h60(c) % pipeline47._CK_MOD for c, n in canon.items() if n == k
        )
        assert r["canon_checksum"] == expect_ck
    # the collapse is real: fewer canonicals than docs
    assert sum(canon.values()) == len(docs) and len(canon) < len(docs)
