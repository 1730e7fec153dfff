"""Independent-reference tests for the round-8 pipeline92 operators."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pandas as pd
import pytest

from messikinesisprovider_spark.operators import pipeline92

SF = "/root/testdata/sf0.001"


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _pairs_and_grams():
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs["text"].notna()]
    by_id = dict(zip(docs["doc_id"], docs["text"]))
    src_by_id = dict(zip(docs["doc_id"], docs["source"].fillna("")))
    pairs = []
    for d in docs["doc_id"]:
        if d % 2 == 0 and d + 1 in by_id:
            pairs.append((d // 2, src_by_id[d], by_id[d], by_id[d + 1]))
    return pairs


def _ngrams(text: str, n: int) -> Counter:
    toks = text.split(" ")
    return Counter(
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    )


def test_rouge_matches_python_replay(spark):
    pairs = _pairs_and_grams()
    per_src: dict[str, list[int]] = {}
    for _, src, cand, ref in pairs:
        acc = per_src.setdefault(src, [0, 0, 0])  # m2 ct2 rt2
        cg, rg = _ngrams(cand, 2), _ngrams(ref, 2)
        acc[0] += sum(min(c, rg.get(g, 0)) for g, c in cg.items())
        acc[1] += sum(cg.values())
        acc[2] += sum(rg.values())
    got = {r["source"]: r for r in pipeline92.eval_rouge_n_f1(spark, SF).collect()}
    for src, (m2, ct2, rt2) in per_src.items():
        row = got[src]
        assert (row["match2"], row["cand_total2"], row["ref_total2"]) == (m2, ct2, rt2)
        expect = 0.0 if ct2 + rt2 == 0 else 2.0 * m2 / (ct2 + rt2)
        assert row["rouge2_f1"] == pytest.approx(expect, abs=1e-12)


def test_dpo_pairs_match_python_replay(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs["text"].notna()].assign(
        src=lambda d: d["source"].fillna(""), lang=lambda d: d["lang"].fillna("")
    )
    got = sorted(
        (r["source"], r["lang"], r["pair_idx"], r["chosen_id"], r["rejected_id"], r["margin"])
        for r in pipeline92.dpo_pair_construction(spark, SF).collect()
    )
    expect = []
    for (src, lang), g in docs.groupby(["src", "lang"]):
        top = g.sort_values(["n_chars", "doc_id"], ascending=[False, True]).reset_index()
        bot = g.sort_values(["n_chars", "doc_id"], ascending=[True, False]).reset_index()
        for i in range(len(g) // 2):
            expect.append(
                (
                    src, lang, i + 1,
                    int(top.loc[i, "doc_id"]), int(bot.loc[i, "doc_id"]),
                    int(top.loc[i, "n_chars"] - bot.loc[i, "n_chars"]),
                )
            )
    assert got == sorted(expect)
