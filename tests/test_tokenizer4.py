"""Python reference for bpe_train_rounds (round 4): a literal greedy
left-to-right BPE trainer replay over 3 rounds, plus the repeated-token
edge the doubled-separator replace must get right."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from messikinesisprovider_spark.operators import tokenizer4

SF = "/root/testdata/sf0.001"
RS = "\x1e"


def greedy_merge(toks: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
            out.append(a + RS + b)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def replay(corpus: list[list[str]], rounds: int):
    reports = []
    for r in range(1, rounds + 1):
        counts = Counter()
        for ts in corpus:
            for i in range(len(ts) - 1):
                counts[(ts[i], ts[i + 1])] += 1
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        corpus = [greedy_merge(ts, a, b) for ts in corpus]
        reports.append((r, a, b, c, sum(len(ts) for ts in corpus)))
    return reports


def test_three_rounds_match_greedy_replay(spark):
    got = [
        (r["round"], r["merge_a"], r["merge_b"], r["pair_count"], r["tokens_after"])
        for r in tokenizer4.bpe_train_rounds(spark, SF).orderBy("round").collect()
    ]
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    corpus = [
        [w for w in t.lower().split(" ") if w != ""]
        for t in docs["text"]
        if t is not None
    ]
    corpus = [ts for ts in corpus if ts]
    expect = replay(corpus, tokenizer4._ROUNDS)
    assert got == expect
    # each merge strictly shrinks the corpus by its application count
    total0 = sum(len(ts) for ts in corpus)
    assert got[0][4] < total0
    for prev, cur in zip(got, got[1:]):
        assert cur[4] < prev[4]


def test_repeated_token_run_merges_floor_half(spark):
    """'x x x x x' under merge (x,x) must yield floor(5/2)=2 merges — the
    greedy-overlap case the doubled-separator replace encodes."""
    df = spark.createDataFrame([(1, "x x x x x")], "doc_id long, text string")
    df.createOrReplaceTempView("tmp_bpe_docs")
    # drive the same machinery through a one-doc frame
    from pyspark.sql import functions as F

    state = df.select(
        "doc_id",
        F.concat(
            F.lit(tokenizer4._SS),
            F.array_join(F.expr(tokenizer4._TOKS_SPARK), tokenizer4._SS),
            F.lit(tokenizer4._SS),
        ).alias("seq"),
    )
    merged = state.select(
        F.expr(
            f"replace(seq, concat('{tokenizer4._S}', 'x', '{tokenizer4._SS}', 'x', "
            f"'{tokenizer4._S}'), concat('{tokenizer4._S}', 'x', '{tokenizer4._RS}', "
            f"'x', '{tokenizer4._S}'))"
        ).alias("seq")
    ).collect()[0]["seq"]
    toks = [t for t in merged.split(tokenizer4._SS) if t != ""]
    assert toks == ["x" + RS + "x", "x" + RS + "x", "x"]
