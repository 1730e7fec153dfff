"""Semantic tests for pipeline14 (exact AUC, association rules, exact
correlation moments, token PMI) against independent python references."""

import math
from collections import Counter

from messikinesisprovider_spark.operators import pipeline14
from messikinesisprovider_spark.operators.relational import tbl

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# eval_auc_exact
# ---------------------------------------------------------------------------


def _auc_ref(spark):
    """Brute-force O(n^2) pairwise AUC over the same quantized score."""
    rows = tbl(spark, SF, "embeddings").collect()
    scored = []
    for r in rows:
        if r["label"] is None or r["embedding"] is None or len(r["embedding"]) < 1:
            continue
        e1 = float(r["embedding"][0])
        if not (abs(e1) < 1e30):
            continue
        scored.append((math.floor(e1 * 10), 1 if r["label"] % 2 != 0 else 0))
    pos = [s for s, p in scored if p]
    neg = [s for s, p in scored if not p]
    num2 = 0
    for p in pos:
        for n in neg:
            if p > n:
                num2 += 2
            elif p == n:
                num2 += 1
    return len(scored), len(pos), len(neg), num2, 2 * len(pos) * len(neg)


def test_auc_matches_bruteforce_pairs(spark):
    n_scored, n_pos, n_neg, num2, den2 = _auc_ref(spark)
    row = pipeline14.eval_auc_exact(spark, SF).collect()[0]
    assert (row["n_scored"], row["n_pos"], row["n_neg"]) == (n_scored, n_pos, n_neg)
    assert (row["auc_num"], row["auc_den"]) == (num2, den2)
    assert row["auc"] == num2 / den2
    # a useful classifier axis or its inverse — sanity that labels/scores
    # are not degenerate on the synthetic corpus
    assert 0.0 <= row["auc"] <= 1.0


def test_auc_tie_credit_is_half():
    # pure-tie fixture logic: all scores equal -> AUC must be exactly 0.5
    # (num2 = n_pos*n_neg ties, den2 = 2*n_pos*n_neg)
    pos, neg = 3, 4
    num2 = pos * neg  # every pair tied, 1 credit each out of 2
    assert num2 / (2 * pos * neg) == 0.5


# ---------------------------------------------------------------------------
# assoc_rules_lift
# ---------------------------------------------------------------------------


def _baskets(spark):
    li = tbl(spark, SF, "lineitem").select("l_orderkey", "l_partkey").collect()
    op = {(r["l_orderkey"], r["l_partkey"]) for r in li}
    return op


def test_assoc_rules_match_python_mining(spark):
    op = _baskets(spark)
    item = Counter(p for _, p in op)
    n_baskets = len({o for o, _ in op})
    freq = {p for p, c in item.items() if c >= pipeline14._MIN_SUPPORT}
    fop = [(o, p) for o, p in op if p in freq]
    width = Counter(o for o, _ in fop)
    capped = [(o, p) for o, p in fop if width[o] <= pipeline14._MAX_BASKET]
    by_order = {}
    for o, p in capped:
        by_order.setdefault(o, []).append(p)
    pair = Counter()
    for parts in by_order.values():
        parts = sorted(parts)
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                pair[(parts[i], parts[j])] += 1
    rules = []
    for (a, b), n_ab in pair.items():
        if n_ab < pipeline14._MIN_SUPPORT:
            continue
        rules.append(
            (
                a,
                b,
                n_ab,
                item[a],
                item[b],
                n_baskets,
                (1000 * n_ab) // item[a],
                (1000 * n_ab) // item[b],
                (1000 * n_baskets * n_ab) // (item[a] * item[b]),
            )
        )
    rules.sort(key=lambda t: (-t[8], t[0], t[1]))
    want = rules[: pipeline14._RULES_TOPK]
    got = [
        tuple(r)
        for r in pipeline14.assoc_rules_lift(spark, SF)
        .select(
            "part_a", "part_b", "n_ab", "n_a", "n_b", "n_baskets",
            "conf_ab_pm", "conf_ba_pm", "lift_pm",
        )
        .collect()
    ]
    assert got == want
    # confidence can never exceed 1000 per-mille
    assert all(r[6] <= 1000 and r[7] <= 1000 for r in got)


# ---------------------------------------------------------------------------
# corr_pairs_exact
# ---------------------------------------------------------------------------


def test_corr_close_to_numpy_and_symmetric_inputs(spark):
    import numpy as np

    pdf = (
        tbl(spark, SF, "lineitem")
        .select(*pipeline14._CORR_MEASURES)
        .toPandas()
    )
    got = {r["pair"]: r for r in pipeline14.corr_pairs_exact(spark, SF).collect()}
    assert len(got) == 6
    for (x, y) in pipeline14._corr_pairs():
        r = got[f"{x}__{y}"]
        assert r["n"] == len(pdf)
        ref = np.corrcoef(pdf[x].to_numpy(), pdf[y].to_numpy())[0, 1]
        # moment sums are decimal-quantized at 1e-6 per term; corr agrees
        # with float64 numpy to well under that
        assert abs(r["corr"] - ref) < 1e-6, (x, y, r["corr"], ref)
        assert abs(r["sum_x"] - float(pdf[x].sum())) < 1e-3
        assert abs(r["sum_y"] - float(pdf[y].sum())) < 1e-3


# ---------------------------------------------------------------------------
# token_pmi_bigrams
# ---------------------------------------------------------------------------


def _tokens(text):
    return [t for t in text.lower().split(" ") if t != ""]


def test_pmi_matches_python_counts(spark):
    docs = tbl(spark, SF, "documents").select("text").collect()
    c2, cx, cy = Counter(), Counter(), Counter()
    total = 0
    for r in docs:
        if r["text"] is None:
            continue
        ts = _tokens(r["text"])
        for w1, w2 in zip(ts, ts[1:]):
            c2[(w1, w2)] += 1
            cx[w1] += 1
            cy[w2] += 1
            total += 1
    rows = []
    for (w1, w2), n_xy in c2.items():
        if n_xy < pipeline14._PMI_MIN_PAIR:
            continue
        rows.append(
            (
                w1,
                w2,
                n_xy,
                cx[w1],
                cy[w2],
                (1000 * total * n_xy) // (cx[w1] * cy[w2]),
            )
        )
    rows.sort(key=lambda t: (-t[5], t[0], t[1]))
    want = rows[: pipeline14._PMI_TOPK]
    got = [
        tuple(r)
        for r in pipeline14.token_pmi_bigrams(spark, SF)
        .select("w1", "w2", "n_xy", "n_x", "n_y", "pmi_lift_pm")
        .collect()
    ]
    assert got == want
    # int64 envelope documented in the module: 1000*N*c(xy) stays in range
    assert all(1000 * total * r[2] < 2**63 for r in got)
