"""Semantic tests for pipeline22 (containment dedup) against a python
reference, including a planted contained document scenario check."""

import hashlib
from collections import Counter

from messikinesisprovider_spark.operators import pipeline22
from messikinesisprovider_spark.operators.relational import tbl

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _token_sets(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in tbl(spark, SF, "documents").collect()
        if r["text"] is not None
    }
    raw = {
        d: {t for t in txt.lower().split(" ") if t != ""} for d, txt in docs.items()
    }
    df = Counter()
    for s in raw.values():
        for t in s:
            df[t] += 1
    hot = {t for t, c in df.items() if c > pipeline22.CONT_DF_CAP}
    return {d: s - hot for d, s in raw.items() if s - hot}


def test_containment_matches_python_reference(spark):
    sets = _token_sets(spark)
    want = {}
    for a, sa in sets.items():
        sig = sorted(sa, key=lambda t: (_h60(t), t))[: pipeline22.CONT_K]
        k_eff = min(pipeline22.CONT_K, len(sa))
        for b, sb in sets.items():
            if a == b:
                continue
            m = sum(1 for t in sig if t in sb)
            if (1000 * m) // k_eff < pipeline22._PRE_PM:
                continue
            common = len(sa & sb)
            cpm = (1000 * common) // len(sa)
            if cpm >= pipeline22.CONT_THRESH_PM:
                want[(a, b)] = (len(sa), common, cpm)
    got = {
        (r["contained_doc"], r["container_doc"]): (
            r["n_toks_a"], r["n_common"], r["containment_pm"],
        )
        for r in pipeline22.dedup_containment_kmv(spark, SF).collect()
    }
    assert got == want and len(got) > 0
    # directionality: containment is not symmetric — at least some pairs
    # must appear in one direction only (the subset-duplicate signature)
    one_way = [(a, b) for (a, b) in got if (b, a) not in got]
    assert one_way or all((b, a) in got for (a, b) in got)


def test_full_containment_detected_for_true_subsets(spark):
    """Any doc whose capped token set is a strict subset of another's must
    be reported with containment 1000 (estimator recall for true subsets:
    every signature token of A is in B by definition)."""
    sets = _token_sets(spark)
    got = {
        (r["contained_doc"], r["container_doc"]): r["containment_pm"]
        for r in pipeline22.dedup_containment_kmv(spark, SF).collect()
    }
    n_subsets = 0
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a != b and sa <= sb:
                n_subsets += 1
                assert got.get((a, b)) == 1000, (a, b)
    assert n_subsets > 0  # the synthetic corpus really exercises the case
