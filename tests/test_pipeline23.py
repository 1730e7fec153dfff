"""Semantic tests for pipeline23 (rolling median, lang-id confusion)."""

from collections import Counter

from messikinesisprovider_spark.operators import pipeline23
from messikinesisprovider_spark.operators.relational import events_tbl
from messikinesisprovider_spark.operators.text import text_lang_id

SF = "/root/testdata/sf0.001"


def test_rolling_median_matches_sequential_fold(spark):
    evs = sorted(
        (
            (r["user_id"], r["ts"], r["event_id"], r["value"])
            for r in events_tbl(spark, SF).collect()
            if r["user_id"] is not None and r["ts"] is not None and r["value"] is not None
        ),
        key=lambda t: (t[0], t[1], t[2]),
    )
    want = {}
    hist = {}
    for u, ts, eid, v in evs:
        h = hist.setdefault(u, [])
        h.append(v)
        frame = sorted(h[-pipeline23.ROLL_K:])
        want[eid] = (len(frame), frame[(len(frame) + 1) // 2 - 1])
    got = {
        r["event_id"]: (r["n_in_frame"], r["rolling_median"])
        for r in pipeline23.rolling_median_k(spark, SF).collect()
    }
    assert got == want and len(got) > 0
    # the median is always an element of the frame (discrete, no
    # interpolation) — already guaranteed by the reference equality, but
    # assert the headline property directly too
    vals = {v for _, _, _, v in evs}
    assert all(m in vals for _, m in got.values())


def test_confusion_matrix_aggregates_langid_exactly(spark):
    pred = [
        (r["labeled_lang"] or "unk", r["predicted_lang"])
        for r in text_lang_id(spark, SF).collect()
    ]
    cells = Counter(pred)
    n_total = len(pred)
    n_correct = sum(n for (t, p), n in cells.items() if t == p)
    row_tot = Counter()
    for (t, _), n in cells.items():
        row_tot[t] += n
    got = {
        (r["labeled_lang"], r["predicted_lang"]): r
        for r in pipeline23.langid_confusion_matrix(spark, SF).collect()
    }
    assert set(got) == set(cells)
    for key, n in cells.items():
        r = got[key]
        assert r["n"] == n
        assert r["n_labeled"] == row_tot[key[0]]
        assert r["recall_pm"] == (1000 * n) // row_tot[key[0]]
        assert r["accuracy_pm"] == (1000 * n_correct) // n_total
    # the stopword heuristic scores ~0.35 on this synthetic corpus (many
    # short docs carry no stopwords -> 'unk') — the confusion matrix is
    # doing its job by revealing that; pin above-chance, not optimism
    assert n_correct / n_total > 0.25
