"""Semantic tests for the round-3d operators (pipeline4.py).

Cross-engine value equality is the parity harness's job; these pin the
semantics against python references and the scale-relevant plan shapes:
SemDeDup verdict consistency with the exact cosine baseline, the bigram-LM
score against a hand computation, unpivot totals against direct aggregation,
EWMA against a sequential python fold (including NULL-value gaps), and
no-row-UDF / single-shuffle plan checks.
"""

import math

import pytest
from pyspark.sql import functions as F

from messikinesisprovider_spark.operators import pipeline4
from messikinesisprovider_spark.operators.dedup import EMBED_COS_THRESHOLD

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# semdedup_cells
# ---------------------------------------------------------------------------


def test_semdedup_partitions_every_vector_once(spark):
    rows = pipeline4.semdedup_cells(spark, SF).collect()
    n_nonzero = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter(F.expr("aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * x), 0D, (a, x) -> a + x)") > 0)
        .count()
    )
    assert len(rows) == n_nonzero
    assert len({r["vec_id"] for r in rows}) == len(rows)
    for r in rows:
        assert r["is_dup"] == (r["dup_of"] is not None)
        if r["dup_of"] is not None:
            assert r["dup_of"] < r["vec_id"]


def test_semdedup_dups_have_cosine_above_threshold(spark):
    # Every (vec, dup_of) verdict must be backed by an exact cosine >= the
    # threshold: SemDeDup's in-cell candidates are a SUBSET of the exact
    # all-pairs baseline, never an addition to it.
    emb = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    for r in pipeline4.semdedup_cells(spark, SF).collect():
        if r["dup_of"] is None:
            continue
        a, b = emb[r["vec_id"]], emb[r["dup_of"]]
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(x) ** 2 for x in b))
        assert dot / (na * nb) >= EMBED_COS_THRESHOLD - 1e-9


def test_semdedup_planted_near_duplicate_is_caught(spark, tmp_path):
    # A vector and its tiny perturbation always share a cell (assignment is
    # by distance) and exceed any reasonable cosine threshold.
    import random

    rnd = random.Random(7)
    base = [rnd.gauss(0, 1) for _ in range(64)]
    near = [x + 1e-4 for x in base]
    far = [[rnd.gauss(0, 1) for _ in range(64)] for _ in range(30)]
    rows = [(0, [float(x) for x in base], 0), (1, [float(x) for x in near], 0)] + [
        (i + 2, [float(x) for x in v], 1) for i, v in enumerate(far)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    got = {r["vec_id"]: r for r in pipeline4.semdedup_cells(spark, str(tmp_path)).collect()}
    assert got[1]["dup_of"] == 0 and got[1]["is_dup"]
    assert not got[0]["is_dup"]


# ---------------------------------------------------------------------------
# ngram_lm_score
# ---------------------------------------------------------------------------


def _flog2(n: int) -> int:
    return n.bit_length() - 1


def test_ngram_lm_score_matches_python_reference(spark, tmp_path):
    texts = {
        1: "the cat sat on the mat",
        2: "the cat sat",
        3: "zebra quark",  # rare bigram -> low (but not impossible) score
        4: "solo",  # one token: no bigrams -> excluded
        5: None,  # NULL text -> excluded
    }
    spark.createDataFrame(
        [(i, t, "en", "s", len(t or "")) for i, t in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    # python reference: corpus-wide bigram counts, per-doc integer score
    bigrams = {}
    prefixes = {}
    doc_bgs = {}
    for i, t in texts.items():
        toks = [w for w in (t or "").lower().split(" ") if w]
        bgs = list(zip(toks, toks[1:]))
        doc_bgs[i] = bgs
        for b in bgs:
            bigrams[b] = bigrams.get(b, 0) + 1
            prefixes[b[0]] = prefixes.get(b[0], 0) + 1
    expect = {
        i: sum(_flog2(bigrams[b]) - _flog2(prefixes[b[0]]) for b in bgs)
        for i, bgs in doc_bgs.items()
        if bgs
    }

    got = {r["doc_id"]: r for r in pipeline4.ngram_lm_score(spark, str(tmp_path)).collect()}
    assert set(got) == set(expect)
    for i, s in expect.items():
        assert got[i]["score_log2"] == s
        assert got[i]["n_bigrams"] == len(doc_bgs[i])
        assert got[i]["keep"] == (s * 1000 >= pipeline4.LM_THRESH_MILLI * len(doc_bgs[i]))


def test_ngram_lm_plan_has_no_python_udfs(spark):
    plan = pipeline4.ngram_lm_score(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# unpivot_measures
# ---------------------------------------------------------------------------


def test_unpivot_totals_match_direct_aggregation(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    direct = li.groupBy("l_returnflag").agg(
        *[F.sum(F.col(m).cast("decimal(18,6)")).cast("double").alias(m) for m in pipeline4._MEASURES]
    )
    want = {
        (r["l_returnflag"], m): r[m] for r in direct.collect() for m in pipeline4._MEASURES
    }
    got = {
        (r["l_returnflag"], r["measure"]): r["total"]
        for r in pipeline4.unpivot_measures(spark, SF).collect()
    }
    assert got == want


def test_unpivot_plan_is_expand_no_join(spark):
    plan = pipeline4.unpivot_measures(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# ewma_user_value
# ---------------------------------------------------------------------------


def test_ewma_matches_sequential_python_fold(spark, tmp_path):
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    series = [10.0, 20.0, None, 40.0, 50.0, 60.0, 70.0, 80.0, 90.0, 100.0]
    rows = [
        (i, t0 + datetime.timedelta(minutes=i), 7, "click", v, "{}")
        for i, v in enumerate(series)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    W = pipeline4._EWMA_W
    from decimal import Decimal

    def ref(idx):
        num = Decimal(0)
        den = 0
        for i, w in enumerate(W):
            j = idx - i
            if j < 0:
                break
            if series[j] is None:
                continue
            num += Decimal(str(series[j])) * w
            den += w
        return float(num) / den if den else None

    got = {r["event_id"]: r["ewma"] for r in pipeline4.ewma_user_value(spark, str(tmp_path)).collect()}
    for i in range(len(series)):
        want = ref(i)
        if want is None:
            assert got[i] is None
        else:
            assert got[i] == pytest.approx(want, abs=1e-12)


def test_ewma_single_shuffle_on_user(spark):
    plan = pipeline4.ewma_user_value(spark, SF)._jdf.queryExecution().executedPlan().toString()
    # exactly one exchange: the hash partitioning on user_id feeding the window
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(user_id" in plan
    assert plan.count("Window") == 1  # all K lags evaluate in ONE window node
