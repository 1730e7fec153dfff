"""Semantic tests for the corpus-curation operators (operators/curation.py).

The DuckDB parity harness verifies cross-engine value equality; these tests
pin the *semantics* — packing invariants, rule consistency, score ordering —
that a hash match alone can't express.
"""

import math

from pyspark.sql import functions as F

from messikinesisprovider_spark.operators import curation

SF = "/root/testdata/sf0.001"


def test_gopher_rules_conjunction_consistent(spark):
    rows = curation.quality_gopher_rules(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["passes"] == (r["word_count_ok"] and r["mean_len_ok"] and r["stop_ok"])
        assert 0.0 <= r["stop_frac"] <= 1.0
        # synthetic corpus words are 1..8 chars, so the mean must be sane
        assert 1.0 <= r["mean_word_len"] <= 10.0


def test_pack_sequences_bins_are_contiguous_and_full(spark):
    bins = curation.pack_sequences(spark, SF).collect()
    by_source = {}
    for r in bins:
        by_source.setdefault(r["source"], []).append(r)
    for source, rs in by_source.items():
        rs.sort(key=lambda r: r["bin_id"])
        # bin ids are dense from 0
        assert [r["bin_id"] for r in rs] == list(range(len(rs)))
        # every bin except the last crosses the budget boundary: contiguous
        # packing only opens bin k+1 once bin k has reached the budget
        for r in rs[:-1]:
            assert r["bin_tokens"] >= curation.PACK_BUDGET - 0  # boundary crossed
            assert r["fill_ratio"] >= 1.0
        # token conservation: sum over bins == sum over docs
    total_binned = sum(r["bin_tokens"] for r in bins)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    total_docs = docs.select(
        F.sum(F.size(F.split("text", " ")).cast("bigint"))
    ).collect()[0][0]
    assert total_binned == total_docs


def test_source_mixing_weights_temperature_flattens(spark):
    rows = curation.source_mixing_weights(spark, SF).collect()
    shares = {r["source"]: r["token_share"] for r in rows}
    weights = {r["source"]: r["temp_weight_unnorm"] for r in rows}
    assert abs(sum(shares.values()) - 1.0) < 1e-9
    for s in shares:
        assert math.isclose(weights[s], math.sqrt(shares[s]), rel_tol=1e-12)
    # alpha=0.5 flattens: the weight ratio between the largest and smallest
    # source is strictly smaller than the share ratio
    hi, lo = max(shares, key=shares.get), min(shares, key=shares.get)
    if shares[hi] > shares[lo]:
        assert weights[hi] / weights[lo] < shares[hi] / shares[lo]


def test_term_salience_prefers_rare_terms(spark):
    rows = curation.term_salience_topk(spark, SF).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in by_doc.items():
        assert len(rs) <= 3
        rs.sort(key=lambda r: r["rnk"])
        # ranking matches the declared (score desc, term asc) order
        keys = [(-r["score_ppm"], r["term"]) for r in rs]
        assert keys == sorted(keys)
        for r in rs:
            assert r["score_ppm"] == r["tf"] * 1_000_000 // r["df"]


def test_chunk_fraction_bounds_and_self_consistency(spark):
    rows = curation.dedup_chunk_fraction(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_words = {
        r["doc_id"]: r["nw"]
        for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("nw")
        ).collect()
    }
    for r in rows:
        assert 0 <= r["n_dup_chunks"] <= r["n_chunks"]
        assert r["n_chunks"] == n_words[r["doc_id"]] // curation.CHUNK_WORDS
        expected = r["n_dup_chunks"] / r["n_chunks"]
        assert math.isclose(r["dup_frac"], expected, rel_tol=1e-12)


def test_lang_gini_matches_python(spark):
    rows = curation.source_lang_diversity(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    counts = {}
    for r in docs.groupBy("source", "lang").count().collect():
        counts.setdefault(r["source"], []).append(r["count"])
    for r in rows:
        ns = counts[r["source"]]
        total = sum(ns)
        gini = 1.0 - sum(n * n for n in ns) / (total * total)
        assert r["n_docs"] == total
        assert r["n_langs"] == len(ns)
        assert math.isclose(r["lang_gini"], gini, rel_tol=1e-12)


def test_quantize_int8_roundtrip_error_small(spark):
    rows = curation.embedding_quantize_int8(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        # 8-bit symmetric quantization: per-element error <= step/2 where
        # step = amax/127, so MSE <= (amax/254)^2
        assert r["mse"] <= (r["amax"] / 254.0) ** 2 + 1e-12
        assert 0 < r["n_nonzero"] <= 64


def test_keep_canonical_verdict_consistent(spark):
    from messikinesisprovider_spark.operators.dedup import dedup_ngram_jaccard

    verdict = {r["doc_id"]: r for r in curation.dedup_keep_canonical(spark, SF).collect()}
    pairs = dedup_ngram_jaccard(spark, SF).select("doc_a", "doc_b").collect()
    # every near-dup pair ends up in one component, and exactly the
    # component minimum is kept
    comps = {}
    for did, r in verdict.items():
        comps.setdefault(r["component"], []).append(did)
    for comp, members in comps.items():
        assert comp == min(members)
        for m in members:
            assert verdict[m]["keep"] == (m == comp)
    for p in pairs:
        assert verdict[p["doc_a"]]["component"] == verdict[p["doc_b"]]["component"]


def test_vocab_coverage_monotone_and_bounded(spark):
    rows = sorted(curation.vocab_coverage(spark, SF).collect(), key=lambda r: r["rnk"])
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    freqs = [r["freq"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    shares = [r["cum_share"] for r in rows]
    assert all(0 < s <= 1.0 for s in shares)
    assert shares == sorted(shares)
    # cum_freq really is the running sum of freq
    cum = 0
    for r in rows:
        cum += r["freq"]
        assert r["cum_freq"] == cum


def test_embedding_dim_stats_matches_numpy(spark):
    import numpy as np

    rows = {r["dim"]: r for r in curation.embedding_dim_stats(spark, SF).collect()}
    vecs = np.array(
        [
            r["embedding"]
            for r in spark.read.parquet(f"{SF}/embeddings.parquet")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    assert set(rows) == set(range(1, vecs.shape[1] + 1))
    for d in rows:
        col = vecs[:, d - 1]
        assert rows[d]["n"] == len(col)
        # moments are computed on 6-decimal quantized values: tolerance 1e-5
        assert abs(rows[d]["mean"] - col.mean()) < 1e-5
        assert abs(rows[d]["var_pop"] - col.var()) < 1e-4
        assert math.isclose(rows[d]["min_x"], col.min(), rel_tol=1e-6)
        assert math.isclose(rows[d]["max_x"], col.max(), rel_tol=1e-6)


def test_oov_rate_consistent_with_vocab(spark):
    from collections import Counter

    rows = {r["doc_id"]: r for r in curation.text_oov_rate(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text").collect()
    freq = Counter()
    for d in docs:
        freq.update(d["text"].split(" "))
    vocab = {
        t
        for t, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[
            : curation.VOCAB_TOP_N
        ]
    }
    for d in docs:
        words = d["text"].split(" ")
        oov = sum(1 for w in words if w not in vocab)
        r = rows[d["doc_id"]]
        assert r["n_words"] == len(words)
        assert r["n_oov"] == oov
        assert math.isclose(r["oov_rate"], oov / len(words), rel_tol=1e-12)
