"""Semantic tests for pipeline12 operators (exact-substring dedup, bloom
semi filter) against from-scratch python references."""

import collections

import pytest

from messikinesisprovider_spark.operators import pipeline12

SF = "/root/testdata/sf0.001"
W = pipeline12.SUBSTR_W


def _ref_exact_substring(docs):
    """Naive reference: count W-gram occurrences corpus-wide, then per doc
    merge the duplicated-span intervals and measure their union length."""
    grams = collections.Counter()
    toks = {}
    for doc_id, text in docs:
        if text is None:
            continue
        tk = text.split(" ")
        if len(tk) < W:
            continue
        toks[doc_id] = tk
        for i in range(len(tk) - W + 1):
            grams[" ".join(tk[i : i + W])] += 1
    out = {}
    for doc_id, tk in toks.items():
        n_spans = len(tk) - W + 1
        dup_pos = [i for i in range(n_spans) if grams[" ".join(tk[i : i + W])] > 1]
        covered = set()
        for i in dup_pos:
            covered.update(range(i, i + W))
        out[doc_id] = (len(tk), n_spans, len(dup_pos), len(covered))
    return out


def test_exact_substring_matches_python_reference(spark):
    docs = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]
    want = _ref_exact_substring(docs)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_spans"], r["n_dup_spans"], r["dup_tokens"])
        for r in pipeline12.dedup_exact_substring(spark, SF).collect()
    }
    assert got == want
    assert any(v[3] > 0 for v in got.values()), "corpus should contain duplicated spans"


def test_exact_substring_interval_merge_on_planted_overlap(spark, tmp_path):
    # Two docs sharing one 10-token run: every contained 8-gram duplicates,
    # and the merged interval must cover exactly the shared 10 tokens.
    shared = " ".join(f"s{i}" for i in range(10))
    a = "a0 a1 a2 " + shared + " a3 a4"
    b = "b0 " + shared + " b1 b2 b3"
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(1, a, "en", "web", len(a)), (2, b, "en", "web", len(b))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(p)
    got = {
        r["doc_id"]: (r["n_dup_spans"], r["dup_tokens"])
        for r in pipeline12.dedup_exact_substring(spark, str(tmp_path)).collect()
    }
    # 10-token shared run -> 3 duplicated 8-grams per doc, merged to 10 tokens
    assert got == {1: (3, 10), 2: (3, 10)}


def _h60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_bloom(dim_keys, probe_keys):
    m = pipeline12.BLOOM_WORDS * pipeline12.BLOOM_BPW
    bits = set()
    for k in dim_keys:
        for j in range(pipeline12.BLOOM_K):
            bits.add(_h60(f"{k}:{j}") % m)
    passes = {
        k
        for k in probe_keys
        if all(_h60(f"{k}:{j}") % m in bits for j in range(pipeline12.BLOOM_K))
    }
    true = set(probe_keys) & set(dim_keys)
    n_probed, n_true, n_pass = len(probe_keys), len(true), len(passes)
    n_fp = len(passes - true)
    n_missed = len(true - passes)
    return (n_probed, n_true, n_pass, n_fp, n_missed)


def test_bloom_semi_filter_matches_python_reference(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    dim = [r["c_custkey"] for r in cust.where("c_mktsegment = 'BUILDING'").collect()]
    probe = {r["o_custkey"] for r in orders.select("o_custkey").distinct().collect()}
    want = _ref_bloom(dim, probe)
    row = pipeline12.bloom_semi_filter(spark, SF).collect()[0]
    got = (row["n_probed"], row["n_true"], row["n_pass_bloom"], row["n_false_pos"], row["n_missed"])
    assert got == want
    assert row["n_missed"] == 0, "bloom filters never miss a true member"
    assert row["n_true"] > 0


def _lev(a, b):
    if abs(len(a) - len(b)) > 3:
        return 99
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_entity_resolution_matches_naive_reference(spark):
    """Naive reference: all-pairs lev<=1 over distinct names + union-find,
    entities propagated back to records. The Ed-Join signature filter must
    not lose a single pair (guaranteed recall), so results are identical."""
    rows = spark.read.parquet(f"{SF}/part.parquet").select("p_partkey", "p_name").collect()
    names = {}
    for r in rows:
        names.setdefault(r["p_name"], []).append(r["p_partkey"])
    reps = {n: min(ks) for n, ks in names.items()}
    parent = {r: r for r in reps.values()}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    dl = list(reps.items())
    for i in range(len(dl)):
        for j in range(i + 1, len(dl)):
            (na, ra), (nb, rb) = dl[i], dl[j]
            if len(na) >= pipeline12.ER_MIN_LEN and len(nb) >= pipeline12.ER_MIN_LEN:
                if _lev(na, nb) <= pipeline12.ER_LEV:
                    pa, pb = find(ra), find(rb)
                    if pa != pb:
                        parent[max(pa, pb)] = min(pa, pb)
    # min-id canonical label per component
    label = {r: min(x for x in parent if find(x) == find(r)) for r in parent}
    want = {}
    for n, ks in names.items():
        ent = label[reps[n]]
        for k in ks:
            want[k] = ent
    got = {
        r["key"]: (r["entity_id"], r["n_members"])
        for r in pipeline12.entity_resolution_e2e(spark, SF).collect()
    }
    sizes = collections.Counter(want.values())
    assert {k: v[0] for k, v in got.items()} == want
    assert all(v[1] == sizes[v[0]] for v in got.values())
    assert any(s > 1 for s in sizes.values()), "duplicate names must merge"
    assert len(sizes) > 1, "distinct products must stay separate entities"


def test_stream_stream_left_flushes_tail_unmatched(spark):
    """The regression the sentinel design exists for: clicks inside the last
    7 days of the stream have no later watermark to evict them, so without
    the sentinel they would never emit null-padded. Assert that unmatched
    rows include clicks from the final 7-day tail."""
    import datetime

    from messikinesisprovider_spark.streaming.verified4 import streaming_stream_stream_left

    out = streaming_stream_stream_left(spark, SF).toPandas()
    unmatched = out[out["purchase_event_id"].isna()]
    assert len(unmatched) > 0
    from messikinesisprovider_spark.operators.relational import events_tbl

    ev = events_tbl(spark, SF)
    clicks = {
        r["event_id"]: r
        for r in ev.where("event_type = 'click'").collect()
    }
    max_ts = max(r["ts"] for r in clicks.values())
    tail = [
        cid
        for cid in unmatched["click_event_id"]
        if clicks[int(cid)]["ts"] > max_ts - datetime.timedelta(days=7)
    ]
    assert tail, "tail-of-stream unmatched clicks must flush via the sentinel"


def test_bloom_probe_is_broadcast(spark):
    plan = pipeline12.bloom_semi_filter(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
