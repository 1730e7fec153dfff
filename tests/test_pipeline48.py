"""Python references for pipeline48 (round 4): malformed-JSONL
quarantine, late-arriving dimension resolution."""

from __future__ import annotations

import pandas as pd

from messikinesisprovider_spark.operators import pipeline48

SF = "/root/testdata/sf0.001"


def test_quarantine_matches_python_buckets(spark):
    rows = {r["bucket"]: r for r in pipeline48.ingest_jsonl_quarantine(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    corrupt = docs[docs["doc_id"] % pipeline48._CORRUPT_MOD == 0]
    good = docs[docs["doc_id"] % pipeline48._CORRUPT_MOD != 0]
    q = rows["<quarantine>"]
    assert q["n_docs"] == len(corrupt)
    assert q["id_checksum"] == corrupt["doc_id"].sum()  # ids RECOVERED from raw text
    assert q["char_checksum"] == 0
    for src, grp in good.groupby(good["source"].fillna("<null>")):
        r = rows[src]
        assert r["n_docs"] == len(grp)
        assert r["id_checksum"] == grp["doc_id"].sum()
        assert r["char_checksum"] == sum(len(t) if isinstance(t, str) else 0 for t in grp["text"])
    assert len(corrupt) > 0  # the malformed path is non-vacuous


def test_late_dim_transitions_match_python(spark):
    got = {r["priority"]: r for r in pipeline48.late_arriving_dim_resolution(spark, SF).collect()}
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = set(pd.read_parquet(f"{SF}/customer.parquet")["c_custkey"])
    ontime = {c for c in cust if c % 10 != 3}
    late = {c for c in cust if c % 10 == 3 and c % 3 != 0}
    tot = {"n_inferred": 0, "n_recovered_late": 0, "n_never_resolved": 0}
    for pr, grp in orders.groupby("o_orderpriority"):
        r = got[pr]
        hit1 = grp["o_custkey"].isin(ontime)
        hit2 = ~hit1 & grp["o_custkey"].isin(late)
        assert r["n_facts"] == len(grp)
        assert r["n_resolved_initial"] == hit1.sum()
        assert r["n_inferred"] == (~hit1).sum()
        assert r["n_recovered_late"] == hit2.sum()
        assert r["n_never_resolved"] == (~hit1 & ~hit2).sum()
        assert r["inferred_key_checksum"] == grp["o_custkey"][~hit1].sum()
        for k in tot:
            tot[k] += r[k]
    # every transition class is populated — the pattern is non-vacuous
    assert all(v > 0 for v in tot.values()), tot
    # conservation: inferred = recovered + never
    for r in got.values():
        assert r["n_inferred"] == r["n_recovered_late"] + r["n_never_resolved"]
