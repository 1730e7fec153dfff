"""Semantic tests for pipeline13 (SCD2 history, point-in-time join, weighted
Bernoulli sampling) against sequential python references."""

import hashlib
import math

from messikinesisprovider_spark.operators import pipeline13
from messikinesisprovider_spark.operators.relational import events_tbl

SF = "/root/testdata/sf0.001"


def _events(spark):
    return sorted(
        (
            (r["user_id"], r["ts"], r["event_id"], r["value"], r["event_type"])
            for r in events_tbl(spark, SF).collect()
            if r["user_id"] is not None
        ),
        key=lambda t: (t[0], t[1], t[2]),
    )


def _tier(value):
    return None if value is None else math.floor(value / pipeline13.TIER_BAND)


def _ref_versions(evs):
    """user -> [(version, tier, valid_from, n_events)] via a sequential fold."""
    out = {}
    for user, ts, eid, value, _etype in evs:
        vs = out.setdefault(user, [])
        t = _tier(value)
        if not vs or vs[-1][1] != t:
            vs.append([len(vs) + 1, t, ts, 1])
        else:
            vs[-1][3] += 1
    return out


def test_scd2_matches_sequential_fold(spark):
    evs = _events(spark)
    ref = _ref_versions(evs)
    want = {}
    for user, vs in ref.items():
        for i, (ver, tier, vfrom, n) in enumerate(vs):
            vto = vs[i + 1][2] if i + 1 < len(vs) else None
            want[(user, ver)] = (tier, vfrom, vto, n, vto is None)
    got = {
        (r["user_id"], r["version"]): (
            r["tier"],
            r["valid_from"],
            r["valid_to"],
            r["n_events"],
            r["is_current"],
        )
        for r in pipeline13.scd2_history(spark, SF).collect()
    }
    assert got == want
    assert any(v[3] > 1 for v in want.values()), "change-collapse must fire"


def test_pit_join_matches_sequential_scan(spark):
    evs = _events(spark)
    ref = _ref_versions(evs)
    want = {}
    for user, ts, eid, _value, etype in evs:
        if etype != "click":
            continue
        cur = None
        for ver, tier, vfrom, _n in ref[user]:
            if vfrom <= ts:
                cur = (ver, tier)
        want[eid] = cur
    got = {
        r["click_event_id"]: (r["version_at_click"], r["tier_at_click"])
        for r in pipeline13.pit_join_scd2(spark, SF).collect()
    }
    assert got == want
    assert got, "clicks exist at sf0.001"


def test_weighted_bernoulli_matches_hash_reference(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    want = set()
    for r in docs:
        w = max(0, min(r["n_chars"] or 0, pipeline13.WB_MAX_W)) if r["n_chars"] is not None else None
        if w is None:
            continue
        h = int(hashlib.md5(f"wbs:{r['doc_id']}".encode()).hexdigest()[:15], 16)
        if h < w * pipeline13.WB_C:
            want.add(r["doc_id"])
    got = {r["doc_id"] for r in pipeline13.sample_weighted_bernoulli(spark, SF).collect()}
    assert got == want
    assert 0 < len(got) < len(docs), "sample is nontrivial"
    # longer docs must be overrepresented relative to their population share
    kept_mean = sum(r["n_chars"] for r in docs if r["doc_id"] in got) / len(got)
    pop_mean = sum(r["n_chars"] for r in docs) / len(docs)
    assert kept_mean > pop_mean
