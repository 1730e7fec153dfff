"""Semantic tests for pipeline16 (Markov transitions, survival life table,
Count-Min merge linearity) against sequential python references."""

from collections import Counter

from messikinesisprovider_spark.operators import pipeline16
from messikinesisprovider_spark.operators.relational import events_tbl

SF = "/root/testdata/sf0.001"

DAY_US = pipeline16._DAY_US


def _events(spark):
    import datetime

    def us(ts):
        return int(ts.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)

    return sorted(
        (
            (r["user_id"], us(r["ts"]), r["event_id"], r["event_type"])
            for r in events_tbl(spark, SF).collect()
            if r["user_id"] is not None and r["ts"] is not None
        ),
        key=lambda t: (t[0], t[1], t[2]),
    )


def test_markov_matches_sequential_fold(spark):
    evs = _events(spark)
    trans = Counter()
    prev_by_user = {}
    for user, _, _, et in evs:
        if user in prev_by_user:
            trans[(prev_by_user[user], et)] += 1
        prev_by_user[user] = et
    row_tot = Counter()
    for (src, _), n in trans.items():
        row_tot[src] += n
    got = {
        (r["src_type"], r["dst_type"]): (r["n"], r["n_src"], r["p_pm"])
        for r in pipeline16.markov_transitions(spark, SF).collect()
    }
    assert set(got) == set(trans)
    for (src, dst), n in trans.items():
        assert got[(src, dst)] == (n, row_tot[src], (1000 * n) // row_tot[src])
    # each source row's probabilities sum to ~1000 (floor-div loses < |dst|)
    by_src = Counter()
    for (src, _), (_, _, p) in got.items():
        by_src[src] += p
    for src, s in by_src.items():
        assert 1000 - 25 <= s <= 1000


def test_survival_life_table_matches_python(spark):
    evs = _events(spark)
    hi = max(e for _, e, _, _ in evs)
    t0, t1 = {}, {}
    for user, e, _, et in evs:
        if et == "click" and (user not in t0 or e < t0[user]):
            t0[user] = e
    for user, e, _, et in evs:
        if et == "purchase" and user in t0 and e >= t0[user]:
            if user not in t1 or e < t1[user]:
                t1[user] = e
    bins = Counter()
    events_in = Counter()
    for user, start in t0.items():
        if user in t1:
            b = (t1[user] - start) // DAY_US
            events_in[b] += 1
        else:
            b = (hi - start) // DAY_US
        bins[b] += 1
    got = {r["bin"]: r for r in pipeline16.survival_hazard_bins(spark, SF).collect()}
    assert set(got) == set(bins)
    total = sum(bins.values())
    for b in sorted(bins):
        at_risk = sum(n for bb, n in bins.items() if bb >= b)
        r = got[b]
        assert r["n_event"] == events_in[b]
        assert r["n_cens"] == bins[b] - events_in[b]
        assert r["n_at_risk"] == at_risk
        assert r["hazard_pm"] == (1000 * events_in[b]) // at_risk
    assert sum(r["n_event"] + r["n_cens"] for r in got.values()) == total == len(t0)


def test_countmin_merge_is_linear(spark):
    rows = pipeline16.sketch_countmin_merge(spark, SF).collect()
    assert len(rows) == pipeline16.CMM_TOPK
    for r in rows:
        # linearity: merged-by-addition sketch == directly-built sketch
        assert r["merged_equals_direct"] is True
        assert r["all_buckets_equal"] is True
        assert r["est_merged"] == r["est_direct"]
        # CMS invariant: never underestimates
        assert r["no_underestimate"] is True
        assert r["est_merged"] >= r["exact_c"]
