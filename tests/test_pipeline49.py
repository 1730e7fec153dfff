"""Python references for pipeline49 (round 4): quantile normalization,
business-day arithmetic, null-safe join."""

from __future__ import annotations

from datetime import date

import pandas as pd

from messikinesisprovider_spark.operators import pipeline49

SF = "/root/testdata/sf0.001"


def test_quantile_normalize_matches_pandas(spark):
    rows = {
        (r["event_type"], r["bucket"]): r
        for r in pipeline49.quantile_bucket_normalize(spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()]
    q = pipeline49._QN_BUCKETS
    buckets: dict[tuple[str, int], list[float]] = {}
    for et, grp in ev.groupby("event_type"):
        vals = [v for v, _ in sorted(zip(grp["value"], grp["event_id"]), key=lambda t: (t[0], t[1]))]
        n = len(vals)
        for i, v in enumerate(vals):
            buckets.setdefault((et, (i * q) // n), []).append(v)
    target: dict[int, list[float]] = {}
    for (et, b), vals in buckets.items():
        target.setdefault(b, []).extend(vals)
    for (et, b), vals in buckets.items():
        r = rows[(et, b)]
        assert r["n_vals"] == len(vals)
        assert abs(r["group_mean"] - sum(vals) / len(vals)) < 1e-9
        tv = target[b]
        assert abs(r["target_mean"] - sum(tv) / len(tv)) < 1e-9
    assert set(rows) == set(buckets)
    # normalization is non-trivial: group means differ from targets somewhere
    assert any(abs(r["group_mean"] - r["target_mean"]) > 1e-9 for r in rows.values())


def _bizdays(d1: date, d2: date) -> int:
    n = 0
    e1, e2 = d1.toordinal(), d2.toordinal()
    for e in range(e1 + 1, e2 + 1):
        if date.fromordinal(e).weekday() < 5:
            n += 1
    return n


def test_business_days_matches_python_calendar(spark):
    rows = {r["bizdays"]: r for r in pipeline49.business_days_ship_delay(spark, SF).collect()}
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")[["o_orderkey", "o_orderdate"]]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j = j[pd.to_datetime(j["l_shipdate"]) >= pd.to_datetime(j["o_orderdate"])]
    expect: dict[int, list[int]] = {}
    for _, r in j.iterrows():
        bd = _bizdays(
            pd.to_datetime(r["o_orderdate"]).date(), pd.to_datetime(r["l_shipdate"]).date()
        )
        expect.setdefault(bd, []).append(int(r["l_orderkey"]) % 1000003)
    assert sorted(rows) == sorted(expect)
    for bd, keys in expect.items():
        assert rows[bd]["n_items"] == len(keys)
        assert rows[bd]["key_checksum"] == sum(keys)
    # weekend exclusion is non-vacuous: some span has bizdays < calendar days
    assert any(bd > 5 for bd in expect)


def test_null_safe_join_pairs_null_group(spark):
    rows = {r["k"]: r for r in pipeline49.null_safe_key_join(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    a = docs.assign(k=docs.apply(lambda r: None if r["doc_id"] % 11 == 0 else r["source"], axis=1))
    b = docs.assign(k=docs.apply(lambda r: None if r["doc_id"] % 7 == 0 else r["source"], axis=1))
    ag = a.groupby("k", dropna=False).agg(n=("doc_id", "size"), ck=("doc_id", "sum"))
    bg = b.groupby("k", dropna=False).agg(n=("doc_id", "size"), ck=("doc_id", "sum"))
    for k, r in rows.items():
        ka = k if k is not None else float("nan")
        assert (r["n_a"], r["ck_a"]) == (ag.loc[ka, "n"], ag.loc[ka, "ck"])
        assert (r["n_b"], r["ck_b"]) == (bg.loc[ka, "n"], bg.loc[ka, "ck"])
    # the NULL group actually joined (the semantic under test)
    assert None in rows
    assert len(rows) == len(ag)
