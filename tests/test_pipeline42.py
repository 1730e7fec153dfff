"""Python references for pipeline42 (round 4): recursive CTE closure,
LATERAL top-k, timezone local-calendar rollup."""

from __future__ import annotations

from zoneinfo import ZoneInfo

import pandas as pd

from messikinesisprovider_spark.operators import pipeline42

SF = "/root/testdata/sf0.001"


def test_recursive_cte_bom_matches_python_climb(spark):
    got = {r["depth"]: r for r in pipeline42.recursive_cte_bom(spark, SF).collect()}
    parts = pd.read_parquet(f"{SF}/part.parquet")["p_partkey"].tolist()
    per_depth: dict[int, list[tuple[int, int]]] = {}
    for p in parts:
        cur, depth = p, 0
        while cur >= 4:
            cur //= 4
            depth += 1
        per_depth.setdefault(depth, []).append((p, cur))
    assert sorted(got) == sorted(per_depth)
    for d, pairs in per_depth.items():
        assert got[d]["n_parts"] == len(pairs)
        assert got[d]["n_roots"] == len({root for _, root in pairs})
        assert got[d]["node_checksum"] == sum(node for node, _ in pairs)
        assert got[d]["root_checksum"] == sum(root for _, root in pairs)
    # roots are only ever 0..3 — the closure actually terminated at roots
    assert all(1 <= r["n_roots"] <= 4 for r in got.values())


def test_lateral_topk_matches_pandas_nlargest(spark):
    rows = pipeline42.lateral_topk_join(spark, SF).collect()
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    got: dict[str, list[tuple[int, float]]] = {}
    for r in rows:
        got.setdefault(r["n_name"], []).append((r["c_custkey"], r["c_acctbal"]))
    expect: dict[str, list[tuple[int, float]]] = {}
    for _, n in nat.iterrows():
        sub = cust[cust["c_nationkey"] == n["n_nationkey"]].sort_values(
            by=["c_acctbal", "c_custkey"], ascending=[False, True]
        )
        top = [(int(k), float(b)) for k, b in zip(sub["c_custkey"], sub["c_acctbal"])][
            : pipeline42._LATERAL_K
        ]
        if top:
            expect[n["n_name"]] = top
    assert {k: sorted(v) for k, v in got.items()} == {
        k: sorted(v) for k, v in expect.items()
    }


def test_tz_local_activity_matches_zoneinfo(spark):
    rows = pipeline42.tz_local_activity(spark, SF).collect()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["ts"] = pd.to_datetime(ev["ts"])
    got = {(r["tz"], pd.Timestamp(r["local_date"])): (r["n_events"], r["value_sum"]) for r in rows}
    for tz in pipeline42._TZS:
        zone = ZoneInfo(tz)
        local = ev["ts"].dt.tz_localize("UTC").dt.tz_convert(zone).dt.normalize().dt.tz_localize(None)
        counts = local.value_counts()
        assert len(counts), tz
        for day, n in counts.items():
            assert got[(tz, pd.Timestamp(day))][0] == n
    # the half-hour zone must produce a local-date split different from UTC
    utc_days = set(ev["ts"].dt.normalize())
    ktm_days = {d for (tz, d) in got if tz == "Asia/Kathmandu"}
    assert ktm_days  # non-vacuous
    # every zone covers all its events
    total = sum(n for (tz, _), (n, _) in got.items() if tz == "Asia/Tokyo")
    assert total == len(ev)
    assert utc_days  # sanity
