"""Python references for pipeline68 (round 4): try_* surface and cycle
time."""

from __future__ import annotations

import numpy as np
import pandas as pd

from messikinesisprovider_spark.operators import pipeline68

SF = "/root/testdata/sf0.001"


def test_try_functions_match_pandas(spark):
    r = pipeline68.ansi_try_functions(spark, SF).collect()[0]
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["rv"] = np.floor(ev["value"] + 0.5).astype("int64")
    n = len(ev)
    div_null = int((ev["rv"] == 0).sum())
    cast_ok = 0
    for p in ev["props"]:
        if p is None:
            continue
        try:
            int(str(p).strip())
            cast_ok += 1
        except ValueError:
            pass
    add_overflow = int((ev["rv"] > 0).sum())
    assert r["n_rows"] == n
    assert (r["div_ok"], r["div_null"]) == (n - div_null, div_null)
    assert r["cast_ok"] == cast_ok
    assert (r["add_ok"], r["add_overflow"]) == (n - add_overflow, add_overflow)
    # every failure class is non-vacuously exercised
    assert r["div_null"] > 0 and r["add_overflow"] > 0
    assert r["cast_ok"] < n  # free-text props mostly don't parse


def test_cycle_time_median_matches_pandas(spark):
    rows = {pd.Timestamp(r["month"]): r for r in
            pipeline68.cycle_time_p50_monthly(spark, SF).collect()}
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    ms = li.groupby("l_orderkey")["l_shipdate"].max()
    j = orders.merge(ms.rename("maxship"), left_on="o_orderkey", right_index=True)
    j["days"] = (
        (j[["maxship", "o_orderdate"]].max(axis=1).dt.floor("D") - j["o_orderdate"].dt.floor("D"))
        .dt.days
    )
    j["month"] = j["o_orderdate"].dt.to_period("M").dt.start_time
    for month, g in j.groupby("month"):
        vals = sorted(zip(g["days"], g["o_orderkey"]))
        n = len(vals)
        # lower-median rule: first row where 2*cum >= n
        p50 = vals[(n - 1) // 2][0]
        r = rows[pd.Timestamp(month)]
        assert (r["n_orders"], r["p50_days"]) == (n, p50)
    assert set(rows) == {pd.Timestamp(m) for m in j["month"].unique()}
