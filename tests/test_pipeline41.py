"""Python-reference test for the bucketed cogroup reconcile."""

from __future__ import annotations

import pandas as pd

from messikinesisprovider_spark.operators.pipeline41 import cogroup_order_reconcile

SF = "/root/testdata/sf0.001"


def test_cogroup_reconcile_matches_pandas(spark):
    out = {
        (r["o_orderstatus"], r["has_header"]): r
        for r in cogroup_order_reconcile(spark, SF).collect()
    }
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o = o[o["o_orderkey"].notna()]
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li = li[li["l_orderkey"].notna()].copy()
    li["rev"] = (
        (li["l_extendedprice"] * (1.0 - li["l_discount"]) * 1_000_000)
        .round()
        .astype("int64")
    )
    agg = li.groupby("l_orderkey").agg(n_items=("rev", "size"), rev=("rev", "sum"))
    rec = o.set_index("o_orderkey")[["o_orderstatus"]].join(agg, how="outer")
    rec["has_header"] = rec["o_orderstatus"].notna()
    rec["o_orderstatus"] = rec["o_orderstatus"].fillna("")
    rec[["n_items", "rev"]] = rec[["n_items", "rev"]].fillna(0).astype("int64")
    for (status, hh), grp in rec.groupby(["o_orderstatus", "has_header"]):
        got = out[(status, hh)]
        assert got["n_orders"] == len(grp)
        assert got["total_items"] == int(grp["n_items"].sum())
        assert got["revenue_micro_sum"] == int(grp["rev"].sum())
        assert got["key_checksum"] == int(grp.index.to_series().sum())
    assert set(out) == set(
        (s, h) for (s, h), _ in rec.groupby(["o_orderstatus", "has_header"])
    )
