"""Python-reference tests for pipeline87 (uniqueness audit + footrule)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from messikinesisprovider_spark.operators.pipeline87 import (
    _UNIQ_TABLES,
    dq_uniqueness_audit,
    eval_spearman_footrule,
)

SF = "/root/testdata/sf0.001"


def test_uniqueness_audit_matches_pandas(spark):
    rows = {r["pk"]: r for r in dq_uniqueness_audit(spark, SF).collect()}
    assert len(rows) == len(_UNIQ_TABLES)
    for t, k in _UNIQ_TABLES:
        col = pd.read_parquet(f"{SF}/{t}.parquet", columns=[k])[k]
        r = rows[f"{t}.{k}"]
        assert r["n_rows"] == len(col)
        assert r["n_keys"] == col.dropna().nunique()
        assert r["n_null_keys"] == int(col.isna().sum())
        assert r["n_dup_rows"] == len(col.dropna()) - col.dropna().nunique()
        assert r["unique_ok"] == (r["n_dup_rows"] == 0 and r["n_null_keys"] == 0)


def test_footrule_matches_numpy(spark):
    row = eval_spearman_footrule(spark, SF).collect()[0]
    c = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey", "c_acctbal"])
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    spend = (
        np.round(o["o_totalprice"].to_numpy() * 100).astype("int64")
        .astype("int64")
    )
    sp = pd.DataFrame({"k": o["o_custkey"], "s": spend}).groupby("k")["s"].sum()
    df = pd.DataFrame(
        {
            "k": c["c_custkey"],
            "bal": np.round(c["c_acctbal"].to_numpy() * 100).astype("int64"),
        }
    )
    df["spend"] = df["k"].map(sp).fillna(0).astype("int64")
    order_bal = np.lexsort((df["k"].to_numpy(), -df["bal"].to_numpy()))
    order_spend = np.lexsort((df["k"].to_numpy(), -df["spend"].to_numpy()))
    r_bal = np.empty(len(df), dtype="int64")
    r_bal[order_bal] = np.arange(1, len(df) + 1)
    r_spend = np.empty(len(df), dtype="int64")
    r_spend[order_spend] = np.arange(1, len(df) + 1)
    foot = int(np.abs(r_bal - r_spend).sum())
    n = len(df)
    assert row["n"] == n
    assert row["footrule"] == foot
    assert abs(row["footrule_similarity"] - (1.0 - 3.0 * foot / (n * n - 1))) < 1e-6
