"""Python-reference tests for pipeline38: refresh maintenance and schema
evolution on read."""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from messikinesisprovider_spark.operators.pipeline38 import (
    ensure_evolved_exports,
    schema_evolution_read,
    tpch_rf_maintenance,
)

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_rf_maintenance_matches_python_reference(spark):
    out = {r["o_orderstatus"]: r for r in tpch_rf_maintenance(spark, SF).collect()}
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o = o[o["o_orderkey"].notna()]
    mk = int(o["o_orderkey"].max())
    ref: dict[str, list[int]] = {}
    for _, r in o.iterrows():
        k = int(r["o_orderkey"])
        if _h60(f"{k}|rf2") % 10 != 7:
            ref.setdefault(r["o_orderstatus"], []).append(k)
        if _h60(f"{k}|rf1") % 10 == 3:
            ref.setdefault(r["o_orderstatus"], []).append(k + mk)
    for status, keys in ref.items():
        got = out[status]
        assert got["n_orders"] == len(keys)
        assert got["key_checksum"] == sum(keys)
    assert set(out) == set(ref)


def test_rf_batches_are_nonvacuous(spark):
    """Both refresh batches fire: the maintained table differs from the
    base in both directions."""
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o = o[o["o_orderkey"].notna()]
    n_del = sum(1 for k in o["o_orderkey"] if _h60(f"{int(k)}|rf2") % 10 == 7)
    n_ins = sum(1 for k in o["o_orderkey"] if _h60(f"{int(k)}|rf1") % 10 == 3)
    assert n_del > 0 and n_ins > 0
    total = sum(r["n_orders"] for r in tpch_rf_maintenance(spark, SF).collect())
    assert total == len(o) - n_del + n_ins


def test_schema_evolution_nulls_and_totals(spark):
    rows = schema_evolution_read(spark, SF).collect()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs["source"] = docs["source"].fillna("")
    assert sum(r["n_docs"] for r in rows) == len(docs)
    # v1 generation (even doc ids) has no lang column -> NULL after merge
    expect_null = int(
        ((docs["doc_id"] % 2 == 0) | docs["lang"].isna()).sum()
    )
    assert sum(r["n_lang_null"] for r in rows) == expect_null
    expect_quality = int(sum(d % 100 for d in docs["doc_id"] if d % 2 == 1))
    assert sum(r["quality_sum"] for r in rows) == expect_quality


def test_evolved_layout_really_has_two_schemas(spark):
    """The generations genuinely differ on disk — v1 lacks `lang`, v2
    carries `quality` — so mergeSchema is doing real work."""
    root = ensure_evolved_exports(spark, SF)
    v1 = spark.read.parquet(f"{root}/gen=1")
    v2 = spark.read.parquet(f"{root}/gen=2")
    assert "lang" not in v1.columns and "quality" not in v1.columns
    assert "lang" in v2.columns and "quality" in v2.columns
