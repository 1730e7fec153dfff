"""Tests for pipeline37: VARIANT extraction semantics and the keyed
pseudonymization integrity proof."""

from __future__ import annotations

import hashlib
import json

import pandas as pd
from pyspark.sql import functions as F

from messikinesisprovider_spark.operators.pipeline37 import (
    _PEPPER,
    pseudonymize_referential,
    variant_props_extract,
)

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_variant_matches_json_reference(spark):
    out = {r["event_type"]: r for r in variant_props_extract(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["event_type"].notna() & ev["props"].notna()]
    for et, grp in ev.groupby("event_type"):
        ks = []
        for p in grp["props"]:
            try:
                v = json.loads(p)
                ks.append(v.get("k"))
            except ValueError:
                ks.append(None)
        got = out[et]
        present = [k for k in ks if k is not None]
        assert got["n_events"] == len(grp)
        assert got["n_missing_k"] == len(ks) - len(present)
        assert got["k_sum"] == sum(present)
        if present:
            assert got["k_min"] == min(present) and got["k_max"] == max(present)


def test_variant_tolerates_malformed_json(spark):
    """try_parse_json must null out malformed payloads, not throw, and the
    missing-field accounting must count them."""
    df = spark.createDataFrame(
        [("a", '{"k": 1}'), ("a", "not json {"), ("a", '{"other": 2}')],
        "event_type string, props string",
    )
    v = df.select("event_type", F.expr("try_parse_json(props)").alias("v"))
    k = F.expr("variant_get(v, '$.k', 'bigint')")
    row = v.agg(
        F.sum(F.when(F.col("v").isNotNull(), 1).otherwise(0)).alias("parsed"),
        F.sum(F.when(k.isNull(), 1).otherwise(0)).alias("missing"),
        F.sum(F.coalesce(k, F.lit(0))).alias("ksum"),
    ).collect()[0]
    assert row["parsed"] == 2  # the malformed row nulls out
    assert row["missing"] == 2  # malformed + missing-field
    assert row["ksum"] == 1


def test_pseudonymization_integrity_holds(spark):
    rows = pseudonymize_referential(spark, SF).collect()
    assert rows and all(r["integrity_ok"] for r in rows)
    c = pd.read_parquet(f"{SF}/customer.parquet")
    c = c[c["c_mktsegment"].notna() & c["c_custkey"].notna()]
    got_customers = {r["seg"]: r["n_customers"] for r in rows}
    for seg, grp in c.groupby("c_mktsegment"):
        assert got_customers[seg] == len(grp)


def test_pseudonym_is_keyed_and_deterministic(spark):
    """The pseudonym is the peppered portable hash — reproducible given the
    pepper, opaque without it."""
    one = _h60(f"{_PEPPER}|42")
    other = _h60("other-pepper|42")
    assert one != other  # pepper changes the mapping
    assert one == _h60(f"{_PEPPER}|42")  # and it is deterministic
