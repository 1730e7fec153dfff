"""Semantic tests for the lake-maintenance/mining operators
(operators/lakeops.py) and the verified stream-stream join.

The DuckDB parity harness verifies cross-engine value equality; these tests
pin the semantics a hash match alone can't express — profile exactness,
anti-join completeness, A-priori soundness, Z-order layout disjointness.
"""

import glob
import os
import tempfile

import duckdb
from pyspark.sql import functions as F

from messikinesisprovider_spark.operators import lakeops

SF = "/root/testdata/sf0.001"


def test_data_profile_matches_direct_aggregates(spark):
    rows = {r["column_name"]: r for r in lakeops.data_profile_orders(spark, SF).collect()}
    assert set(rows) == {c for c, _ in lakeops._PROFILE_COLS}
    o = spark.read.parquet(f"{SF}/orders.parquet")
    n = o.count()
    direct = o.agg(
        F.count_distinct("o_custkey").alias("ndv"),
        F.min("o_orderkey").alias("lo"),
        F.max("o_orderkey").alias("hi"),
    ).collect()[0]
    assert rows["o_custkey"]["n_distinct"] == direct["ndv"]
    assert rows["o_orderkey"]["min_num"] == float(direct["lo"])
    assert rows["o_orderkey"]["max_num"] == float(direct["hi"])
    for r in rows.values():
        assert 0 <= r["n_nulls"] <= n
        assert r["n_distinct"] <= n
        assert r["min_num"] <= r["max_num"]


def test_incremental_dedup_survivors_are_novel_and_unique(spark):
    out = lakeops.dedup_incremental_exact(spark, SF)
    survivors = out.collect()
    keys = [r["content_key"] for r in survivors]
    assert len(keys) == len(set(keys))  # first-wins within batch
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    keyed = docs.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.slice(F.split("text", " "), 1, lakeops._CANON_WORDS))
        ).alias("k"),
    )
    hist = {r["k"] for r in keyed.filter(F.col("doc_id") % 5 != 0).collect()}
    assert all(k not in hist for k in keys)  # anti-join soundness
    # completeness: every novel new-batch key survived
    new_keys = {r["k"] for r in keyed.filter(F.col("doc_id") % 5 == 0).collect()}
    assert set(keys) == new_keys - hist


def test_copurchase_pairs_match_duckdb_reference(spark):
    got = {
        (r["part_a"], r["part_b"]): r["n_orders"]
        for r in lakeops.copurchase_pairs(spark, SF).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    spec = lakeops.copurchase_pairs  # oracle string lives in the registry
    from messikinesisprovider_spark.registry import all_specs

    want = {
        (pa, pb): n
        for pa, pb, n in con.execute(all_specs()["copurchase_pairs"].oracle).fetchall()
    }
    assert got == want
    for (pa, pb), n in got.items():
        assert pa < pb and n >= lakeops._MIN_SUPPORT


def test_morton_code_matches_python_reference(spark):
    def py_morton(x, y):
        out = 0
        for i in range(lakeops._MORTON_BITS):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    samples = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 1024)]
    df = spark.createDataFrame(samples, "x INT, y INT").select(
        lakeops.morton_col("x", "y").alias("m")
    )
    got = [r["m"] for r in df.collect()]
    assert got == [py_morton(x, y) for x, y in samples]


def test_zorder_write_produces_disjoint_file_ranges(spark):
    import pyarrow.parquet as pq

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    out = os.path.join(tempfile.mkdtemp(prefix="zorder_"), "t")
    lakeops.zorder_write(li, "l_partkey", "l_suppkey", out, n_files=4)
    spans = []
    for f in glob.glob(os.path.join(out, "*.parquet")):
        t = pq.read_table(f, columns=["l_partkey", "l_suppkey"])
        import pandas as pd

        d = t.to_pandas()
        m = [
            lakeops_py_morton(int(x), int(y))
            for x, y in zip(d["l_partkey"], d["l_suppkey"])
        ]
        if m:
            spans.append((min(m), max(m)))
    assert len(spans) >= 2
    spans.sort()
    # range partitioning on the morton code -> per-file morton intervals
    # are disjoint, which is what makes footer min/max stats selective
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2
    # round-trip: no rows lost
    total = sum(
        pq.read_metadata(f).num_rows for f in glob.glob(os.path.join(out, "*.parquet"))
    )
    assert total == li.count()


def lakeops_py_morton(x, y):
    out = 0
    for i in range(lakeops._MORTON_BITS):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_streaming_stream_stream_join_matches_batch_join(spark):
    from messikinesisprovider_spark.streaming import verified2
    from messikinesisprovider_spark.operators.relational import events_tbl

    got = verified2.streaming_stream_stream_join(spark, SF)
    got_rows = {
        (r["click_event_id"], r["purchase_event_id"], r["user_id"], r["lag_us"])
        for r in got.collect()
    }
    ev = events_tbl(spark, SF)
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    batch = c.join(
        p,
        F.expr("cu = pu AND cts <= pts AND cts >= pts - INTERVAL 7 DAYS"),
    ).select(
        "click_event_id",
        "purchase_event_id",
        F.col("pu").alias("user_id"),
        (F.unix_micros("pts") - F.unix_micros("cts")).alias("lag_us"),
    )
    want_rows = {
        (r["click_event_id"], r["purchase_event_id"], r["user_id"], r["lag_us"])
        for r in batch.collect()
    }
    assert got_rows == want_rows
    assert len(got_rows) > 0
