"""Batch operator surface, part 4: struct/JSON construction + deterministic sampling."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import _osum, dsum, events_tbl, tbl


@register(
    "struct_json_roundtrip",
    oracle="""
    SELECT event_id,
           to_json(struct_pack(etype := event_type, val := value, uid := user_id))::VARCHAR
             AS event_json,
           json_extract_string(
             to_json(struct_pack(etype := event_type, val := value, uid := user_id)),
             '$.etype') AS etype_back
    FROM events
    WHERE event_id % 40 = 0
    """,
    description="Struct construction → JSON serialization → field extraction round-trip",
    tags=("scalar", "struct", "json"),
)
def struct_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_tbl(spark, sf_dir).filter(F.col("event_id") % 40 == 0)
    j = F.to_json(
        F.expr("named_struct('etype', event_type, 'val', value, 'uid', user_id)"),
        {"ignoreNullFields": "false"},  # match DuckDB's explicit-null rendering
    )
    return ev.select(
        "event_id",
        j.alias("event_json"),
        F.get_json_object(j, "$.etype").alias("etype_back"),
    )


@register(
    "deterministic_hash_sample",
    oracle=f"""
    SELECT substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) AS bucket_c,
           COUNT(*) AS n_orders,
           {_osum("o_totalprice", "sum_price")}
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    GROUP BY 1
    """,
    description="Deterministic ~1/8 hash sample (md5 bucket) — reproducible sampling for pipelines",
    tags=("sample", "hash"),
)
def deterministic_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TABLESAMPLE is engine-seeded and irreproducible across systems; content
    # hashing gives the property a data pipeline actually wants — the same
    # rows selected everywhere, forever, shard-independently.
    o = tbl(spark, sf_dir, "orders")
    bucket = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
    return (
        o.withColumn("bucket_c", bucket)
        .filter(F.col("bucket_c").isin("0", "1"))
        .groupBy("bucket_c")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "sum_price"))
    )
