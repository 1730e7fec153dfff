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


@register(
    "groupwise_max_subquery",
    oracle="""
    SELECT p.p_brand, p.p_partkey, p.p_retailprice
    FROM part p
    WHERE p.p_retailprice = (SELECT MAX(p2.p_retailprice)
                             FROM part p2 WHERE p2.p_brand = p.p_brand)
    """,
    description="Correlated scalar subquery: groupwise max (decorrelated to a join by Catalyst)",
    tags=("subquery", "correlated", "sql"),
)
def groupwise_max_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p.p_brand, p.p_partkey, p.p_retailprice
        FROM part p
        WHERE p.p_retailprice = (SELECT MAX(p2.p_retailprice)
                                 FROM part p2 WHERE p2.p_brand = p.p_brand)
        """
    )


@register(
    "latest_event_per_user",
    oracle="""
    SELECT user_id,
           arg_max(event_id,   epoch_us(ts)::HUGEINT * 1000000000 + event_id) AS last_event_id,
           arg_max(event_type, epoch_us(ts)::HUGEINT * 1000000000 + event_id) AS last_event_type,
           MAX(ts)::TIMESTAMP AS last_ts
    FROM events
    GROUP BY user_id
    """,
    description="Latest-state per key via argmax on a packed (time, id) key — single-pass, no window sort",
    tags=("agg", "argminmax", "latest-state"),
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_by on a packed (time, id) key: one hash aggregation instead of a
    # window sort — the shape that wins at 100 TB (map-side partial argmax).
    # DECIMAL(38,0) key ↔ DuckDB HUGEINT: same total order, no overflow.
    ev = events_tbl(spark, sf_dir)
    k = "CAST(unix_micros(ts) AS DECIMAL(38,0)) * 1000000000 + event_id"
    return ev.groupBy("user_id").agg(
        F.expr(f"max_by(event_id, {k})").alias("last_event_id"),
        F.expr(f"max_by(event_type, {k})").alias("last_event_type"),
        F.max("ts").alias("last_ts"),
    )


@register(
    "time_bucket_sliding",
    oracle=f"""
    WITH cand AS (
      SELECT event_type, value,
             UNNEST([
               to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT)),
               to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 - 1800 AS BIGINT))
             ]) AS w_start,
             ts
      FROM events
    )
    SELECT w_start::TIMESTAMP AS window_start, event_type,
           COUNT(*) AS n_events,
           {_osum("value", "sum_value")}
    FROM cand
    WHERE ts >= w_start AND ts < w_start + INTERVAL 1 HOUR
    GROUP BY w_start, event_type
    """,
    description="Sliding windows (1 h window, 30 min slide): each event lands in two windows",
    tags=("window-time", "sliding", "agg", "streaming-analog"),
)
def time_bucket_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_tbl(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value"
        )
    )


@register(
    "map_functions",
    oracle="""
    SELECT o_orderkey,
           m['status'][1] AS status_v,
           CAST(cardinality(m) AS INT) AS n_keys,
           array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted,
           array_to_string(list_sort(map_values(m)), ',') AS values_sorted
    FROM (
      SELECT o_orderkey,
             map(['status', 'prio'], [o_orderstatus, o_orderpriority]) AS m
      FROM orders WHERE o_orderkey % 150 = 0
    )
    """,
    description="Map construction, element access, keys/values extraction (MessiMessage.attributes analog)",
    tags=("scalar", "map"),
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 150 == 0)
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"), F.lit("prio"), F.col("o_orderpriority")
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status_v"),
        F.size(m).cast("int").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.array_join(F.array_sort(F.map_values(m)), ",").alias("values_sorted"),
    )


@register(
    "numeric_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(ROUND(ln(o_totalprice), 6) AS DOUBLE) AS ln_price,
           CAST(ROUND(log10(o_totalprice), 6) AS DOUBLE) AS log10_price,
           CAST(ROUND(exp(o_totalprice / 100000.0), 6) AS DOUBLE) AS exp_scaled,
           CAST(ROUND(pow(o_totalprice, 0.5), 6) AS DOUBLE) AS sqrt_via_pow,
           CAST(ROUND(sin(o_totalprice / 10000.0), 6) AS DOUBLE) AS sin_scaled,
           CAST(ROUND(atan2(o_totalprice, 100000.0), 6) AS DOUBLE) AS atan2_v,
           CAST(sign(o_totalprice - 100000.0) AS DOUBLE) AS sign_v,
           CAST(greatest(o_totalprice, 100000.0) AS DOUBLE) AS greatest_v,
           CAST(least(o_totalprice, 100000.0) AS DOUBLE) AS least_v
    FROM orders
    WHERE o_orderkey % 120 = 0
    """,
    description="Numeric/math function family (ln/log10/exp/pow/trig/sign/greatest), 6dp-rounded",
    tags=("scalar", "math"),
)
def numeric_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round(…, 6) absorbs any last-ulp libm differences between JVM Math and
    # DuckDB's libm — values this size agree to ~1e-15 relative.
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 120 == 0)
    return o.select(
        "o_orderkey",
        F.round(F.log(F.col("o_totalprice")), 6).cast("double").alias("ln_price"),
        F.round(F.log10("o_totalprice"), 6).cast("double").alias("log10_price"),
        F.round(F.exp(F.col("o_totalprice") / 100000.0), 6).cast("double").alias("exp_scaled"),
        F.round(F.pow("o_totalprice", F.lit(0.5)), 6).cast("double").alias("sqrt_via_pow"),
        F.round(F.sin(F.col("o_totalprice") / 10000.0), 6).cast("double").alias("sin_scaled"),
        F.round(F.atan2(F.col("o_totalprice"), F.lit(100000.0)), 6).cast("double").alias("atan2_v"),
        F.signum(F.col("o_totalprice") - 100000.0).cast("double").alias("sign_v"),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).cast("double").alias("greatest_v"),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).cast("double").alias("least_v"),
    )


@register(
    "dataset_split",
    oracle="""
    SELECT split_name, COUNT(*) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM (
      SELECT doc_id,
             CASE
               WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8)) AS BIGINT) % 10 < 8
                 THEN 'train'
               WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8)) AS BIGINT) % 10 = 8
                 THEN 'validation'
               ELSE 'test'
             END AS split_name
      FROM documents
    )
    GROUP BY split_name
    """,
    description="Deterministic 80/10/10 train/val/test split via salted content hash",
    tags=("sample", "split", "extension"),
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The split every training pipeline needs: derived from a salted hash of
    the stable id, so membership is reproducible across engines, runs, and
    repartitions — no RAND(), no global sort. The salt isolates this split
    from any other hash use of the same ids."""
    d = tbl(spark, sf_dir, "documents")
    bucket = F.expr(
        "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':split')), 1, 8), 16, 10) AS BIGINT) % 10"
    )
    split = (
        F.when(bucket < 8, "train").when(bucket == 8, "validation").otherwise("test")
    )
    return (
        d.withColumn("split_name", split)
        .groupBy("split_name")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


@register(
    "calendar_spine_join",
    oracle=f"""
    WITH bounds AS (
      SELECT date_trunc('day', MIN(ts)) AS lo, date_trunc('day', MAX(ts)) AS hi FROM events
    ),
    spine AS (
      SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
    ),
    daily AS (
      SELECT date_trunc('day', ts) AS day, COUNT(*) AS n, 
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1
    )
    SELECT s.day::TIMESTAMP AS day,
           COALESCE(d.n, 0) AS n_events,
           COALESCE(d.sum_value, 0.0) AS sum_value
    FROM spine s LEFT JOIN daily d ON d.day = s.day
    """,
    description="Calendar-spine join: dense daily series with zero-filled gaps (sequence + explode + outer join)",
    tags=("spine", "temporal", "join", "explode"),
)
def calendar_spine_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense time series from sparse events: generate the day spine with
    sequence() (no driver loop — the spine is one row exploded), then left
    join daily aggregates. The canonical gap-filling shape for reporting and
    feature windows."""
    ev = events_tbl(spark, sf_dir)
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"), F.date_trunc("day", F.max("ts")).alias("hi")
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, INTERVAL 1 DAY)")).alias("day")
    )
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"), dsum("value", "sum_value_raw")
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.coalesce("sum_value_raw", F.lit(0.0)).alias("sum_value"),
        )
    )
