"""Grouped-map operators (applyInPandas) + remaining relational families.

`user_behavior_features` is the canonical custom-operator shape the engine
offers for logic Spark's built-ins can't express: groupBy(key).applyInPandas
with an explicit output schema — one Arrow batch per key group, vectorized
inside. Here the feature math is deliberately SQL-expressible so the DuckDB
oracle can verify the *plumbing* end-to-end (schema, grouping, determinism);
real users swap the body for arbitrary Python (sequence models, tokenizers).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from .relational import _osum, dsum, events_tbl, tbl

FEATURE_SCHEMA = T.StructType(
    [
        # nullable: NULL user_id is a real group under groupBy
        T.StructField("user_id", T.LongType(), True),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("n_purchases", T.LongType(), False),
        T.StructField("mean_gap_seconds", T.DoubleType(), True),
        T.StructField("max_value", T.DoubleType(), True),
    ]
)


@register(
    "grouped_user_features",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    g AS (SELECT user_id,
                 CAST(ROUND(AVG(gap_us) / 1000000.0, 4) AS DOUBLE) AS mean_gap_seconds
          FROM gaps WHERE gap_us IS NOT NULL GROUP BY user_id)
    SELECT e.user_id,
           COUNT(*) AS n_events,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           ANY_VALUE(g.mean_gap_seconds) AS mean_gap_seconds,
           MAX(value) AS max_value
    FROM events e LEFT JOIN g ON g.user_id IS NOT DISTINCT FROM e.user_id
    GROUP BY e.user_id
    """,
    description="Grouped-map applyInPandas: per-user behavioral features (Arrow batch per key)",
    tags=("grouped", "applyinpandas", "extension"),
)
def grouped_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_tbl(spark, sf_dir).select("user_id", "event_id", "ts", "event_type", "value")

    def features(pdf: pd.DataFrame) -> pd.DataFrame:
        uid0 = pdf["user_id"].iloc[0]
        # NULL user_id is a real group under groupBy; Arrow hands it as NaN
        uid = None if pd.isna(uid0) else int(uid0)
        # gaps are defined over rows WITH a timestamp only: a NaT would
        # otherwise turn into the int64 min sentinel under astype and poison
        # every diff (the SQL LAG twin yields NULL gaps there and drops them)
        valid = pdf[pdf["ts"].notna()].sort_values(["ts", "event_id"])
        # normalize to ns regardless of whether Arrow hands pandas us or ns
        ts_ns = valid["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        gaps = np.diff(ts_ns)
        mean_gap = round(float(gaps.mean()) / 1e9, 4) if len(gaps) else None
        return pd.DataFrame(
            [
                {
                    "user_id": uid,
                    "n_events": len(pdf),
                    "n_purchases": int((pdf["event_type"] == "purchase").sum()),
                    "mean_gap_seconds": mean_gap,
                    "max_value": None if pdf["value"].isna().all() else float(pdf["value"].max()),
                }
            ]
        )

    return ev.groupBy("user_id").applyInPandas(features, schema=FEATURE_SCHEMA)


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {_osum("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
           o.o_orderdate::TIMESTAMP AS o_orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    """,
    description="TPC-H Q3: shipping-priority revenue per open order",
    tags=("tpch", "join", "agg"),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = tbl(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = tbl(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum("l_extendedprice * (1 - l_discount)", "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {_osum("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
           n.n_name AS nation
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1995-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    """,
    description="TPC-H Q10: revenue lost to returned items per customer",
    tags=("tpch", "join", "agg"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = tbl(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(dsum("l_extendedprice * (1 - l_discount)", "revenue"))
        .select("c_custkey", "c_name", "revenue", "nation")
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             AS events_last_hour
    FROM events
    """,
    description="RANGE frame over event time: per-row trailing-hour activity count",
    tags=("window", "range-frame", "temporal"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_tbl(spark, sf_dir)
    from pyspark.sql.window import Window as W

    win = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(win).alias("events_last_hour"),
    )


@register(
    "array_agg_sorted",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
           COUNT(*) AS n_orders
    FROM orders
    WHERE o_custkey % 20 = 0
    GROUP BY o_custkey
    """,
    description="Array aggregation: collect, sort, serialize (hash-stable array output)",
    tags=("agg", "array"),
)
def array_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_custkey") % 20 == 0)
    return o.groupBy("o_custkey").agg(
        F.array_join(F.array_sort(F.collect_list("o_orderkey")), ",").alias("order_keys"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "null_handling",
    oracle="""
    SELECT e.event_id,
           COALESCE(x.val, -1.0) AS value_or_default,
           CASE WHEN x.val IS NULL THEN 'missing' ELSE 'present' END AS presence,
           NULLIF(e.event_type, 'error') AS type_or_null
    FROM events e
    LEFT JOIN (SELECT event_id, value AS val FROM events WHERE value > 150) x
      ON x.event_id = e.event_id
    WHERE e.event_id % 50 = 0
    """,
    description="NULL handling: COALESCE, IS NULL branching, NULLIF over an outer join",
    tags=("scalar", "null"),
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_tbl(spark, sf_dir)
    x = ev.filter(F.col("value") > 150).select("event_id", F.col("value").alias("val"))
    e = ev.filter(F.col("event_id") % 50 == 0).alias("e")
    return (
        e.join(x.alias("x"), F.col("x.event_id") == F.col("e.event_id"), "left")
        .select(
            F.col("e.event_id").alias("event_id"),
            F.coalesce(F.col("x.val"), F.lit(-1.0)).alias("value_or_default"),
            F.when(F.col("x.val").isNull(), "missing").otherwise("present").alias("presence"),
            F.nullif(F.col("e.event_type"), F.lit("error")).alias("type_or_null"),
        )
    )


@register(
    "union_by_name_dedup",
    oracle="""
    SELECT key_id, source_rel, n FROM (
      SELECT c_custkey AS key_id, 'customer' AS source_rel, COUNT(*) AS n
      FROM customer GROUP BY c_custkey
      UNION ALL
      SELECT o_custkey AS key_id, 'orders' AS source_rel, COUNT(*) AS n
      FROM orders GROUP BY o_custkey
    )
    WHERE key_id % 25 = 0
    """,
    description="UNION ALL of schema-aligned aggregates (unionByName)",
    tags=("setop", "union"),
)
def union_by_name_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        tbl(spark, sf_dir, "customer")
        .groupBy(F.col("c_custkey").alias("key_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("source_rel", F.lit("customer"))
    )
    o = (
        tbl(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("key_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("source_rel", F.lit("orders"))
    )
    return (
        c.unionByName(o)
        .filter(F.col("key_id") % 25 == 0)
        .select("key_id", "source_rel", "n")
    )


@register(
    "dropduplicates_keyed",
    oracle="""
    SELECT user_id, event_type,
           MIN(event_id) AS first_event_id
    FROM events
    GROUP BY user_id, event_type
    """,
    description="Keyed deduplication keeping a deterministic representative (min id)",
    tags=("dedup", "distinct"),
)
def dropduplicates_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dropDuplicates keeps an ARBITRARY row per key (partition-order
    # dependent) — for a verifiable contract the engine exposes the
    # deterministic min_by form instead; dropDuplicates remains available for
    # streaming where the watermark bounds state.
    ev = events_tbl(spark, sf_dir)
    return ev.groupBy("user_id", "event_type").agg(F.min("event_id").alias("first_event_id"))


@register(
    "user_features_builtin",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    g AS (SELECT user_id,
                 CAST(ROUND(AVG(gap_us) / 1000000.0, 4) AS DOUBLE) AS mean_gap_seconds
          FROM gaps WHERE gap_us IS NOT NULL GROUP BY user_id)
    SELECT e.user_id,
           COUNT(*) AS n_events,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           ANY_VALUE(g.mean_gap_seconds) AS mean_gap_seconds,
           MAX(value) AS max_value
    FROM events e LEFT JOIN g ON g.user_id IS NOT DISTINCT FROM e.user_id
    GROUP BY e.user_id
    """,
    description="Built-in twin of grouped_user_features: window lag + hash agg, no Python",
    tags=("grouped", "window", "agg", "extension"),
)
def user_features_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same per-user features as grouped_user_features, expressed with pure
    Catalyst operators (window lag for inter-event gaps + one hash agg).
    grouped_user_features stays registered as the applyInPandas plumbing
    demo; THIS is the shape to run in production — whole-stage codegen, no
    Arrow transfer — and the one the headline bench times. The window and the
    aggregation share the user_id hash partitioning, so the plan has a single
    exchange."""
    from pyspark.sql.window import Window as W

    ev = events_tbl(spark, sf_dir).select("user_id", "event_id", "ts", "event_type", "value")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    return (
        ev.withColumn("gap_us", gap_us)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
            F.round(F.avg("gap_us") / 1000000.0, 4).cast("double").alias("mean_gap_seconds"),
            F.max("value").cast("double").alias("max_value"),
        )
    )
