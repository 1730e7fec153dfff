"""Batch relational operator surface (SURVEY.md §2.5).

The reference implements no relational operators (SURVEY.md §2 scope note —
its surface is a Kinesis log SPI, `/root/reference/src/main/java/no/cantara/
messi/kinesis/`), so this module exposes the full set the driver's harness
requires as thin, *verified* wrappers over Catalyst built-ins: scan/filter/
project, joins of every flavor, hash aggregation, distinct, rollup/cube/
grouping sets, window functions, sort/limit/top-k, set operations, scalar
function families, pivot, and subqueries.

Every query is declarative DataFrame/SQL — no RDDs, no Python UDFs — so
Catalyst performs predicate pushdown, column pruning, join selection
(broadcast vs shuffle), and partial aggregation automatically; AQE handles
skew and partition coalescing at scale.

Determinism conventions (shared with the DuckDB oracles) are documented in
registry.py.

Cache-release contract (round 9, verdict item 6): operator builders may
``persist()`` an intermediate that several branches of the RETURNED lazy
frame consume (MinHash signatures, span tables, duel pair tables, ranking
layouts). Such a persist cannot be released inside the builder — the
returned frame still references it — so the engine-wide contract is
caller-side: **run ``spark.catalog.clearCache()`` after consuming a query's
action**. Every harness in this repo honors it (bench.py clears between
timed passes, tools/parity.py between queries, the pytest suite per
module); a long-lived host session embedding this engine must do the same.
``tests/test_persist_release.py`` pins that clearCache() leaves zero
persisted RDDs behind for the persist-heavy operators. Loop-style operators
that materialize eagerly INSIDE the builder (the graph family) release
their per-round state themselves and are exempt from the contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def events_tbl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events.ts` arrives in whatever parquet physical type the generator
    used — TIMESTAMP(NANOS) (which Spark's vectorized reader rejects; read
    nanos as long and truncate to micros) or TIMESTAMP(MICROS,
    isAdjustedToUTC=false) (read as TIMESTAMP_NTZ). Normalize both to a
    session-zone TIMESTAMP so downstream `unix_micros`/window arithmetic
    works; the session zone is pinned to UTC, so the NTZ cast is a pure
    type relabel with identical wall-clock values (what the DuckDB oracle
    sees too).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from pyspark.sql import types as T

    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def spread(df: DataFrame) -> DataFrame:
    """Unlock scan parallelism for CPU-bound map stages — gated on the
    input's ACTUAL partition count (round-9, verdict item 1).

    The test tables are single parquet files → one input partition → zero
    parallelism for compute-heavy per-row operators (md5 hashing, regexp
    shingling, big array transforms); locally a round-robin repartition to
    the session parallelism unlocks all cores. But `repartition(n)` plans as
    REPARTITION_BY_NUM — a strict user shuffle AQE will neither coalesce nor
    elide — so applied unconditionally it would plant a full-table
    round-robin shuffle (plus the SPARK-23207 per-task pre-shuffle sort)
    into the 100 TB path and CLAMP a many-split scan down to
    defaultParallelism. The gate below checks the physical scan's partition
    count and returns the frame untouched whenever it already meets the
    session parallelism, which is every real multi-split table; only the
    under-split local fixtures pay the shuffle.

    Callers must pass scan-level frames (scan/filter/project only — every
    current call site does): `df.rdd.getNumPartitions()` merely PLANS such a
    frame (no job), but on a frame with an exchange below it AQE would have
    to materialize child stages to answer.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def dsum(term_sql: str, alias: str) -> "F.Column":
    """Order-independent double sum: sum exact decimals, cast back to double."""
    return F.expr(f"CAST(SUM(CAST(({term_sql}) AS DECIMAL(18,6))) AS DOUBLE)").alias(alias)


def davg(term_sql: str, alias: str) -> "F.Column":
    """Deterministic mean: exact decimal sum, single double division."""
    return F.expr(
        f"CAST(SUM(CAST(({term_sql}) AS DECIMAL(18,6))) AS DOUBLE) / COUNT({term_sql})"
    ).alias(alias)


# SQL fragments reused by the DuckDB oracles (same algebra, DuckDB dialect).
def _osum(term: str, alias: str) -> str:
    return f"CAST(SUM(CAST(({term}) AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def _oavg(term: str, alias: str) -> str:
    return f"CAST(SUM(CAST(({term}) AS DECIMAL(18,6))) AS DOUBLE) / COUNT({term}) AS {alias}"


# ---------------------------------------------------------------------------
# Flagship (M0): scan → time filter → hash agg → sort → limit on `events`.
# The events table mirrors a flattened MessiMessage (TESTDATA.md ↔ SURVEY §1.3);
# the time filter is the batch analog of an AT_PROVIDER_TIME cursor scan
# (reference: KinesisStreamingBuffer.java:258-262).
# ---------------------------------------------------------------------------


@register(
    "flagship_events_last_day",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {_osum("value", "sum_value")},
           {_oavg("value", "avg_value")}
    FROM events
    WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 1 DAY
    GROUP BY event_type
    """,
    description="Per-type activity in the trailing day: time-cursor scan + hash agg + sort",
    tags=("agg", "filter", "flagship"),
)
def flagship_events_last_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_tbl(spark, sf_dir)
    max_ts = ev.agg(F.max("ts").alias("m"))  # 1-row DF; joined as cross broadcast, no collect
    return (
        ev.crossJoin(F.broadcast(max_ts))
        .filter(F.col("ts") >= F.col("m") - F.expr("INTERVAL 1 DAY"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value", "sum_value"),
            davg("value", "avg_value"),
        )
    )


# ---------------------------------------------------------------------------
# Scan / filter / project
# ---------------------------------------------------------------------------


@register(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_extendedprice * (1 - l_discount) AS DOUBLE) AS net_price,
           l_returnflag
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-03-01'
      AND l_discount > 0.02 AND l_quantity < 25
    """,
    description="Predicate-pushdown scan with computed projection",
    tags=("scan", "filter", "project"),
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-03-01").cast("timestamp"))
            & (F.col("l_discount") > 0.02)
            & (F.col("l_quantity") < 25)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("double").alias("net_price"),
            "l_returnflag",
        )
    )


# ---------------------------------------------------------------------------
# Aggregation family
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_osum("l_quantity", "sum_qty")},
           {_osum("l_extendedprice", "sum_base_price")},
           {_osum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {_osum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
           {_oavg("l_quantity", "avg_qty")},
           {_oavg("l_discount", "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1-style pricing summary: multi-measure hash aggregation",
    tags=("agg",),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price"),
            dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "distinct_count",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
    description="COUNT(DISTINCT) — expanded to a two-phase distinct aggregate by Catalyst",
    tags=("agg", "distinct"),
)
def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "distinct_rows",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    description="DISTINCT projection (shuffle-dedup)",
    tags=("distinct",),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tbl(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "approx_count_distinct",
    # HLL estimates differ across engines, so the portable output is the
    # exact count plus a boolean asserting the HLL++ estimate landed within
    # tolerance; the oracle reproduces exact + TRUE. At rsd=0.01 a 5% band
    # is ~5 sigma — deterministic in practice for these cardinalities.
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           TRUE AS hll_within_tol
    FROM events
    GROUP BY event_type
    """,
    description="approx_count_distinct (HyperLogLog++) per event_type, "
    "verified against the exact distinct count in-plan",
    tags=("agg", "approx"),
)
def approx_count_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_tbl(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("_approx"),
    ).select(
        "event_type",
        "n_users_exact",
        (
            F.abs(F.col("_approx") - F.col("n_users_exact"))
            <= F.col("n_users_exact") * F.lit(0.05)
        ).alias("hll_within_tol"),
    )


@register(
    "rollup_agg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_osum("l_quantity", "sum_qty")},
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    -- HAVING COUNT(*) > 0 is a no-op on any non-empty group; it aligns the
    -- empty-input case, where Spark's ROLLUP/CUBE emits no rows but standard
    -- SQL emits the () grand-total row
    HAVING COUNT(*) > 0
    """,
    description="ROLLUP hierarchy totals",
    tags=("agg", "rollup"),
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n_rows")
    )


@register(
    "cube_agg",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {_osum("o_totalprice", "sum_price")}
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    HAVING COUNT(*) > 0
    """,
    description="CUBE over status × priority",
    tags=("agg", "cube"),
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "sum_price")
    )


@register(
    "grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, {_osum("l_extendedprice", "sum_price")}
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    HAVING COUNT(*) > 0
    """,
    description="Explicit GROUPING SETS via the SQL surface",
    tags=("agg", "grouping-sets", "sql"),
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# ---------------------------------------------------------------------------
# Join family. Catalyst picks broadcast for the small dimension sides
# automatically (autoBroadcastJoinThreshold); explicit broadcast() hints mark
# the intent for the 100 TB plan where the dimension stays small.
# ---------------------------------------------------------------------------


@register(
    "join_broadcast",
    oracle=f"""
    SELECT p.p_brand,
           {_osum("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 15
    GROUP BY p.p_brand
    """,
    description="Fact ⋈ broadcast dimension + agg (map-side join, no fact shuffle for the join)",
    tags=("join", "broadcast", "agg"),
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum("l_extendedprice * (1 - l_discount)", "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "join_left_outer",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           {_osum("COALESCE(o.o_totalprice, 0)", "total_spend")}
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    description="LEFT OUTER join preserving customers with zero orders",
    tags=("join", "outer", "agg"),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum("COALESCE(o_totalprice, 0)", "total_spend"),
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
    description="LEFT SEMI join (EXISTS): customers with at least one urgent order",
    tags=("join", "semi"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "join_anti",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
    description="LEFT ANTI join (NOT EXISTS): customers with no urgent orders",
    tags=("join", "anti"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "join_multiway",
    oracle=f"""
    SELECT n.n_name AS nation,
           {_osum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1994-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-01-01'
    GROUP BY n.n_name
    """,
    description="TPC-H Q5-style 6-table join; dims broadcast, fact joins shuffle on keys",
    tags=("join", "multiway", "agg"),
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = tbl(spark, sf_dir, "nation")
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), (o.o_custkey == c.c_custkey))
        .join(F.broadcast(n), (c.c_nationkey == n.n_nationkey) & (s.s_nationkey == n.n_nationkey))
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(n.n_name.alias("nation"))
        .agg(dsum("l_extendedprice * (1 - l_discount)", "revenue"))
    )


@register(
    "join_range_nonequi",
    oracle="""
    SELECT o.o_orderkey, COUNT(*) AS n_late_lines
    FROM orders o JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY o.o_orderkey
    """,
    description="Equi-join with a non-equi residual range predicate",
    tags=("join", "non-equi"),
)
def join_range_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAY")),
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_late_lines"))
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "window_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c.c_custkey
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    ) WHERE rn <= 3
    """,
    description="Top-3 orders per customer: ROW_NUMBER with deterministic tiebreak",
    tags=("window", "topk"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    w = W.partitionBy("c_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_value,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id)
             AS prev_type
    FROM events
    """,
    description="Running sum (ROWS frame) + LAG over per-user event streams",
    tags=("window", "frame"),
)
def window_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explicit NULLS LAST: Spark ASC defaults NULLS FIRST, DuckDB NULLS
    # LAST — an untimestamped event must take the same slot in the running
    # frame in both engines (event_id breaks ties among them)
    ev = events_tbl(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy(F.asc_nulls_last("ts"), "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_value"),
        F.lag("event_type").over(w).alias("prev_type"),
    )


@register(
    "window_rank_dense_ntile",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal,
           RANK()       OVER (ORDER BY s_acctbal DESC, s_suppkey) AS rnk,
           DENSE_RANK() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS drnk,
           NTILE(4)     OVER (ORDER BY s_acctbal DESC, s_suppkey) AS quartile
    FROM supplier
    """,
    description="RANK / DENSE_RANK / NTILE global ranking",
    tags=("window", "rank"),
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-pass global ranking (ranking.global_row_number): the ordering is
    # unique (s_suppkey tiebreak), so RANK == DENSE_RANK == row_number and
    # NTILE is arithmetic on (row_number, n) — no single-partition window.
    from .ranking import global_row_number, ntile_of

    s = tbl(spark, sf_dir, "supplier")
    ranked, n = global_row_number(
        s, [F.col("s_acctbal").desc(), F.col("s_suppkey")], rn_col="_rn"
    )
    return ranked.select(
        "s_suppkey",
        "s_name",
        "s_acctbal",
        F.col("_rn").alias("rnk"),
        F.col("_rn").alias("drnk"),
        ntile_of(F.col("_rn"), n, 4).alias("quartile"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / set ops
# ---------------------------------------------------------------------------


@register(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    description="Global top-k: Spark plans TakeOrderedAndProject (no full sort)",
    tags=("sort", "limit", "topk"),
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "set_operations",
    oracle="""
    (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
     UNION
     SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    description="UNION (distinct) + EXCEPT pipeline",
    tags=("setop",),
)
def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    finished = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    return building.union(rich).distinct().exceptAll(finished.distinct())


@register(
    "intersect_op",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    description="INTERSECT of two key sets",
    tags=("setop",),
)
def intersect_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    return (
        c.filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select("c_custkey")
        .intersect(o.filter(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("c_custkey")))
    )


# ---------------------------------------------------------------------------
# Scalar function families (string / date / math / conditional / JSON)
# ---------------------------------------------------------------------------


@register(
    "scalar_string_date",
    oracle="""
    SELECT o_orderkey,
           UPPER(o_orderpriority) AS prio_upper,
           SUBSTRING(o_orderstatus, 1, 1) AS status_c,
           LENGTH(o_orderpriority) AS prio_len,
           CONCAT(o_orderstatus, '-', o_orderpriority) AS status_prio,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           CAST(DAY(o_orderdate) AS INT) AS order_day,
           CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_kbucket,
           CAST(ROUND(SQRT(ABS(o_totalprice)), 4) AS DOUBLE) AS price_sqrt
    FROM orders
    WHERE o_orderkey % 100 = 0
    """,
    description="Scalar string/date/math functions in one verified projection",
    tags=("scalar", "string", "date", "math"),
)
def scalar_string_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderstatus", 1, 1).alias("status_c"),
        F.length("o_orderpriority").cast("bigint").alias("prio_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("price_kbucket"),
        F.round(F.sqrt(F.abs(F.col("o_totalprice"))), 4).cast("double").alias("price_sqrt"),
    )


@register(
    "conditional_agg",
    oracle=f"""
    SELECT l_returnflag,
           {_osum("CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END", "high_disc_price")},
           {_osum("CASE WHEN l_discount <= 0.05 THEN l_extendedprice ELSE 0 END", "low_disc_price")},
           COUNT(CASE WHEN l_quantity >= 30 THEN 1 END) AS n_bulk
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="CASE WHEN conditional aggregation (manual pivot primitive)",
    tags=("scalar", "conditional", "agg"),
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dsum("CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END", "high_disc_price"),
        dsum("CASE WHEN l_discount <= 0.05 THEN l_extendedprice ELSE 0 END", "low_disc_price"),
        F.count(F.when(F.col("l_quantity") >= 30, 1)).alias("n_bulk"),
    )


@register(
    "json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    description="JSON field extraction from the props payload (MessiMessage.attributes analog)",
    tags=("scalar", "json"),
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_tbl(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "pivot_wide",
    oracle=f"""
    SELECT user_id,
           {_osum("CASE WHEN event_type = 'click' THEN value END", "click")},
           {_osum("CASE WHEN event_type = 'purchase' THEN value END", "purchase")},
           {_osum("CASE WHEN event_type = 'view' THEN value END", "view")}
    FROM events
    GROUP BY user_id
    """,
    description="PIVOT event types to columns (conditional-agg expansion)",
    tags=("pivot", "agg"),
)
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_tbl(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "view"])
        .agg(F.expr("CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)"))
    )


# ---------------------------------------------------------------------------
# Subqueries (SQL surface — Catalyst decorrelates into joins)
# ---------------------------------------------------------------------------


@register(
    "scalar_subquery",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                              / COUNT(c_acctbal) FROM customer)
    """,
    description="Scalar subquery in WHERE (above-average account balance)",
    tags=("subquery", "sql"),
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                                  / COUNT(c_acctbal) FROM customer)
        """
    )


@register(
    "correlated_in_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
    """,
    description="IN-subquery (rewritten to LEFT SEMI by Catalyst)",
    tags=("subquery", "sql", "semi"),
)
def correlated_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    tbl(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
        """
    )


@register(
    "having_clause",
    oracle=f"""
    SELECT o_custkey, COUNT(*) AS n_orders, {_osum("o_totalprice", "spend")}
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    """,
    description="HAVING post-aggregation filter",
    tags=("agg", "having"),
)
def having_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "spend"))
        .filter(F.col("n_orders") >= 15)
    )


# ---------------------------------------------------------------------------
# Time bucketing (batch analog of streaming tumbling windows)
# ---------------------------------------------------------------------------


@register(
    "time_bucket_tumbling",
    oracle=f"""
    SELECT date_trunc('hour', ts)::TIMESTAMP AS bucket_start, event_type,
           COUNT(*) AS n_events,
           {_osum("value", "sum_value")}
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY date_trunc('hour', ts)::TIMESTAMP, event_type
    """,
    description="1-hour tumbling windows over event time (batch twin of streaming window())",
    tags=("window-time", "agg", "streaming-analog"),
)
def time_bucket_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    # window() silently drops NULL event times; make the contract explicit
    # (the SQL twin would otherwise keep a NULL bucket per group)
    ev = events_tbl(spark, sf_dir).filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
