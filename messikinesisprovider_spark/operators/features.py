"""Feature-engineering operators (round 2, appended): leave-one-out target
encoding and equi-depth binning — the two tabular-ML transforms a training
pipeline runs right before writing shards.

Determinism discipline: the LOO mean is (exact decimal sum − exact decimal
value) cast to double once, then ONE double division; bin assignment is
ntile over an order carrying a unique tiebreaker. Both hash-match DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .relational import events_tbl, tbl


@register(
    "target_encode_loo",
    oracle="""
    WITH stats AS (
      SELECT o_orderpriority,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS s,
             COUNT(*) AS n
      FROM orders GROUP BY 1
    )
    SELECT o.o_orderkey, o.o_orderpriority,
           CASE WHEN st.n > 1
                THEN CAST(st.s - CAST(o.o_totalprice AS DECIMAL(18,6)) AS DOUBLE)
                     / (st.n - 1)
                ELSE NULL END AS loo_mean_price
    FROM orders o JOIN stats st USING (o_orderpriority)
    """,
    description="Leave-one-out target encoding of o_orderpriority against "
    "o_totalprice: per-category decimal-exact sum minus self, one division",
    tags=("features", "encoding", "extension"),
)
def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding — the leakage-safe categorical encoder:
    each row's feature is the mean target of its category EXCLUDING itself.

    Scale: one map-side-combinable aggregation over the fact table, then a
    BROADCAST join of the category-level stats back (the category domain
    is tiny by construction — that's why it's being encoded). No window,
    no per-row shuffle. The subtraction form (sum − self)/(n − 1) computes
    LOO without a second pass, and decimal accumulation keeps it
    bit-reproducible under any partitioning.
    """
    o = tbl(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,6)")
    stats = o.groupBy("o_orderpriority").agg(
        F.sum(dec).alias("s"), F.count(F.lit(1)).alias("n")
    )
    joined = o.select("o_orderkey", "o_orderpriority", "o_totalprice").join(
        F.broadcast(stats), "o_orderpriority"
    )
    loo = F.when(
        F.col("n") > 1,
        (F.col("s") - dec).cast("double") / (F.col("n") - 1),
    ).otherwise(F.lit(None))
    return joined.select(
        "o_orderkey", "o_orderpriority", loo.alias("loo_mean_price")
    )


_N_BINS = 10


@register(
    "histogram_equidepth",
    oracle=f"""
    WITH binned AS (
      SELECT event_type, value,
             NTILE({_N_BINS}) OVER (PARTITION BY event_type
                                    ORDER BY value, event_id) AS bin
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_type, bin,
           COUNT(*) AS n,
           MIN(value) AS lo,
           MAX(value) AS hi
    FROM binned GROUP BY 1, 2
    """,
    description=f"Equi-depth histogram: ntile({_N_BINS}) per event_type with "
    "unique-key order, per-bin count and exact bounds",
    tags=("features", "binning", "extension"),
)
def histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) binning — optimizer statistics and feature
    bucketization both want bins with equal POPULATION, not equal width
    (long-tailed values put everything in one equal-width bin).

    ntile's order carries event_id as the unique tiebreaker, so bin
    membership is deterministic for duplicated values. Scale: one window
    per series key (parallel across keys) + a map-side-combinable
    aggregate. For a GLOBAL equi-depth histogram at 100 TB the window
    would serialize — use approx_percentile boundaries + width assignment
    instead (`exact_percentiles` / `approx_percentile_sketch` show both
    primitives); per-key histograms like this one scale as-is.
    """
    # value IS NOT NULL: NULLs sort first in Spark windows but last in
    # DuckDB, shifting every ntile boundary — and a value histogram has no
    # bin for NULL regardless.
    ev = events_tbl(spark, sf_dir).filter(F.col("value").isNotNull())
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    binned = ev.select(
        "event_type",
        "value",
        # bigint to match the oracle's NTILE dtype
        F.ntile(_N_BINS).over(w).cast("bigint").alias("bin"),
    )
    return binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


@register(
    "rebalance_classes",
    oracle="""
    WITH counts AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY 1),
    floor_n AS (SELECT MIN(n) AS n_min FROM counts),
    ranked AS (
      SELECT vec_id, label,
             ROW_NUMBER() OVER (PARTITION BY label
                                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
      FROM embeddings
    )
    SELECT vec_id, label FROM ranked, floor_n WHERE rk <= n_min
    """,
    description="Class rebalancing: downsample every label to the minority "
    "class size with a deterministic content-hash rank",
    tags=("features", "sampling", "extension"),
)
def rebalance_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample every class to the minority-class size — the standard
    rebalancing step before training on skewed labels.

    Selection is a ROW_NUMBER over md5(vec_id): a salted content hash, so
    membership is reproducible run-over-run and shard-independent (no
    RAND(), no partition-order dependence — same discipline as
    `deterministic_hash_sample`). Scale: one keyed window per label plus a
    broadcast scalar floor; at extreme label skew the majority-class
    window parallelizes per label only, so for a single giant label use
    the salted-bucket variant (`skew_salted_agg` shows the pattern) to
    spread the rank computation, or approximate with a hash-threshold cut
    (keep if hash < n_min/n_label quantile) which needs no window at all.
    """
    e = tbl(spark, sf_dir, "embeddings")
    counts = e.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    floor_n = counts.agg(F.min("n").alias("n_min"))
    w = W.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    ranked = e.select("vec_id", "label", F.row_number().over(w).alias("rk"))
    return (
        ranked.crossJoin(F.broadcast(floor_n))
        .filter(F.col("rk") <= F.col("n_min"))
        .select("vec_id", "label")
    )
