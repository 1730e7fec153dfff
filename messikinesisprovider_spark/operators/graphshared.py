"""Shared materialized co-purchase edge table (round 4).

The graph/mining family (`triangle_count`, `graph_khop_reach`,
`graph_jaccard_links`, `graph_label_propagation`) each re-derived the
support-2 co-purchase edge list from `lineitem` per query — the round-3
verdict's top cost item (the mining self-join was 4 of the top-5 bench
entries). At 100 TB a derived graph is written ONCE as a warehouse table
and every downstream query reads it; this module owns that layout step,
following the `bucketed.ensure_bucketed_tables` pattern:

- ``ensure_copurchase_edges``: mine support-2 undirected edges (a < b)
  from lineitem and save them bucketed+sorted on ``a`` (joins and
  degree aggregations keyed on the source endpoint start shuffle-free).
- ``copurchase_edges``: the reader every graph query goes through.
- ``graph_edges_materialized`` (registered): integrity audit of the
  materialized table — edge count, endpoint counts and an order-free
  checksum — whose oracle re-mines from raw lineitem, so the compare
  proves the materialized table IS the mining result (the same
  round-trip-proof shape as ``partition_pruned_daily``).

The mining itself moved here verbatim from ``graph2._copurchase_edges``
(which now delegates), so all existing call sites and oracles are
unchanged.
"""

from __future__ import annotations

import re
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import tbl

_SUPPORT = 2  # co-purchase support for the shared graph edge set
N_BUCKETS = 16
_DB = "graph"


def mine_copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected unique edges (a < b) of the support-2 co-purchase graph,
    mined from lineitem: distinct (order, part), parts pruned to support >=
    2 (A-priori), per-order pair generation, pair support >= 2."""
    li = tbl(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    freq = (
        op.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _SUPPORT)
        .select("l_partkey")
    )
    fop = op.join(F.broadcast(freq), "l_partkey")
    a = fop.select(F.col("l_orderkey"), F.col("l_partkey").alias("pa"))
    b = fop.select(F.col("l_orderkey"), F.col("l_partkey").alias("pb"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= _SUPPORT)
        .select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    )


def ensure_copurchase_edges(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per warehouse+sf) the support-2 edge list as a
    table bucketed+sorted on `a`. Returns the qualified table name."""
    tag = re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.strip("/"))
    qual = f"{_DB}.edges_{tag}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {_DB}")
    if not spark.catalog.tableExists(qual):
        # in-memory catalog: a previous process may have left the managed
        # location behind — clear it (bucket metadata lives in the catalog,
        # the bare files are not reusable as a *bucketed* table)
        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(f"{warehouse}/{_DB}.db/edges_{tag}", ignore_errors=True)
        (
            mine_copurchase_edges(spark, sf_dir)
            .write.bucketBy(N_BUCKETS, "a")
            .sortBy("a")
            .mode("overwrite")
            .saveAsTable(qual)
        )
    return qual


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared reader: support-2 co-purchase edges (columns a, b; a < b)
    from the materialized bucketed table."""
    return spark.table(ensure_copurchase_edges(spark, sf_dir)).select("a", "b")


def mine_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support-3 basket-capped weighted pair mining — the exact
    `lakeops.copurchase_pairs` pipeline (A-priori item pruning, basket
    width cap, equi-join pair generation); moved here so the pair table
    can be materialized once and shared with `assoc_rules_lift`."""
    from .lakeops import _MAX_BASKET, _MIN_SUPPORT

    li = tbl(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    freq = (
        op.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _MIN_SUPPORT)
        .select("l_partkey")
    )
    fop = op.join(F.broadcast(freq), "l_partkey")
    sized = (
        fop.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") <= _MAX_BASKET)
        .select("l_orderkey")
    )
    capped = fop.join(sized, "l_orderkey")
    a = capped.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = capped.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    pairs = a.join(b, "l_orderkey").filter(F.col("part_a") < F.col("part_b"))
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= _MIN_SUPPORT)
    )


def ensure_copurchase_pairs(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per warehouse+sf) the weighted support-3 pair
    table, bucketed+sorted on part_a. Returns the qualified table name."""
    tag = re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.strip("/"))
    qual = f"{_DB}.pairs_{tag}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {_DB}")
    if not spark.catalog.tableExists(qual):
        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(f"{warehouse}/{_DB}.db/pairs_{tag}", ignore_errors=True)
        (
            mine_copurchase_pairs(spark, sf_dir)
            .write.bucketBy(N_BUCKETS, "part_a")
            .sortBy("part_a")
            .mode("overwrite")
            .saveAsTable(qual)
        )
    return qual


def copurchase_pairs_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared reader for the weighted support-3 co-purchase pair table."""
    return spark.table(ensure_copurchase_pairs(spark, sf_dir)).select(
        "part_a", "part_b", "n_orders"
    )


_EDGES_ORACLE = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
freq AS (
  SELECT l_partkey FROM op GROUP BY 1 HAVING COUNT(*) >= {_SUPPORT}
),
fop AS (SELECT op.* FROM op JOIN freq USING (l_partkey)),
e AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM fop a JOIN fop b ON a.l_orderkey = b.l_orderkey
   AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {_SUPPORT}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(COUNT(DISTINCT a) AS BIGINT) AS n_src,
       CAST(COUNT(DISTINCT b) AS BIGINT) AS n_dst,
       CAST(COALESCE(SUM(a * 1000003 + b), 0) AS BIGINT) AS edge_checksum
FROM e
"""


@register(
    "graph_edges_materialized",
    oracle=_EDGES_ORACLE,
    description="Integrity audit of the materialized co-purchase edge table "
    "(count, endpoint counts, order-free checksum) vs re-mining from raw "
    "lineitem — proves the shared layout step is lossless",
    tags=("graph", "layout", "extension"),
)
def graph_edges_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit the shared edge table against its mining definition."""
    e = copurchase_edges(spark, sf_dir)
    return e.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.count_distinct("a").cast("long").alias("n_src"),
        F.count_distinct("b").cast("long").alias("n_dst"),
        F.coalesce(
            F.sum(F.col("a") * F.lit(1000003) + F.col("b")), F.lit(0)
        )
        .cast("long")
        .alias("edge_checksum"),
    )
