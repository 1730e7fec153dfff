"""Bucketed-table co-located join — the 100 TB strategy for repeated
big-big joins.

Both fact tables are written ONCE bucketed + sorted on the join key
(`ensure_bucketed_tables`, the offline table-layout step); every subsequent
join on that key is then a sort-merge join with ZERO exchange feeding it —
the shuffle was paid at write time, amortized over every future query. This
is the DataFrame analog of the reference's per-shard physical partitioning
(data already co-located by key on arrival), applied to relational joins.

The registered query joins bucketed orders x lineitem with a merge hint (so
the plan shape is deterministic regardless of size estimates) and aggregates
per order priority; `tests/test_plans.py` pins the no-exchange plan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import _osum, dsum, tbl

N_BUCKETS = 16
_DB = "bucketed"


def ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Write orders/lineitem as bucketed+sorted tables for `sf_dir` if they
    don't exist yet (idempotent). Returns {base_name: qualified_name}."""
    import shutil
    from urllib.parse import urlparse

    tag = re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.strip("/"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {_DB}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    names: dict[str, str] = {}
    for table, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        qual = f"{_DB}.{table}_{tag}"
        if not spark.catalog.tableExists(qual):
            # the session catalog is in-memory: a previous process may have
            # left the managed location behind — clear it before rewriting
            # (bucket metadata lives in the catalog, so the files alone are
            # not reusable as a *bucketed* table)
            leftover = f"{warehouse}/{_DB}.db/{table}_{tag}"
            shutil.rmtree(leftover, ignore_errors=True)
            (
                tbl(spark, sf_dir, table)
                .write.bucketBy(N_BUCKETS, key)
                .sortBy(key)
                .mode("overwrite")
                .saveAsTable(qual)
            )
        names[table] = qual
    return names


@register(
    "join_bucketed_colocated",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           {_osum("l.l_quantity", "sum_qty")}
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    description="Big-big join over pre-bucketed tables: shuffle-free sort-merge join",
    tags=("join", "bucketed", "scale"),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = ensure_bucketed_tables(spark, sf_dir)
    o = spark.table(names["orders"])
    li = spark.table(names["lineitem"])
    return (
        li.hint("merge")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity", "sum_qty"),
        )
    )
