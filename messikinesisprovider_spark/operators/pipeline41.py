"""Round 4 additions, part 16: cogrouped applyInPandas.

``cogroup_order_reconcile`` — the fourth member of the pandas UDF surface
(beside pandas_udf aggregates, grouped applyInPandas, mapInPandas/UDTF and
mapInArrow): ``groupBy().cogroup().applyInPandas`` receives BOTH sides of
a key as pandas frames and merges them in Python.

Key choice is the scale lesson here: cogrouping on the BUSINESS key
(orderkey) means one Python call and two 1-row frames per order — measured
55 s for 15k orders, i.e. per-key overhead dominates and grows linearly
with keys. Instead the cogroup key is a HASH BUCKET (h60(orderkey) % 64):
64 Python calls total, each receiving bucket-sized frames that are merged
VECTORIZED inside pandas (outer merge on orderkey + groupby), which is the
shape that survives 100 TB — per-call overhead is amortized over thousands
of keys while Spark still shuffles both sides once.

Semantics: per order, header row reconciled with its lineitems — item
count, line revenue in integer micro-units (each extendedprice·(1−discount)
has ≤4 decimal digits, so ×1e6 is an exact integer per ITEM; no
accumulation-order or tie risk), header-present flag — reduced per
(status, has_header). The FULL OUTER JOIN oracle value-verifies the
pairing, including keys present on only one side.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import h60_spark
from .relational import tbl

_N_BUCKETS = 64

_PARTIAL_SCHEMA = (
    "o_orderstatus string, has_header boolean, n_orders bigint, "
    "total_items bigint, revenue_micro_sum bigint, key_checksum bigint"
)


def _reconcile(key, orders_pdf: pd.DataFrame, items_pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized intra-bucket reconcile: outer-merge headers with per-order
    item aggregates, then per-(status, header) partial sums."""
    if len(items_pdf):
        items_pdf = items_pdf.assign(
            rev=(
                items_pdf["l_extendedprice"] * (1.0 - items_pdf["l_discount"]) * 1_000_000
            )
            .round()
            .astype("int64")
        )
        li = (
            items_pdf.groupby("o_orderkey")
            .agg(n_items=("rev", "size"), rev=("rev", "sum"))
            .reset_index()
        )
    else:
        li = pd.DataFrame({"o_orderkey": pd.Series(dtype="int64"),
                           "n_items": pd.Series(dtype="int64"),
                           "rev": pd.Series(dtype="int64")})
    o = orders_pdf[["o_orderkey", "o_orderstatus"]] if len(orders_pdf) else pd.DataFrame(
        {"o_orderkey": pd.Series(dtype="int64"), "o_orderstatus": pd.Series(dtype="object")}
    )
    rec = o.merge(li, on="o_orderkey", how="outer", indicator=True)
    rec = rec.assign(
        has_header=rec["_merge"].isin(["both", "left_only"]),
        n_items=rec["n_items"].fillna(0).astype("int64"),
        rev=rec["rev"].fillna(0).astype("int64"),
        o_orderstatus=rec["o_orderstatus"].fillna(""),
    )
    out = (
        rec.groupby(["o_orderstatus", "has_header"])
        .agg(
            n_orders=("o_orderkey", "size"),
            total_items=("n_items", "sum"),
            revenue_micro_sum=("rev", "sum"),
            key_checksum=("o_orderkey", "sum"),
        )
        .reset_index()
    )
    return out[
        ["o_orderstatus", "has_header", "n_orders", "total_items",
         "revenue_micro_sum", "key_checksum"]
    ]


_COG_ORACLE = """
WITH li AS (
  SELECT l_orderkey,
         COUNT(*) AS n_items,
         SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 1000000) AS BIGINT)) AS rev
  FROM lineitem WHERE l_orderkey IS NOT NULL
  GROUP BY 1
),
o AS (SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey IS NOT NULL),
rec AS (
  SELECT COALESCE(o.o_orderkey, li.l_orderkey) AS k,
         COALESCE(o.o_orderstatus, '') AS o_orderstatus,
         COALESCE(li.n_items, 0) AS n_items,
         COALESCE(li.rev, 0) AS rev,
         o.o_orderkey IS NOT NULL AS has_header
  FROM o FULL OUTER JOIN li ON li.l_orderkey = o.o_orderkey
)
SELECT o_orderstatus, has_header,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(n_items) AS BIGINT) AS total_items,
       CAST(SUM(rev) AS BIGINT) AS revenue_micro_sum,
       CAST(SUM(k) AS BIGINT) AS key_checksum
FROM rec GROUP BY 1, 2
"""


@register(
    "cogroup_order_reconcile",
    oracle=_COG_ORACLE,
    description="Cogrouped applyInPandas (the 4th pandas surface), keyed on "
    f"hash BUCKETS ({_N_BUCKETS}) not business keys: bucket-sized frames "
    "merged vectorized in pandas (outer merge + groupby partials), so "
    "per-call Python overhead amortizes — order headers reconciled with "
    "lineitems (integer-micro revenue, one-sided keys), FULL OUTER oracle",
    tags=("udf-surface", "cogroup", "relational", "extension"),
)
def cogroup_order_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket = F.expr(h60_spark("CAST(o_orderkey AS STRING)") + f" % {_N_BUCKETS}")
    o = (
        tbl(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey").isNotNull())
        .select("o_orderkey", "o_orderstatus", bucket.alias("b"))
    )
    li = (
        tbl(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey").isNotNull())
        .select(
            F.col("l_orderkey").alias("o_orderkey"),
            "l_extendedprice",
            "l_discount",
            F.expr(h60_spark("CAST(l_orderkey AS STRING)") + f" % {_N_BUCKETS}").alias("b"),
        )
    )
    partials = (
        o.groupBy("b")
        .cogroup(li.groupBy("b"))
        .applyInPandas(_reconcile, schema=_PARTIAL_SCHEMA)
    )
    return partials.groupBy("o_orderstatus", "has_header").agg(
        F.sum("n_orders").cast("long").alias("n_orders"),
        F.sum("total_items").cast("long").alias("total_items"),
        F.sum("revenue_micro_sum").cast("long").alias("revenue_micro_sum"),
        F.sum("key_checksum").cast("long").alias("key_checksum"),
    )
