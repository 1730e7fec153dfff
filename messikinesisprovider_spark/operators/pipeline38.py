"""Round 4 additions, part 13: refresh-stream maintenance, schema
evolution on read.

- ``tpch_rf_maintenance`` — the TPC-H refresh-function shape (RF1 insert
  batch / RF2 delete batch) as one deterministic maintenance pass:
  a hash-selected delete set leaves via anti-join, a hash-derived insert
  batch (existing rows re-keyed above the current max key — the 1-row
  scalar broadcast) arrives via union, and the per-status pricing
  aggregate runs over the MAINTAINED table. Complements
  ``scd2_incremental_merge`` (key-versioned upsert) and
  ``ivm_agg_maintenance`` (partial-aggregate delta merge): this is the
  fact-table batch insert/delete algebra itself. At 100 TB: anti-join
  shuffles keys only; the insert batch is a map-side projection; the
  aggregate is the standard partial/final reduce.

- ``schema_evolution_read`` — the lakehouse staple the ingest family
  hasn't pinned yet: two parquet exports of the documents table written
  with DIFFERENT schemas (v1 drops `lang`, v2 adds a typed `quality`
  column), read back as ONE dataset with ``mergeSchema=true``. Columns
  absent in a file come back NULL for its rows; the accounting proves
  both directions (old-reader-new-file and new-reader-old-file) and that
  no rows or codepoints were lost in the union.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import tbl

# ---------------------------------------------------------------------------
# tpch_rf_maintenance
# ---------------------------------------------------------------------------

_DEL_MOD = 10  # delete keys with h60 % 10 == 7
_INS_MOD = 10  # re-insert (re-keyed) rows with h60 % 10 == 3

_RF_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DECIMAL(18,6)) AS p
  FROM orders WHERE o_orderkey IS NOT NULL
),
mx AS (SELECT COALESCE(MAX(o_orderkey), 0) AS mk FROM base),
kept AS (
  SELECT * FROM base
  WHERE {h60_duck("CAST(o_orderkey AS VARCHAR) || '|rf2'")} % {_DEL_MOD} <> 7
),
ins AS (
  SELECT b.o_orderkey + mx.mk AS o_orderkey, b.o_orderstatus, b.p
  FROM base b CROSS JOIN mx
  WHERE {h60_duck("CAST(b.o_orderkey AS VARCHAR) || '|rf1'")} % {_INS_MOD} = 3
),
maintained AS (
  SELECT * FROM kept UNION ALL SELECT * FROM ins
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(p) AS DOUBLE) AS total_price,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
FROM maintained GROUP BY 1
"""


@register(
    "tpch_rf_maintenance",
    oracle=_RF_ORACLE,
    description="TPC-H refresh-function maintenance (RF1 insert batch above "
    "the max key + RF2 hash-selected delete batch via anti-join) with the "
    "per-status pricing aggregate over the maintained fact table",
    tags=("lakeops", "maintenance", "tpch", "extension"),
)
def tpch_rf_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        tbl(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey").isNotNull())
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("decimal(18,6)").alias("p"),
        )
    )
    mx = base.agg(F.coalesce(F.max("o_orderkey"), F.lit(0)).alias("mk"))
    kept = base.filter(
        F.expr(h60_spark("CAST(o_orderkey AS STRING) || '|rf2'")) % _DEL_MOD != 7
    )
    ins = (
        base.filter(
            F.expr(h60_spark("CAST(o_orderkey AS STRING) || '|rf1'")) % _INS_MOD == 3
        )
        .crossJoin(F.broadcast(mx))
        .select(
            (F.col("o_orderkey") + F.col("mk")).alias("o_orderkey"),
            "o_orderstatus",
            "p",
        )
    )
    maintained = kept.unionByName(ins)
    return maintained.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("p").cast("double").alias("total_price"),
        F.sum("o_orderkey").cast("long").alias("key_checksum"),
    )


# ---------------------------------------------------------------------------
# schema_evolution_read
# ---------------------------------------------------------------------------

_EVO_DIRS: dict[tuple[int, str], str] = {}


def ensure_evolved_exports(spark: SparkSession, sf_dir: str) -> str:
    """Layout step: write the documents corpus as two parquet 'generations'
    under one directory — v1 without `lang`, v2 with an added typed
    `quality` column — the schema-drift layout a long-lived dataset grows."""
    key = (id(spark), sf_dir)
    if key in _EVO_DIRS and os.path.isdir(_EVO_DIRS[key]):
        return _EVO_DIRS[key]
    out = os.path.join(tempfile.mkdtemp(prefix="schema_evo_"), "docs")
    d = tbl(spark, sf_dir, "documents")
    v1 = d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text", "source", "n_chars")
    v2 = d.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id",
        "text",
        "lang",
        "source",
        "n_chars",
        (F.col("doc_id") % 100).cast("long").alias("quality"),
    )
    v1.write.mode("overwrite").parquet(os.path.join(out, "gen=1"))
    v2.write.mode("overwrite").parquet(os.path.join(out, "gen=2"))
    _EVO_DIRS[key] = out
    return out


_EVO_ORACLE = """
SELECT COALESCE(source, '') AS source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
       CAST(SUM(CASE WHEN doc_id % 2 = 0 OR lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_null,
       CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN doc_id % 100 ELSE 0 END) AS BIGINT) AS quality_sum,
       CAST(SUM(COALESCE(length(text), 0)) AS BIGINT) AS char_checksum
FROM documents
GROUP BY 1
"""


@register(
    "schema_evolution_read",
    oracle=_EVO_ORACLE,
    description="Schema evolution on read: two parquet generations (v1 "
    "without `lang`, v2 with an added `quality` column) read as one dataset "
    "via mergeSchema — absent columns surface as NULL, and the accounting "
    "proves no rows or codepoints were lost across the drift",
    tags=("ingest", "lakeops", "schema", "extension"),
)
def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = (
        "source string, n_docs bigint, id_checksum bigint, n_lang_null bigint, "
        "quality_sum bigint, char_checksum bigint"
    )
    if tbl(spark, sf_dir, "documents").limit(1).count() == 0:
        return spark.createDataFrame([], schema)
    root = ensure_evolved_exports(spark, sf_dir)
    merged = spark.read.option("mergeSchema", "true").parquet(root)
    return merged.groupBy(F.coalesce(F.col("source"), F.lit("")).alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
        F.sum(F.when(F.col("lang").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_lang_null"),
        F.sum(F.coalesce(F.col("quality"), F.lit(0))).cast("long").alias("quality_sum"),
        F.sum(F.coalesce(F.length("text"), F.lit(0))).cast("long").alias("char_checksum"),
    )
