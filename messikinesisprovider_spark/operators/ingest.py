"""JSONL ingestion, round 3 (appended).

``ingest_jsonl_documents``: training corpora interchange as JSON Lines —
this proves the engine's JSONL path end-to-end: the documents table is
exported to JSONL once per session (the offline layout step, like
bucketing/partitioning), read back with an EXPLICIT schema (schema
inference is a full extra pass over 100 TB — never pay it), and reduced
to per-source integrity accounting whose oracle runs on the ORIGINAL
parquet — so the compare proves the JSON round-trip preserved every row,
every id, every character (unicode, embedded newlines and NULLs
included; the edge fixtures exercise exactly those).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import tbl

_JSONL: dict[tuple[int, str], str] = {}

_DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def ensure_jsonl_documents(spark: SparkSession, sf_dir: str) -> str:
    """Export (once per session+sf) the documents table as JSON Lines."""
    key = (id(spark), sf_dir)
    if key in _JSONL and os.path.isdir(_JSONL[key]):
        return _JSONL[key]
    out = os.path.join(tempfile.mkdtemp(prefix="docs_jsonl_"), "documents")
    tbl(spark, sf_dir, "documents").write.mode("overwrite").json(out)
    _JSONL[key] = out
    return out


_JSONL_ORACLE = """
SELECT COALESCE(source, '') AS source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
       CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_text,
       CAST(SUM(COALESCE(length(text), 0)) AS BIGINT) AS char_checksum,
       CAST(SUM(COALESCE(n_chars, 0)) AS BIGINT) AS n_chars_sum
FROM documents
GROUP BY 1
"""


@register(
    "ingest_jsonl_documents",
    oracle=_JSONL_ORACLE,
    description="JSONL ingestion round-trip: documents exported to JSON Lines, "
    "read back with an explicit schema, per-source integrity accounting vs the "
    "original parquet (ids, NULLs, unicode character counts)",
    tags=("ingest", "format", "jsonl", "extension"),
)
def ingest_jsonl_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the JSONL export (see module doc). `length()` counts CODEPOINTS
    in both engines, so the char_checksum catches any unicode mangling in
    the JSON encode/decode."""
    root = ensure_jsonl_documents(spark, sf_dir)
    docs = spark.read.schema(_DOC_SCHEMA).json(root)
    return docs.groupBy(F.coalesce(F.col("source"), F.lit("")).alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null_text"),
        F.sum(F.coalesce(F.length("text"), F.lit(0))).cast("long").alias("char_checksum"),
        F.sum(F.coalesce(F.col("n_chars"), F.lit(0))).cast("long").alias("n_chars_sum"),
    )
