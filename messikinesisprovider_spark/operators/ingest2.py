"""CSV + ORC ingestion round-trips, round 4 (appended).

Format breadth beyond parquet/JSONL (`ingest.py`): the same
integrity-accounting contract — export the documents table once per
session (offline layout step), read it back with an EXPLICIT schema, and
reduce to per-source accounting whose oracle runs on the ORIGINAL parquet,
so the compare proves the round-trip preserved every row, id and codepoint.

``ingest_csv_documents`` is the honest hard case. CSV cannot natively
distinguish NULL from '' and corpus text embeds newlines/quotes/unicode,
so the writer pins the dialect explicitly:

- nullValue '\\N' (the classic MySQL-dump sentinel) so NULL != empty —
  without it Spark writes NULL as '' and reads '' back as NULL, silently
  corrupting every empty-string document (the edge fixtures catch this),
- emptyValue '""' so genuinely empty strings survive as quoted empties,
- escape '"' (RFC-4180 doubled quotes) and multiLine=true on read for
  embedded newlines.

``ingest_orc_documents``: ORC is schema-complete like parquet, so the
round-trip needs no dialect pinning — the value is exercising Spark's ORC
reader/writer path end-to-end on the same contract.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .ingest import _DOC_SCHEMA, _JSONL_ORACLE
from .relational import tbl

_EXPORTS: dict[tuple[int, str, str], str] = {}


def _ensure_export(spark: SparkSession, sf_dir: str, fmt: str, options: dict) -> str:
    key = (id(spark), sf_dir, fmt)
    if key in _EXPORTS and os.path.isdir(_EXPORTS[key]):
        return _EXPORTS[key]
    out = os.path.join(tempfile.mkdtemp(prefix=f"docs_{fmt}_"), "documents")
    w = tbl(spark, sf_dir, "documents").write.mode("overwrite")
    for k, v in options.items():
        w = w.option(k, v)
    w.format(fmt).save(out)
    _EXPORTS[key] = out
    return out


_CSV_WRITE = {
    "header": "true",
    "nullValue": "\\N",
    "emptyValue": '""',
    "quote": '"',
    "escape": '"',
    # Spark's CSV WRITER trims field whitespace by default (univocity
    # ignoreLeading/TrailingWhiteSpace default true on write) — a
    # whitespace-only document would silently become '' (edge sweep catch).
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
}
_CSV_READ = {
    "header": "true",
    "nullValue": "\\N",
    "emptyValue": "",
    "quote": '"',
    "escape": '"',
    "multiLine": "true",
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
}


def _integrity(docs: DataFrame) -> DataFrame:
    """Per-source integrity accounting — the shared reduce both formats
    (and ingest.py's JSONL) compare against the parquet-based oracle."""
    return docs.groupBy(F.coalesce(F.col("source"), F.lit("")).alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null_text"),
        F.sum(F.coalesce(F.length("text"), F.lit(0))).cast("long").alias("char_checksum"),
        F.sum(F.coalesce(F.col("n_chars"), F.lit(0))).cast("long").alias("n_chars_sum"),
    )


@register(
    "ingest_csv_documents",
    oracle=_JSONL_ORACLE,
    description="CSV ingestion round-trip with a pinned dialect (\\N null "
    "sentinel, RFC-4180 quoting, multiLine) — per-source integrity "
    "accounting vs the original parquet proves NULL/empty/newline/unicode "
    "text all survive",
    tags=("ingest", "format", "csv", "extension"),
)
def ingest_csv_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _ensure_export(spark, sf_dir, "csv", _CSV_WRITE)
    r = spark.read.schema(_DOC_SCHEMA)
    for k, v in _CSV_READ.items():
        r = r.option(k, v)
    return _integrity(r.csv(root))


@register(
    "ingest_orc_documents",
    oracle=_JSONL_ORACLE,
    description="ORC ingestion round-trip (schema-complete columnar format, "
    "explicit read schema) — per-source integrity accounting vs the "
    "original parquet",
    tags=("ingest", "format", "orc", "extension"),
)
def ingest_orc_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _ensure_export(spark, sf_dir, "orc", {})
    return _integrity(spark.read.schema(_DOC_SCHEMA).orc(root))
