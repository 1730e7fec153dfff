"""XML + binary-file ingestion round-trips, round 4 (appended).

Two more ingress paths on the integrity-accounting contract of
``ingest.py`` / ``ingest2.py`` (export once per session as the offline
layout step, read back, reduce to accounting whose oracle runs on the
ORIGINAL parquet):

- ``ingest_xml_documents`` — Spark 4's built-in XML source (the donated
  spark-xml). XML has the same NULL-vs-empty ambiguity as CSV, plus a
  reader that TRIMS surrounding whitespace by default
  (``ignoreSurroundingSpaces`` defaults true — a whitespace-only document
  would silently collapse); the dialect below pins both:
  ``nullValue '\\N'`` so NULL != '' and ``ignoreSurroundingSpaces false``.
  Markup characters (``< > &``), newlines and unicode are covered by the
  char/codepoint checksums.

- ``ingest_binaryfile_media`` — the object-store media-ingestion shape: a
  deterministic subset of documents is synthesized into FIMG containers
  and written as ONE FILE PER BLOB (executor-side ``foreachPartition``,
  the way image/audio corpora actually land on S3/GCS), then ingested via
  Spark's built-in ``binaryFile`` source (path + content rows), doc ids
  recovered from filenames, payloads decoded through the SAME Arrow-batched
  ``decode_image_meta`` stage as ``multimodal_decode_pipeline``. The FIMG
  container is deterministic from `text`, so the DuckDB oracle derives
  every decoded aggregate from the documents table without touching a
  file — the compare proves file write → binaryFile scan → mapInPandas
  decode is lossless end-to-end.

At 100 TB: the XML export/read is a plain distributed scan (one task per
file split; binaryFile is one row per object, listed and read in
parallel). The per-blob write fan-out runs on executors against the
shared store — no driver collect anywhere. The blob subset is
hash-selected (``doc_id % _BLOB_MOD = 0``) purely to keep the TEST
filesystem footprint bounded; the operators themselves are
subset-agnostic.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .ingest import _DOC_SCHEMA, _JSONL_ORACLE
from .ingest2 import _ensure_export, _integrity
from .multimodal import decode_image_meta, synthesize_image_column
from .relational import tbl

_XML_OPTS = {
    "rowTag": "doc",
    "nullValue": "\\N",  # NULL != '' (same sentinel as the CSV dialect)
}
_XML_READ_EXTRA = {
    # reader default is TRUE: surrounding whitespace would be trimmed and a
    # whitespace-only document silently becomes '' (edge-sweep catch, the
    # same class as CSV's ignore*WhiteSpace write default)
    "ignoreSurroundingSpaces": "false",
}


@register(
    "ingest_xml_documents",
    oracle=_JSONL_ORACLE,
    description="XML ingestion round-trip (Spark 4 built-in XML source) with "
    "a pinned dialect (\\N null sentinel, surrounding-space trimming OFF) — "
    "per-source integrity accounting vs the original parquet proves "
    "NULL/empty/whitespace/markup/unicode text all survive",
    tags=("ingest", "format", "xml", "extension"),
)
def ingest_xml_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _ensure_export(spark, sf_dir, "xml", _XML_OPTS)
    r = spark.read.schema(_DOC_SCHEMA)
    for k, v in {**_XML_OPTS, **_XML_READ_EXTRA}.items():
        r = r.option(k, v)
    return _integrity(r.format("xml").load(root))


# ---------------------------------------------------------------------------
# ingest_binaryfile_media
# ---------------------------------------------------------------------------

_BLOB_MOD = 50  # 1-in-50 hash-selected blob subset (test footprint bound)
_BLOB_DIRS: dict[tuple[int, str], str] = {}


def ensure_media_blobs(spark: SparkSession, sf_dir: str) -> str:
    """Layout step (once per session+sf): write the selected documents as
    individual ``doc_<id>.fimg`` files from EXECUTORS (foreachPartition) —
    the object-store landing pattern for media corpora."""
    key = (id(spark), sf_dir)
    if key in _BLOB_DIRS and os.path.isdir(_BLOB_DIRS[key]):
        return _BLOB_DIRS[key]
    out = tempfile.mkdtemp(prefix="media_blobs_")
    blobs = synthesize_image_column(
        tbl(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull() & (F.col("doc_id") % _BLOB_MOD == 0)
        )
    )

    def write_partition(rows):
        for row in rows:
            with open(os.path.join(out, f"doc_{row['doc_id']}.fimg"), "wb") as f:
                f.write(bytes(row["image"]))

    blobs.foreachPartition(write_partition)
    _BLOB_DIRS[key] = out
    return out


_BINARYFILE_ORACLE = f"""
SELECT TRUE AS decode_ok,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
       CAST(SUM(9 + octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(MAX(1 + (('0x' || substr(md5(text), 1, 4))::INT % 2048)) AS BIGINT) AS max_width,
       CAST(MAX(1 + (('0x' || substr(md5(text), 5, 4))::INT % 2048)) AS BIGINT) AS max_height
FROM documents
WHERE text IS NOT NULL AND doc_id % {_BLOB_MOD} = 0
HAVING COUNT(*) > 0
"""


@register(
    "ingest_binaryfile_media",
    oracle=_BINARYFILE_ORACLE,
    description="Media-object ingestion: blobs written one-file-per-payload "
    "from executors, ingested via the built-in binaryFile source, doc ids "
    "recovered from filenames, decoded through the shared Arrow-batched "
    "decode stage — integrity accounting vs the synthesizing arithmetic",
    tags=("ingest", "multimodal", "binaryfile", "extension"),
)
def ingest_binaryfile_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = ensure_media_blobs(spark, sf_dir)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.fimg")
        .load(root)
        .select(
            F.regexp_extract(F.col("path"), r"doc_(\d+)\.fimg$", 1)
            .cast("long")
            .alias("doc_id"),
            F.col("content").alias("image"),
        )
    )
    meta = decode_image_meta(files)
    return meta.groupBy("decode_ok").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.max("width").cast("long").alias("max_width"),
        F.max("height").cast("long").alias("max_height"),
    )
