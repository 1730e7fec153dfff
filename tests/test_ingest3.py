"""XML + binaryFile ingestion round-trips (round 4): the dialect pins that
keep the built-in XML source lossless, and the one-file-per-blob
binaryFile media ingestion path."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from messikinesisprovider_spark.operators.ingest3 import (
    _XML_OPTS,
    _XML_READ_EXTRA,
    ensure_media_blobs,
    ingest_binaryfile_media,
    ingest_xml_documents,
)

SF = "/root/testdata/sf0.001"

_DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _roundtrip_xml(spark, tmp_path, rows):
    src = spark.createDataFrame(rows, _DOC_SCHEMA)
    out = str(tmp_path / "xml")
    w = src.write.mode("overwrite")
    for k, v in _XML_OPTS.items():
        w = w.option(k, v)
    w.format("xml").save(out)
    r = spark.read.schema(_DOC_SCHEMA)
    for k, v in {**_XML_OPTS, **_XML_READ_EXTRA}.items():
        r = r.option(k, v)
    return {x["doc_id"]: x["text"] for x in r.format("xml").load(out).collect()}


def test_xml_null_empty_whitespace_distinct(spark, tmp_path):
    """NULL (\\N sentinel), '' and whitespace-only must round-trip distinct —
    the reader's default surrounding-space trim is pinned OFF."""
    got = _roundtrip_xml(
        spark,
        tmp_path,
        [
            (1, None, "en", "web", 0),
            (2, "", "en", "web", 0),
            (3, "   ", "en", "web", 3),
        ],
    )
    assert got[1] is None
    assert got[2] == ""
    assert got[3] == "   "


def test_xml_markup_newline_unicode(spark, tmp_path):
    """Markup characters must be escaped/unescaped losslessly; embedded
    newlines and non-BMP unicode survive codepoint-exact."""
    texts = {
        4: 'a <tag attr="v"> & </tag> b',
        5: "line1\nline2\tline3",
        6: "héllo 世界 🎉 \\N not-a-null",
    }
    got = _roundtrip_xml(
        spark, tmp_path, [(k, v, "en", "web", len(v)) for k, v in texts.items()]
    )
    assert got == texts


def test_xml_integrity_query_matches_parquet(spark):
    """The registered accounting over the XML export equals the same
    accounting computed directly on the original parquet."""
    from messikinesisprovider_spark.operators.ingest2 import _integrity
    from messikinesisprovider_spark.operators.relational import tbl

    xml_rows = {r["source"]: r for r in ingest_xml_documents(spark, SF).collect()}
    pq_rows = {r["source"]: r for r in _integrity(tbl(spark, SF, "documents")).collect()}
    assert xml_rows == pq_rows


def test_binaryfile_one_file_per_blob(spark):
    """The layout step writes exactly one .fimg file per selected document,
    named by doc_id."""
    root = ensure_media_blobs(spark, SF)
    files = glob.glob(os.path.join(root, "*.fimg"))
    from messikinesisprovider_spark.operators.relational import tbl

    expected = (
        tbl(spark, SF, "documents")
        .filter(F.col("text").isNotNull() & (F.col("doc_id") % 50 == 0))
        .select("doc_id")
        .collect()
    )
    ids = {int(os.path.basename(f)[4:-5]) for f in files}
    assert ids == {r["doc_id"] for r in expected}
    assert len(files) == len(expected) > 0


def test_binaryfile_decode_matches_container_arithmetic(spark):
    """binaryFile scan + shared decode stage reproduces the container
    arithmetic: header is 9 bytes, payload is the utf-8 text."""
    from messikinesisprovider_spark.operators.relational import tbl

    out = ingest_binaryfile_media(spark, SF).collect()
    assert len(out) == 1 and out[0]["decode_ok"] is True
    docs = (
        tbl(spark, SF, "documents")
        .filter(F.col("text").isNotNull() & (F.col("doc_id") % 50 == 0))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").alias("ids"),
            F.sum(F.lit(9) + F.length(F.encode("text", "utf-8"))).alias("bytes"),
        )
        .collect()[0]
    )
    assert out[0]["n_files"] == docs["n"]
    assert out[0]["id_checksum"] == docs["ids"]
    assert out[0]["total_bytes"] == docs["bytes"]
