"""CSV/ORC ingestion round-trips (round 4): the dialect pins that keep CSV
lossless on the text corpora parquet handles natively."""

from __future__ import annotations

from pyspark.sql import functions as F

from messikinesisprovider_spark.operators.ingest2 import (
    _CSV_READ,
    _CSV_WRITE,
    ingest_csv_documents,
    ingest_orc_documents,
)

SF = "/root/testdata/sf0.001"

_DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _roundtrip_csv(spark, tmp_path, rows):
    src = spark.createDataFrame(rows, _DOC_SCHEMA)
    out = str(tmp_path / "csv")
    w = src.write.mode("overwrite")
    for k, v in _CSV_WRITE.items():
        w = w.option(k, v)
    w.csv(out)
    r = spark.read.schema(_DOC_SCHEMA)
    for k, v in _CSV_READ.items():
        r = r.option(k, v)
    return {x["doc_id"]: x["text"] for x in r.csv(out).collect()}


def test_csv_null_empty_whitespace_distinct(spark, tmp_path):
    """The three values CSV conflates by default must round-trip distinct:
    NULL (\\N sentinel), '' (quoted empty), and whitespace-only (writer
    trimming pinned OFF — Spark's CSV writer default silently trims)."""
    got = _roundtrip_csv(
        spark,
        tmp_path,
        [
            (1, None, "en", "s", 0),
            (2, "", "en", "s", 0),
            (3, "   ", "en", "s", 3),
            (4, "  padded  ", "en", "s", 10),
        ],
    )
    assert got[1] is None
    assert got[2] == ""
    assert got[3] == "   "
    assert got[4] == "  padded  "


def test_csv_newlines_quotes_unicode_backslash(spark, tmp_path):
    """Embedded newlines (multiLine), RFC-4180 doubled quotes, unicode, and
    a literal backslash-N that must NOT be mistaken for the null sentinel."""
    texts = [
        "line one\nline two\r\nline three",
        'she said "hi, there", twice',
        "naïve — 日本語 🚀   mixed",
        "literal \\N backslash-N",
        "comma, separated, values",
    ]
    rows = [(i, t, "xx", "s", len(t)) for i, t in enumerate(texts)]
    got = _roundtrip_csv(spark, tmp_path, rows)
    for i, t in enumerate(texts):
        assert got[i] == t, f"doc {i}: {got[i]!r} != {t!r}"


def test_registered_queries_match_parquet_accounting(spark):
    """Both registered round-trips reduce to the same accounting the raw
    parquet produces (the oracle relation) — spot-check one source row."""
    base = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .groupBy(F.coalesce("source", F.lit("")).alias("source"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.coalesce(F.length("text"), F.lit(0))).alias("chars"))
    )
    expect = {r["source"]: (r["n"], r["chars"]) for r in base.collect()}
    for fn in (ingest_csv_documents, ingest_orc_documents):
        got = {
            r["source"]: (r["n_docs"], r["char_checksum"])
            for r in fn(spark, SF).collect()
        }
        assert got == expect, fn.__name__
