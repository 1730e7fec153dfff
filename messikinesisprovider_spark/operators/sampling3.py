"""Deterministic sampling & split operators for training-data pipelines
(round 3 additions — registered AFTER all earlier modules; the driver walks
the registry in insertion order).

Random sampling is the wrong tool for a corpus pipeline: re-runs must
reproduce the same subset, late-arriving shards must not reshuffle earlier
decisions, and the sample membership of a document must be a pure function
of the document — not of partitioning, task order, or a seed that changed.
The production pattern is HASH-threshold sampling: keep a row iff
``hash(key) mod M < rate``. Everything here uses the portable 60-bit md5
hash (dedup.h60_spark / h60_duck), so each operator has an exact DuckDB
oracle and the judge's compare is bit-for-bit.

Scale notes: each sampler is a stateless filter or a partitionBy-keyed
window — no global windows, no driver collection, no shuffle beyond the
stated groupBy/window keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import tbl

# Per-source sample rate in percent, itself derived from the source name's
# hash: 10..50%. A lookup table would also work; hashing keeps the query
# self-contained and exercises the derive-config-from-data shape.
_RATE_SPARK = f"(10 + ({h60_spark('source')} % 41))"
_RATE_DUCK = f"(10 + ({h60_duck('source')} % 41))"
_DOC_BUCKET_SPARK = f"({h60_spark('CAST(doc_id AS STRING)')} % 100)"
_DOC_BUCKET_DUCK = f"({h60_duck('CAST(doc_id AS VARCHAR)')} % 100)"


@register(
    "sample_stratified_hash",
    oracle=f"""
    SELECT doc_id, source,
           CAST({_DOC_BUCKET_DUCK} AS INT) AS bucket,
           CAST({_RATE_DUCK} AS INT) AS rate_pct
    FROM documents
    WHERE {_DOC_BUCKET_DUCK} < {_RATE_DUCK}
    """,
    description="Stratified deterministic sampling: keep doc iff "
    "hash(doc_id)%100 < per-source rate — reproducible, partition-independent",
    tags=("sampling", "extension"),
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-threshold stratified sampling. Membership is a pure function of
    (doc_id, source): re-runs, re-partitions and incremental ingest all
    agree on the sample, which is what makes downstream dedup/eval splits
    stable across pipeline versions. Plan: a scan with one filter — fully
    pushed down, no shuffle at all."""
    d = tbl(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "source",
        F.expr(_DOC_BUCKET_SPARK).cast("int").alias("bucket"),
        F.expr(_RATE_SPARK).cast("int").alias("rate_pct"),
    ).filter(F.col("bucket") < F.col("rate_pct"))


@register(
    "split_train_val_test",
    oracle=f"""
    WITH assigned AS (
      SELECT source, doc_id,
             CASE WHEN {_DOC_BUCKET_DUCK} < 80 THEN 'train'
                  WHEN {_DOC_BUCKET_DUCK} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT source, split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM assigned GROUP BY source, split
    """,
    description="Deterministic 80/10/10 train/val/test assignment by doc_id "
    "hash, with per-(source, split) counts and id checksums",
    tags=("sampling", "split", "extension"),
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-bucket split assignment — the membership a training pipeline
    must hold FIXED forever (a doc migrating from test to train poisons
    eval). The id_checksum pins exact membership, not just counts. Plan:
    scan → project → one groupBy shuffle on (source, split)."""
    d = tbl(spark, sf_dir, "documents")
    bucket = F.expr(_DOC_BUCKET_SPARK)
    assigned = d.select(
        "source",
        "doc_id",
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    return assigned.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("id_checksum"),
    )


_PER_SOURCE_K = 5


@register(
    "sample_per_source_k",
    oracle=f"""
    SELECT source, doc_id, rnk FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {_DOC_BUCKET_DUCK}, {h60_duck('CAST(doc_id AS VARCHAR)')}, doc_id
             ) AS rnk
      FROM documents
    ) WHERE rnk <= {_PER_SOURCE_K}
    """,
    description=f"Deterministic uniform-without-replacement sample of "
    f"{_PER_SOURCE_K} docs per source (hash-ordered per-group window)",
    tags=("sampling", "window", "extension"),
)
def sample_per_source_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly k docs per group, sampled uniformly-without-replacement and
    deterministically: rank by the doc hash within each source and keep the
    k smallest. The window is PARTITIONED by source (parallel, no global
    window); at 100 TB each group ranks independently and the k-row output
    is negligible."""
    d = tbl(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.expr(_DOC_BUCKET_SPARK),
        F.expr(h60_spark("CAST(doc_id AS STRING)")),
        F.col("doc_id"),
    )
    return (
        d.select("source", "doc_id", F.row_number().over(w).cast("bigint").alias("rnk"))
        .filter(F.col("rnk") <= _PER_SOURCE_K)
    )


_NWORDS_DUCK = "LEN(str_split(text, ' '))"
_NWORDS_SPARK = "size(split(text, ' '))"


@register(
    "mixture_weights_tokens",
    oracle=f"""
    WITH per_source AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM({_NWORDS_DUCK}) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM per_source)
    SELECT p.source, p.n_docs, p.n_tokens,
           CAST(p.n_tokens AS DOUBLE) / t.total AS weight
    FROM per_source p CROSS JOIN tot t
    """,
    description="Token-proportional data-mixing weights per source "
    "(exact integer token counts; one double division)",
    tags=("sampling", "mixing", "extension"),
)
def mixture_weights_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mixing weights proportional to token mass — the input a
    data-mixing scheduler consumes. Counts stay exact integers end-to-end;
    the weight is one double division, so the compare is deterministic.
    Plan: one map-side-combined groupBy; the one-row total broadcast-joins
    back (same shape as vocab_coverage)."""
    d = tbl(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.expr(_NWORDS_SPARK)).cast("bigint").alias("n_tokens"),
    )
    tot = per_source.agg(F.sum("n_tokens").cast("bigint").alias("total"))
    return per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("total")).alias("weight"),
    )
