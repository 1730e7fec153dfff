"""Exact-substring dedup + Bloom-filter join pruning, round 3 (appended).

``dedup_exact_substring``: the Lee et al. 2022 ("Deduplicating Training Data
Makes Language Models Better", arXiv:2107.06499) removal-list shape — find
every OVERLAPPING W-token span that occurs more than once corpus-wide, then
report, per document, the exact number of duplicated tokens after merging
overlapping duplicated spans into maximal intervals. This is substring-level
exact dedup: it catches boilerplate shared between otherwise-distinct
documents, which whole-document hashing (`dedup_exact`) misses, and unlike
the non-overlapping-chunk audit (`dedup_chunk_fraction`) it produces the
exact token spans a removal pass would cut.

The reference paper builds a corpus suffix array; the Spark-native
equivalent for fixed minimum match length W is the sliding W-gram hash
table: a span of length >= W is duplicated iff all of its W-grams are
duplicated, so the merged duplicated-W-gram intervals are exactly the
maximal duplicated substrings of length >= W (at W-token resolution).

Scale: this never joins document pairs — span hashes go through one
map-side-combined groupBy (frequency) and one re-join on the hash key (at
most one frequency row per hash), so a hot span costs one shuffled count,
not a candidate explosion. The interval merge is a per-document window.
At 100 TB, W-gram hashing is the standard production approach for exactly
this reason (suffix arrays don't distribute; see the paper's own
ExactSubstr implementation notes).

``bloom_semi_filter``: the runtime-filter / bloom-pruned semi-join pattern
(what Spark's own `spark.sql.optimizer.runtime.bloomFilter.enabled` injects,
and Trino/Snowflake call runtime filters) made explicit and verifiable: a
bounded bit-array built from the dimension side's join keys is broadcast to
the fact side, which drops rows that cannot join BEFORE the shuffle. The
filter is built over the portable 60-bit hash so the DuckDB oracle
reproduces the bit array, the probe verdicts, and the false-positive
accounting bit-for-bit; the no-false-negative invariant is part of the
emitted report (violations would show as n_missed > 0 and fail parity).

Reference parity note: the reference (SURVEY.md §0) has no relational
surface; these extend the engine per the round brief (LLM-pipeline dedup +
scale join patterns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import tbl

# Minimum duplicated-substring length in tokens. The paper uses 50 BPE
# tokens against web-scale corpora; the synthetic docs average ~55 words, so
# W=8 keeps the operator's interesting regime (partial overlap between
# near-duplicate docs) populated at test SF. W is a constant fold in both
# engines — changing it changes no plan shape.
SUBSTR_W = 8

_W = SUBSTR_W


@register(
    "dedup_exact_substring",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk
      FROM documents WHERE text IS NOT NULL
    ),
    eligible AS (
      SELECT doc_id, tk, LEN(tk) AS n_tokens FROM toks WHERE LEN(tk) >= {_W}
    ),
    spans0 AS (
      SELECT doc_id, n_tokens,
             UNNEST(list_transform(range(0, n_tokens - {_W - 1}),
                    i -> {{'pos': i,
                          'gh': {h60_duck(f"array_to_string(tk[i+1:i+{_W}], ' ')")}}})) AS u
      FROM eligible
    ),
    spans AS (SELECT doc_id, n_tokens, u.pos AS pos, u.gh AS gh FROM spans0),
    freq AS (SELECT gh, COUNT(*) AS n FROM spans GROUP BY gh),
    dup AS (SELECT s.doc_id, s.pos FROM spans s JOIN freq f USING (gh) WHERE f.n > 1),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN MAX(pos + {_W}) OVER w IS NULL OR pos > MAX(pos + {_W}) OVER w
                  THEN 1 ELSE 0 END AS brk
      FROM dup
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    isl2 AS (SELECT doc_id, pos,
                    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
             FROM isl),
    cov AS (SELECT doc_id, island, MAX(pos) + {_W} - MIN(pos) AS c
            FROM isl2 GROUP BY doc_id, island),
    covdoc AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS dup_tokens
               FROM cov GROUP BY doc_id),
    report AS (
      SELECT s.doc_id, ANY_VALUE(s.n_tokens) AS n_tokens, COUNT(*) AS n_spans,
             COUNT(CASE WHEN f.n > 1 THEN 1 END) AS n_dup_spans
      FROM spans s JOIN freq f USING (gh)
      GROUP BY s.doc_id
    )
    SELECT r.doc_id, r.n_tokens, r.n_spans, r.n_dup_spans,
           COALESCE(c.dup_tokens, 0) AS dup_tokens,
           CAST(COALESCE(c.dup_tokens, 0) AS DOUBLE) / r.n_tokens AS dup_frac
    FROM report r LEFT JOIN covdoc c USING (doc_id)
    """,
    description=f"Exact duplicated-substring audit (Lee et al. 2022 shape): "
    f"overlapping {_W}-token span hashes duplicated corpus-wide, merged into "
    f"maximal intervals; per-doc exact duplicated-token count",
    tags=("dedup", "substring", "extension"),
)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup via sliding W-gram hashing (see module doc).

    Plan: tokenize -> explode (pos, h60(W-gram)) structs -> groupBy hash for
    corpus frequency (map-side combined) -> re-join on hash -> per-doc
    interval merge in a doc-partitioned window -> per-doc report. One
    shuffle on the span hash, one on doc_id; no doc-pair join anywhere.
    """
    d = tbl(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    t = (
        d.select("doc_id", F.split("text", " ").alias("tk"))
        .withColumn("n_tokens", F.size("tk").cast("bigint"))  # size() is INT32; oracle LEN() is BIGINT
        .where(F.col("n_tokens") >= _W)
    )
    gram = h60_spark(f"concat_ws(' ', slice(tk, i + 1, {_W}))")
    spans = t.select(
        "doc_id",
        "n_tokens",
        F.explode(
            F.expr(f"transform(sequence(0, n_tokens - {_W}), i -> struct(i AS pos, {gram} AS gh))")
        ).alias("u"),
    ).select("doc_id", "n_tokens", F.col("u.pos").alias("pos"), F.col("u.gh").alias("gh"))

    freq = spans.groupBy("gh").agg(F.count(F.lit(1)).alias("n"))
    joined = spans.join(freq, "gh")

    report = joined.groupBy("doc_id").agg(
        F.max("n_tokens").alias("n_tokens"),  # constant per doc
        F.count(F.lit(1)).alias("n_spans"),
        F.count(F.when(F.col("n") > 1, F.lit(1))).alias("n_dup_spans"),
    )

    dup = joined.where(F.col("n") > 1).select("doc_id", "pos")
    w_prev = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(Window.unboundedPreceding, -1)
    prev_end = F.max(F.col("pos") + _W).over(w_prev)
    isl = dup.select(
        "doc_id",
        "pos",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), F.lit(1)).otherwise(F.lit(0)).alias("brk"),
    )
    w_run = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    isl2 = isl.select("doc_id", "pos", F.sum("brk").over(w_run).alias("island"))
    cov = isl2.groupBy("doc_id", "island").agg((F.max("pos") + _W - F.min("pos")).alias("c"))
    covdoc = cov.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("dup_tokens"))

    return report.join(covdoc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "n_spans",
        "n_dup_spans",
        F.coalesce("dup_tokens", F.lit(0).cast("bigint")).alias("dup_tokens"),
        (F.coalesce("dup_tokens", F.lit(0).cast("bigint")).cast("double") / F.col("n_tokens")).alias(
            "dup_frac"
        ),
    )
