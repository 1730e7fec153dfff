"""End-to-end corpus-curation pipeline as ONE registered query (round 2,
appended): quality gate → canonical dedup → per-source accounting.

The individual stages are oracle-checked standalone (quality_gopher_rules,
dedup_incremental_exact's canonical key, source_mixing_weights); this query
is the COMPOSITION evidence — the stages chain into a single Catalyst plan
with no materialization barriers, which is how the production pipeline
actually runs: one pass from raw corpus to per-source training-data
accounting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .curation import _STOP_SQL, _STOPWORDS
from .relational import tbl

_CANON_WORDS = 5  # same canonical content key as dedup_incremental_exact


@register(
    "curation_pipeline_e2e",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source, text,
             LEN(str_split(text, ' ')) AS n_words,
             CAST(LENGTH(text) - (LEN(str_split(text, ' ')) - 1) AS DOUBLE)
               / LEN(str_split(text, ' ')) AS mean_word_len,
             CAST(LEN(list_filter(str_split(text, ' '),
                                  w -> w IN ({_STOP_SQL}))) AS DOUBLE)
               / LEN(str_split(text, ' ')) AS stop_frac
      FROM documents
    ),
    gated AS (
      SELECT * FROM scored
      WHERE n_words BETWEEN 50 AND 100000
        AND mean_word_len BETWEEN 3.0 AND 10.0
        AND stop_frac >= 0.01
    ),
    keyed AS (
      SELECT *, md5(array_to_string(string_split(text, ' ')[1:{_CANON_WORDS}], ' '))
               AS content_key
      FROM gated
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY content_key
                                     ORDER BY doc_id) AS rk
        FROM keyed
      ) WHERE rk = 1
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(mean_word_len AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*) AS avg_word_len
    FROM deduped GROUP BY source
    """,
    description="One-pass curation pipeline: Gopher-style quality gate -> "
    "canonical-key first-wins dedup -> per-source doc/token accounting",
    tags=("curation", "pipeline", "composition", "extension"),
)
def curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation path in one declarative plan.

    Stage boundaries exist in the code, not the execution: Catalyst fuses
    gate + keying into the scan's codegen stage, the dedup window shuffles
    once on content_key, and the final accounting is map-side-combined on
    source. No stage materializes — at 100 TB the whole pipeline is one
    job whose only wide dependencies are the dedup key and the (tiny)
    source key. Numeric discipline as everywhere: token counts are exact
    ints, the average is one double division of a decimal-exact sum.
    """
    d = tbl(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    scored = d.select(
        "doc_id",
        "source",
        "text",
        n_words.alias("n_words"),
        ((F.length("text") - (n_words - F.lit(1))).cast("double") / n_words).alias(
            "mean_word_len"
        ),
        (
            F.size(F.filter(words, lambda w: w.isin(*_STOPWORDS))).cast("double")
            / n_words
        ).alias("stop_frac"),
    )
    gated = scored.filter(
        F.col("n_words").between(50, 100000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("stop_frac") >= 0.01)
    )
    keyed = gated.withColumn(
        "content_key",
        F.md5(F.concat_ws(" ", F.slice(words, 1, _CANON_WORDS))),
    )
    w = W.partitionBy("content_key").orderBy("doc_id")
    deduped = keyed.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("n_tokens"),
        (
            F.sum(F.col("mean_word_len").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_word_len"),
    )


_TOPK_TOKENS = 10
_SKETCH_CAPACITY = 4096  # >> synthetic vocab, so the sketch is in its exact regime


@register(
    "heavy_hitter_tokens",
    oracle=f"""
    WITH words AS (
      SELECT lang, UNNEST(str_split(text, ' ')) AS token FROM documents
    ),
    counts AS (
      SELECT lang, token, COUNT(*) AS cnt FROM words GROUP BY 1, 2
    ),
    ranked AS (
      SELECT lang, token, cnt,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY cnt DESC, token) AS rk
      FROM counts
    )
    SELECT lang, token, cnt, rk FROM ranked WHERE rk <= {_TOPK_TOKENS}
    """,
    description=f"Heavy-hitter tokens per language via approx_top_k sketch "
    f"(capacity {_SKETCH_CAPACITY}), deterministically re-ranked; oracle = "
    "exact counts",
    tags=("sketch", "heavy-hitters", "extension"),
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language heavy hitters through Spark's `approx_top_k` sketch —
    the one-pass, mergeable answer to "what dominates this key's
    distribution" that at 100 TB replaces the exact two-level aggregation
    (the sketch state is O(capacity) per key regardless of corpus size,
    and partial sketches merge map-side).

    The oracle is EXACT top-k: with capacity far above the synthetic
    vocabulary the sketch tracks every token, so its counts are exact and
    the hash check pins the whole path. At real-corpus cardinalities the
    counts become approximate — the capacity/cardinality ratio is the
    documented knob, and the deterministic re-rank (count desc, token)
    stays the tie-discipline either way.
    """
    d = tbl(spark, sf_dir, "documents")
    words = d.select("lang", F.explode(F.split("text", " ")).alias("token"))
    sk = words.groupBy("lang").agg(
        F.expr(f"approx_top_k(token, {_SKETCH_CAPACITY})").alias("tk")
    )
    exploded = sk.select(
        "lang", F.explode("tk").alias("e")
    ).select("lang", F.col("e.item").alias("token"), F.col("e.count").alias("cnt"))
    w = W.partitionBy("lang").orderBy(F.col("cnt").desc(), "token")
    return (
        exploded.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= _TOPK_TOKENS)
        .select("lang", "token", "cnt", "rk")
    )


@register(
    "dedup_cross_source_matrix",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, UNNEST(list_distinct(
        CASE WHEN LEN(str_split(text, ' ')) >= 3 THEN
          list_transform(range(1, LEN(str_split(text, ' ')) - 1),
            i -> concat_ws(' ', str_split(text, ' ')[i], str_split(text, ' ')[i+1], str_split(text, ' ')[i+2]))
        ELSE [] END)) AS g
      FROM documents
    ),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    edges AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN counts ca ON ca.doc_id = i.doc_a
      JOIN counts cb ON cb.doc_id = i.doc_b
      WHERE i.n_common * 1.0 / (ca.n + cb.n - i.n_common) >= {{thr}}
    )
    SELECT LEAST(da.source, db.source) AS source_a,
           GREATEST(da.source, db.source) AS source_b,
           COUNT(*) AS n_pairs
    FROM edges e
    JOIN documents da ON da.doc_id = e.doc_a
    JOIN documents db ON db.doc_id = e.doc_b
    GROUP BY 1, 2
    """.replace("{thr}", "0.2"),
    description="Near-duplicate provenance matrix: exact-Jaccard pairs "
    "rolled up by unordered source pair — where duplicated content flows "
    "between corpus sources",
    tags=("dedup", "provenance", "composition", "extension"),
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources duplicate each other — the provenance question asked
    right after any dedup pass (mirrors vs plagiarism vs common templates
    have different curation remedies).

    Composition over the oracle-checked exact pair generator
    (`dedup_ngram_jaccard`): attach each endpoint's source with a slim
    BROADCAST (doc_id, source) projection, canonicalize the pair order so
    (A,B) and (B,A) collapse, and count. The pair list is orders of
    magnitude smaller than the corpus, so this rollup is free next to the
    candidate generation it reuses — and at scale it runs over the
    PERSISTED pair table the dedup job already wrote.
    """
    from .dedup import dedup_ngram_jaccard

    edges = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    src = tbl(spark, sf_dir, "documents").select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    sb = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    joined = edges.join(F.broadcast(sa), "doc_a").join(F.broadcast(sb), "doc_b")
    return (
        joined.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
