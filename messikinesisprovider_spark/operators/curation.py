"""Training-data pipeline operators, part 3: corpus curation.

The stages between "deduplicated crawl" and "tokenizer-ready shards" that the
earlier dedup/similarity/text families don't cover:

- Gopher-style multi-rule quality gating (Rae et al. 2021, arXiv:2112.11446):
  word count, mean word length, and stop-word density rules as independent
  boolean flags plus the conjunction.
- Contiguous sequence packing: assign documents to fixed-token-budget bins in
  a deterministic per-source order — the standard "pack in order, split at
  the budget boundary" used when building pretraining shards.
- Temperature-based source mixing (multilingual/multi-source sampling a la
  GPT-3 / mT5): per-source token shares and alpha=0.5 temperature weights.
- Term-salience top-k: an integer-exact TF-IDF variant (tf·1e6 div df) so
  the ranking is reproducible bit-for-bit across engines (no log()).
- Chunk-level duplication audit: fraction of each document's non-overlapping
  8-word chunks that occur more than once corpus-wide (C4-style duplicated
  span detection at chunk granularity).
- Per-source language diversity via Gini impurity computed from exact
  integer sums (no floating-point accumulation across rows).
- Int8 embedding quantization with exact round-trip error stats.

Cross-engine determinism notes (driver hashes values): every floating-point
column here is produced by a single division / sqrt of exactly-computed
integer or sequential-fold inputs, the same discipline as the registry
docstring describes. Integer floor division is `div` (Spark) == `//`
(DuckDB) on non-negative longs. All hot paths are whole-stage-codegen
Catalyst; there is no Python in any of these operators.

100 TB notes are per-operator in the docstrings. None of these collect to
the driver; the only global window (source mixing) runs over the post-
aggregation source table (a handful of rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .relational import tbl

_STOPWORDS = ("the", "a", "an", "and", "of", "to", "in")
_STOP_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)

# Token-count proxy used consistently by the packing/mixing operators: the
# whitespace word count (`text_token_count_bpe` carries the BPE-ish variant).
_NWORDS = "size(split(text, ' '))"
_NWORDS_DUCK = "LEN(str_split(text, ' '))"


@register(
    "quality_gopher_rules",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             {_NWORDS_DUCK} AS n_words,
             CAST(LENGTH(text) - ({_NWORDS_DUCK} - 1) AS DOUBLE)
               / {_NWORDS_DUCK} AS mean_word_len,
             CAST(LEN(list_filter(str_split(text, ' '),
                                  w -> w IN ({_STOP_SQL}))) AS DOUBLE)
               / {_NWORDS_DUCK} AS stop_frac
      FROM documents
    )
    SELECT doc_id, n_words, mean_word_len, stop_frac,
           n_words BETWEEN 50 AND 100000 AS word_count_ok,
           mean_word_len BETWEEN 3.0 AND 10.0 AS mean_len_ok,
           stop_frac >= 0.01 AS stop_ok,
           (n_words BETWEEN 50 AND 100000)
             AND (mean_word_len BETWEEN 3.0 AND 10.0)
             AND stop_frac >= 0.01 AS passes
    FROM scored
    """,
    description="Gopher-style quality gate: word-count / mean-word-length / "
    "stop-word-density rules as independent flags plus the conjunction",
    tags=("text", "quality", "extension"),
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row map with zero shuffle: at 100 TB this is scan-bound and
    embarrassingly parallel; the flags become partition-pruning predicates
    for every downstream stage (write the gated corpus partitioned by
    `passes` and later stages scan only the kept side).

    Rule set follows the reference pipeline shape of Gopher (three of its
    document-level rules); thresholds are the published ones where the
    synthetic corpus makes them meaningful.
    """
    d = tbl(spark, sf_dir, "documents")
    n_words = F.expr(_NWORDS).cast("bigint")
    scored = d.select(
        "doc_id",
        n_words.alias("n_words"),
        ((F.length("text") - (n_words - F.lit(1))).cast("double") / n_words).alias(
            "mean_word_len"
        ),
        (
            F.expr(
                f"CAST(size(filter(split(text, ' '), w -> w IN ({_STOP_SQL}))) AS DOUBLE)"
            )
            / n_words
        ).alias("stop_frac"),
    )
    word_count_ok = F.col("n_words").between(50, 100000)
    mean_len_ok = F.col("mean_word_len").between(3.0, 10.0)
    stop_ok = F.col("stop_frac") >= 0.01
    return scored.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "stop_frac",
        word_count_ok.alias("word_count_ok"),
        mean_len_ok.alias("mean_len_ok"),
        stop_ok.alias("stop_ok"),
        (word_count_ok & mean_len_ok & stop_ok).alias("passes"),
    )


PACK_BUDGET = 2048  # tokens per packed sequence bin


@register(
    "pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, {_NWORDS_DUCK} AS n_tokens FROM documents
    ),
    binned AS (
      SELECT source, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // {PACK_BUDGET} AS BIGINT) AS bin_id
      FROM toks
    )
    SELECT source, bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
           CAST(SUM(n_tokens) AS DOUBLE) / {PACK_BUDGET} AS fill_ratio
    FROM binned
    GROUP BY source, bin_id
    """,
    description=f"Contiguous sequence packing: per-source deterministic order, "
    f"{PACK_BUDGET}-token bins, per-bin fill stats",
    tags=("packing", "training", "extension"),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-local packing, the way production shard writers do it: the
    running-total window partitions by `source`, so at 100 TB each source
    (or finer shard key) packs independently — no global order, no single
    reducer. The cumulative sum is exact integer arithmetic; `bin_id` is a
    floor division, so Spark's and DuckDB's assignments agree bit-for-bit.

    A bin can overflow the budget by at most one document (contiguous
    packing splits at the boundary, it does not bin-pack); `fill_ratio`
    makes the overflow visible.
    """
    d = tbl(spark, sf_dir, "documents")
    toks = d.select("doc_id", "source", F.expr(_NWORDS).cast("bigint").alias("n_tokens"))
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    binned = (
        toks.withColumn("cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .withColumn("bin_id", F.expr(f"cum_before div {PACK_BUDGET}").cast("bigint"))
    )
    return binned.groupBy("source", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        (F.sum("n_tokens").cast("double") / F.lit(PACK_BUDGET)).alias("fill_ratio"),
    )


@register(
    "source_mixing_weights",
    oracle=f"""
    WITH per_source AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM({_NWORDS_DUCK}) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    )
    SELECT source, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) / t.total AS token_share,
           sqrt(CAST(n_tokens AS DOUBLE) / t.total) AS temp_weight_unnorm
    FROM per_source
    CROSS JOIN (SELECT CAST(SUM({_NWORDS_DUCK}) AS BIGINT) AS total FROM documents) t
    """,
    description="Temperature-based source mixing (alpha=0.5): per-source token "
    "share and unnormalized sampling weight share^alpha",
    tags=("mixing", "training", "extension"),
)
def source_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token shares and alpha=0.5 temperature weights (the
    multilingual sampling scheme of mT5/XLM-R: p_i ∝ share_i^alpha).

    Scale: the corpus-wide token total is a one-row aggregate broadcast to
    the per-source table (tens of rows at 100 TB) — no global window, no
    single-partition stage. Weight normalization across sources is a driver-side
    division over those few rows and deliberately left out of the hashed
    output: `temp_weight_unnorm` is per-row deterministic (one division,
    one sqrt of exact integer inputs), whereas the normalizing sum of k
    irrational doubles would be engine-order-dependent.
    """
    d = tbl(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.expr(_NWORDS).cast("bigint")).alias("n_tokens"),
    )
    total_tbl = d.agg(F.sum(F.expr(_NWORDS).cast("bigint")).alias("total"))
    share = F.col("n_tokens").cast("double") / F.col("total")
    per_source = per_source.crossJoin(F.broadcast(total_tbl))
    return per_source.select(
        "source",
        "n_docs",
        "n_tokens",
        share.alias("token_share"),
        F.sqrt(share).alias("temp_weight_unnorm"),
    )


@register(
    "term_salience_topk",
    oracle="""
    WITH tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, UNNEST(str_split(text, ' ')) AS term FROM documents)
      GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             tf.tf * 1000000 // df.df AS score_ppm
      FROM tf JOIN df USING (term)
    )
    SELECT doc_id, term, tf, df, score_ppm, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score_ppm DESC, term) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """,
    description="Per-doc top-3 salient terms by integer-exact tf/df score "
    "(TF-IDF variant with a reproducible ranking, no log())",
    tags=("text", "tfidf", "extension"),
)
def term_salience_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-style keyword extraction with an integer-exact score:
    `tf * 1e6 div df` ranks identically to tf/df and needs no float log,
    so Spark and DuckDB rank bit-identically (ties broken by term).

    Scale: the explode produces O(corpus tokens) slim rows; both
    aggregations are map-side combined. The document-frequency table is
    vocabulary-sized — small relative to the corpus — and is broadcast to
    the scoring join, so the only full shuffle is the (doc_id, term)
    aggregation itself. Top-k per doc is a bounded window over each
    document's distinct terms.
    """
    d = tbl(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(df_tbl), "term").select(
        "doc_id", "term", "tf", "df", F.expr("tf * 1000000L div df").alias("score_ppm")
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score_ppm").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "df", "score_ppm", "rnk")
    )


CHUNK_WORDS = 8

# Non-overlapping CHUNK_WORDS-word chunks; the token array is bound once via
# the single-element-transform trick (see dedup._SHINGLES for the measured
# rationale).
_CHUNKS = (
    "transform(array(split(text, ' ')), toks -> "
    f"CASE WHEN size(toks) >= {CHUNK_WORDS} THEN "
    f"transform(sequence(0, size(toks) div {CHUNK_WORDS} - 1), "
    f"i -> concat_ws(' ', slice(toks, i*{CHUNK_WORDS}+1, {CHUNK_WORDS}))) "
    "ELSE array() END)[0]"
)
_CHUNKS_DUCK = (
    f"CASE WHEN {_NWORDS_DUCK} >= {CHUNK_WORDS} THEN "
    f"list_transform(range(0, {_NWORDS_DUCK} // {CHUNK_WORDS}), "
    f"i -> array_to_string((str_split(text, ' '))[i*{CHUNK_WORDS}+1 : i*{CHUNK_WORDS}+{CHUNK_WORDS}], ' ')) "
    "ELSE [] END"
)


@register(
    "dedup_chunk_fraction",
    oracle=f"""
    WITH chunks AS (
      SELECT doc_id, UNNEST({_CHUNKS_DUCK}) AS chunk FROM documents
    ),
    freq AS (SELECT chunk, COUNT(*) AS n FROM chunks GROUP BY chunk)
    SELECT c.doc_id,
           COUNT(*) AS n_chunks,
           COUNT(CASE WHEN f.n > 1 THEN 1 END) AS n_dup_chunks,
           CAST(COUNT(CASE WHEN f.n > 1 THEN 1 END) AS DOUBLE) / COUNT(*) AS dup_frac
    FROM chunks c JOIN freq f USING (chunk)
    GROUP BY c.doc_id
    """,
    description=f"Chunk-level duplication audit: fraction of each doc's "
    f"non-overlapping {CHUNK_WORDS}-word chunks occurring >1x corpus-wide",
    tags=("dedup", "chunks", "extension"),
)
def dedup_chunk_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style duplicated-span detection at chunk granularity: documents
    whose chunks are mostly corpus-duplicates are boilerplate candidates
    even when no whole-document duplicate exists.

    Scale: unlike the shingle self-join in `dedup_ngram_jaccard`, this never
    joins document pairs — the chunk-frequency table is a plain groupBy
    (map-side combined, no quadratic blowup on hot chunks), and the
    re-join back to chunks is on the chunk key with at most one frequency
    row per chunk. Hot-chunk skew therefore costs one shuffled count, not a
    candidate explosion. At 100 TB, replace the raw chunk string key with
    xxhash64(chunk) to shrink shuffle width (kept as the string here so the
    DuckDB oracle can mirror it exactly).
    """
    d = tbl(spark, sf_dir, "documents")
    chunks = d.select("doc_id", F.explode(F.expr(_CHUNKS)).alias("chunk"))
    freq = chunks.groupBy("chunk").agg(F.count("*").alias("n"))
    n_dup = F.count(F.when(F.col("n") > 1, F.lit(1)))
    return (
        chunks.join(freq, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            n_dup.alias("n_dup_chunks"),
            (n_dup.cast("double") / F.count("*")).alias("dup_frac"),
        )
    )


@register(
    "source_lang_diversity",
    oracle="""
    WITH cnt AS (
      SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY source, lang
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           COUNT(*) AS n_langs,
           CAST(SUM(n) * SUM(n) - SUM(n * n) AS DOUBLE)
             / (SUM(n) * SUM(n)) AS lang_gini
    FROM cnt GROUP BY source
    """,
    description="Per-source language diversity: Gini impurity of the language "
    "mix from exact integer sums (no float accumulation)",
    tags=("stats", "diversity", "extension"),
)
def source_lang_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini impurity 1 - sum(p_i^2) computed as (N^2 - sum(n_i^2)) / N^2 —
    all-integer numerator and denominator, one final division, so the float
    result is order-independent. Two-level aggregation: both levels are
    map-side combined; language cardinality per source is tiny, so level
    two is effectively free. The same shape computes any impurity-style
    balance metric at 100 TB without a single float accumulation.
    """
    d = tbl(spark, sf_dir, "documents")
    cnt = d.groupBy("source", "lang").agg(F.count("*").alias("n"))
    total = F.sum("n")
    sumsq = F.sum(F.col("n") * F.col("n"))
    return cnt.groupBy("source").agg(
        total.alias("n_docs"),
        F.count("*").alias("n_langs"),
        ((total * total - sumsq).cast("double") / (total * total)).alias("lang_gini"),
    )


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS amax
      FROM embeddings
    ),
    q AS (
      SELECT vec_id, amax,
             list_transform(e, x -> floor(x * (CASE WHEN amax = 0 THEN 0.0 ELSE 127.0 / amax END) + 0.5)) AS qv,
             e
      FROM v
    )
    SELECT vec_id,
           CAST(ROUND(amax, 6) AS DOUBLE) AS amax,
           CAST(list_sum(list_transform(qv, x -> CASE WHEN x <> 0 THEN 1 ELSE 0 END)) AS BIGINT) AS n_nonzero,
           CAST(ROUND(list_sum(list_transform(range(1, 65),
                 i -> (e[i] - qv[i] * (amax / 127.0))
                    * (e[i] - qv[i] * (amax / 127.0)))) / 64.0, 9) AS DOUBLE) AS mse
    FROM q
    """,
    description="Int8 embedding quantization: symmetric scale to [-127,127] "
    "via floor(x*s+0.5), exact nonzero count and round-trip MSE",
    tags=("embeddings", "quantization", "extension"),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage/ANN-index
    compression step (4x smaller than float32, 1.6x smaller than this
    table's float64 view). Quantize q = floor(x*scale + 0.5) instead of
    round(): floor is exact in both engines while round() half-way
    semantics differ; for scale > 0 the two agree everywhere except exact
    .5 boundaries, where floor+0.5 is the deterministic choice.

    Scale: per-row map over the vectors, no shuffle; amax via exact
    order-independent max, MSE via the same sequential fold the cosine
    operators use (identical to DuckDB's list_sum order). At 100 TB the
    quantized vectors write out as array<tinyint> next to the scale column;
    this query reports the audit stats.
    """
    e = tbl(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e"),
        F.expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))").alias(
            "amax"
        ),
    )
    q = v.select(
        "vec_id",
        "amax",
        "e",
        F.expr("transform(e, x -> floor(x * (CASE WHEN amax = 0D THEN 0D ELSE 127.0 / amax END) + 0.5))").alias("qv"),
    )
    mse = F.expr(
        "aggregate(zip_with(e, qv, (x, qx) -> "
        "(x - qx * (amax / 127.0)) * (x - qx * (amax / 127.0))), "
        "0D, (acc, p) -> acc + p) / 64.0"
    )
    return q.select(
        "vec_id",
        F.round("amax", 6).cast("double").alias("amax"),
        F.expr(
            "CAST(aggregate(transform(qv, x -> CASE WHEN x <> 0 THEN 1L ELSE 0L END), "
            "0L, (acc, x) -> acc + x) AS BIGINT)"
        ).alias("n_nonzero"),
        F.round(mse, 9).cast("double").alias("mse"),
    )


# ---------------------------------------------------------------------------
# Composition: end-to-end dedup decision, and tokenizer-planning coverage.
# ---------------------------------------------------------------------------

# The Jaccard-edge + reachability prefix shared with dedup_clusters' oracle
# (clusters.py documents the recursive-CTE twin in detail).
_COMPONENTS_DUCK_PREFIX = """
    WITH RECURSIVE sh AS (
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
      WHERE i.n_common * 1.0 / (ca.n + cb.n - i.n_common) >= {thr}
    ),
    sym AS (
      SELECT doc_a AS u, doc_b AS v FROM edges
      UNION SELECT doc_b, doc_a FROM edges
    ),
    reach(node, label) AS (
      SELECT u, u FROM sym
      UNION
      SELECT s.u, r.label FROM sym s JOIN reach r ON s.v = r.node
    ),
    comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node)
"""


@register(
    "dedup_keep_canonical",
    oracle=None,  # assembled below with the threshold constant
    description="End-to-end near-dup decision: cluster the Jaccard graph, keep "
    "the min-id canonical doc per component, flag the rest for removal",
    tags=("dedup", "clustering", "extension"),
)
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step every dedup pipeline actually ships: pair lists and cluster
    labels become a per-document keep/remove verdict. Keeper = the minimum
    doc_id of each component (deterministic, join-free choice); documents
    outside any component keep themselves.

    Scale: reuses the skew-capped Jaccard candidates and the large-star/
    small-star components (both argued in SCALE.md); the verdict itself is
    one left join of the corpus against the label table (component count ≤
    doc count, usually far smaller) — broadcastable in the common case
    where near-dup clusters cover a small corpus fraction.
    """
    from .clusters import connected_components
    from .dedup import dedup_ngram_jaccard

    d = tbl(spark, sf_dir, "documents")
    edges = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(edges).withColumnRenamed("node", "doc_id")
    verdict = d.select("doc_id", "source").join(labels, "doc_id", "left").select(
        "doc_id",
        "source",
        F.coalesce("component", "doc_id").alias("component"),
        (F.coalesce("component", "doc_id") == F.col("doc_id")).alias("keep"),
    )
    return verdict


# Attach the assembled oracle (threshold baked in, shared CTE prefix).
from ..registry import _REGISTRY as _R  # noqa: E402

_R["dedup_keep_canonical"].oracle = (
    _COMPONENTS_DUCK_PREFIX.format(thr=0.2)
    + """
    SELECT d.doc_id, d.source,
           CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS component,
           COALESCE(c.component, d.doc_id) = d.doc_id AS keep
    FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    """
)


@register(
    "vocab_coverage",
    oracle="""
    WITH tf AS (
      SELECT term, COUNT(*) AS freq
      FROM (SELECT UNNEST(str_split(text, ' ')) AS term FROM documents)
      GROUP BY term
    ),
    ranked AS (
      SELECT term, freq,
             ROW_NUMBER() OVER (ORDER BY freq DESC, term) AS rnk,
             CAST(SUM(freq) OVER (ORDER BY freq DESC, term
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_freq
      FROM tf
    )
    SELECT rnk, term, freq, cum_freq,
           CAST(cum_freq AS DOUBLE) / t.total AS cum_share
    FROM ranked
    CROSS JOIN (SELECT CAST(SUM(LEN(str_split(text, ' '))) AS BIGINT) AS total
                FROM documents) t
    WHERE rnk <= 20
    """,
    description="Tokenizer-planning coverage curve: cumulative corpus share "
    "of the top-20 vocabulary terms (freq desc, term asc)",
    tags=("text", "vocab", "extension"),
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of the corpus the top-N vocabulary entries cover — the
    planning query behind vocabulary sizing. Term frequencies are a
    map-side-combined aggregation over the exploded corpus; the global
    ranking over the vocabulary uses the two-pass range-partitioned helper
    (ranking.global_row_number) — per-partition row_number + running sum
    with broadcast offsets — so no stage ever single-partitions, even when
    the vocabulary itself is huge. `cum_freq` is an exact integer running
    sum; `cum_share` is its single division by the exact corpus token
    total — deterministic across engines.
    """
    from .ranking import global_row_number

    d = tbl(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
    )
    ranked_all, _n = global_row_number(
        tf,
        [F.col("freq").desc(), F.col("term")],
        rn_col="rnk",
        running_sums={"freq": "cum_freq"},
    )
    ranked = ranked_all.select("term", "freq", "rnk", "cum_freq").filter(
        F.col("rnk") <= 20
    )
    total_tbl = d.agg(
        F.sum(F.expr(_NWORDS).cast("bigint")).alias("total")
    )
    return ranked.crossJoin(F.broadcast(total_tbl)).select(
        "rnk",
        "term",
        "freq",
        "cum_freq",
        (F.col("cum_freq").cast("double") / F.col("total")).alias("cum_share"),
    )


@register(
    "embedding_dim_stats",
    oracle="""
    WITH flat AS (
      SELECT i.i AS dim, e.e[i.i] AS x
      FROM (SELECT embedding::DOUBLE[] AS e FROM embeddings) e
      CROSS JOIN (SELECT UNNEST(range(1, 65)) AS i) i
    )
    SELECT dim,
           COUNT(*) AS n,
           CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean,
           CAST(SUM(CAST(x AS DECIMAL(18,6)) * CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
             - (CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
               * (CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)) AS var_pop,
           MIN(x) AS min_x,
           MAX(x) AS max_x
    FROM flat GROUP BY dim
    """,
    description="Per-dimension embedding stats (mean/var/min/max, decimal-exact "
    "moments) — the whitening/normalization prep pass",
    tags=("embeddings", "stats", "extension"),
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-wise feature statistics over the embedding matrix — what a
    whitening, normalization, or drift-monitoring step consumes. posexplode
    produces (dim, value) rows keyed by dimension, so the aggregation
    shuffles on a 64-value key with map-side combine: at 100 TB the shuffle
    carries 64 partial-state rows per map task, not the data. Moments use
    exact decimal accumulation (order-independent across partitions), cast
    to double once, with variance from the E[x^2]-E[x]^2 identity — the
    same discipline as every float in this module. The DECIMAL(18,6) cast
    quantizes each float to 6 decimal places — a deliberate, consistent
    quantization (both engines round half-up, so sums agree bit-for-bit)
    that bounds the moment error at 5e-7 per element; min/max stay
    full-precision. Exact full-precision moments at scale would use a
    two-pass/Kahan pandas UDAF instead.
    """
    e = tbl(spark, sf_dir, "embeddings")
    flat = e.select(
        F.posexplode(F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")).alias(
            "pos", "x"
        )
    ).select((F.col("pos") + 1).cast("bigint").alias("dim"), "x")
    dec = F.col("x").cast("decimal(18,6)")
    n = F.count(F.lit(1))
    mean = F.sum(dec).cast("double") / n
    ex2 = F.sum(dec * dec).cast("double") / n
    return flat.groupBy("dim").agg(
        n.alias("n"),
        mean.alias("mean"),
        (ex2 - mean * mean).alias("var_pop"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
    )


VOCAB_TOP_N = 50


@register(
    "text_oov_rate",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, UNNEST(str_split(text, ' ')) AS term FROM documents
    ),
    vocab AS (
      SELECT term FROM (
        SELECT term, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, term) AS rnk
        FROM words GROUP BY term
      ) WHERE rnk <= {VOCAB_TOP_N}
    )
    SELECT w.doc_id,
           COUNT(*) AS n_words,
           COUNT(CASE WHEN v.term IS NULL THEN 1 END) AS n_oov,
           CAST(COUNT(CASE WHEN v.term IS NULL THEN 1 END) AS DOUBLE)
             / COUNT(*) AS oov_rate
    FROM words w LEFT JOIN vocab v USING (term)
    GROUP BY w.doc_id
    """,
    description=f"Out-of-vocabulary rate per doc against the corpus top-{VOCAB_TOP_N} "
    "vocabulary — rare-word quality filter",
    tags=("text", "vocab", "quality", "extension"),
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of token occurrences outside the top-{VOCAB_TOP_N} vocabulary —
    the rare-word signal quality filters threshold on (high OOV rate flags
    gibberish, boilerplate, or wrong-language text against a reference
    vocabulary).

    Scale: the vocabulary is built with one map-side-combined term count and
    a top-N cut, then BROADCAST against the exploded corpus (vocab is
    bounded, corpus is not) — the left join marks membership without
    shuffling the corpus side; the per-doc aggregation is the only corpus
    shuffle. In production the vocabulary comes from a fixed tokenizer
    instead; the plan shape is identical with the vocab read from a file.
    """
    from .ranking import global_row_number

    d = tbl(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = words.groupBy("term").agg(F.count("*").alias("freq"))
    # Two-pass global top-N (ranking.global_row_number): no single-partition
    # window over the vocabulary.
    ranked, _n = global_row_number(
        tf, [F.col("freq").desc(), F.col("term")], rn_col="rnk"
    )
    vocab = ranked.filter(F.col("rnk") <= VOCAB_TOP_N).select(
        "term", F.lit(True).alias("in_vocab")
    )
    n_oov = F.count(F.when(F.col("in_vocab").isNull(), F.lit(1)))
    return (
        words.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            n_oov.alias("n_oov"),
            (n_oov.cast("double") / F.count("*")).alias("oov_rate"),
        )
    )
