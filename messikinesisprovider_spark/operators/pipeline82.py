"""Round 6 additions, part 3: LLM-training-data curation batch.

Four oracle-exact queries filling curation gaps a large-scale pretraining
pipeline hits after the existing Gopher/PII/contamination/mixing family:

- ``dsir_importance_weights``: DSIR-style data selection (Xie et al.,
  arXiv:2302.03169) — importance weight of each raw document under a
  target-domain hashed-n-gram language model. The log-likelihood ratio is
  computed in the portable integer floor-log2 quantization (the
  ngram_lm_score convention), so the whole selection signal is bit-exact
  across engines; a production build swaps flog2 for F.ln at one marked
  line, identical plan.
- ``ngram_novelty_eval``: train/eval contamination measurement at the
  n-gram level — the share of an eval document's 3-shingles never seen in
  the (hash-split) train partition. The memorization-risk metric reported
  alongside exact-match contamination.
- ``quality_c4_rules``: the C4 heuristic filter set (Raffel et al.,
  arXiv:1910.10683 §2.2) — complements quality_gopher_rules with the other
  canonical rule family (word count bounds, code braces, boilerplate
  phrase, terminal punctuation, mean word length band).
- ``source_mixing_temperature``: temperature-scaled source mixing weights
  w_s ∝ p_s^(1/2) (multilingual-sampling temperature τ=2 in the p^(1/τ)
  convention) — sqrt keeps it in single portable IEEE ops, unlike general
  pow. Complements the proportional source_mixing_weights.

Reference parity note: the reference engine (SURVEY.md §0) has no analytics
surface; these extend the batch side per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import _SHINGLES, _SHINGLES_DUCK, h60_duck, h60_spark
from .relational import spread, tbl
from .retrieval3 import _TOKS_DUCK, _TOKS_SPARK

# ---------------------------------------------------------------------------
# dsir_importance_weights
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 256  # hashed feature space (the paper uses 10k; domain here is tiny)

# target domain: English docs; raw pool: everything else. Feature = unigram
# hashed into one of 256 buckets. Score(doc) = sum over tokens of
# (flog2(tgt[b]+1) - flog2(raw[b]+1)) — the quantized log-likelihood ratio.
_DSIR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, UNNEST({_TOKS_DUCK}) AS tok FROM documents
),
feat AS (
  SELECT doc_id, lang, {h60_duck("tok")} % {_DSIR_BUCKETS} AS b FROM toks
),
tgt AS (
  SELECT b, COUNT(*) AS c FROM feat WHERE lang = 'en' GROUP BY b
),
raw AS (
  SELECT b, COUNT(*) AS c FROM feat WHERE lang IS DISTINCT FROM 'en' GROUP BY b
),
scored AS (
  SELECT f.doc_id,
         COUNT(*) AS n_toks,
         SUM((length(printf('%b', COALESCE(tgt.c, 0) + 1)) - 1)
             - (length(printf('%b', COALESCE(raw.c, 0) + 1)) - 1)) AS llr_log2
  FROM feat f
  LEFT JOIN tgt ON tgt.b = f.b
  LEFT JOIN raw ON raw.b = f.b
  WHERE f.lang IS DISTINCT FROM 'en'
  GROUP BY f.doc_id
)
SELECT doc_id, n_toks, CAST(llr_log2 AS BIGINT) AS llr_log2,
       llr_log2 >= 0 AS selected
FROM scored
"""


@register(
    "dsir_importance_weights",
    oracle=_DSIR_ORACLE,
    description="DSIR data selection (arXiv:2302.03169): importance weight "
    "of each non-target document under a target-domain hashed-unigram LM, "
    "log-likelihood ratio in portable integer floor-log2 — select raw docs "
    "that look like the target domain",
    tags=("curation", "selection", "lm", "extension"),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR plan at scale: one token explode, feature counts for the
    target and raw pools (two map-side-combined aggregations on a
    256-bucket key — broadcastable micro-tables forever), then a
    broadcast-join score pass over the raw pool. No pairwise work, no
    driver data; the 256-bucket tables broadcast at any corpus size.
    flog2(c+1) = length(bin(c+1)) - 1 is the marked F.ln swap point."""
    toks = spread(tbl(spark, sf_dir, "documents")).select(
        "doc_id", "lang", F.explode(F.expr(_TOKS_SPARK)).alias("tok")
    )
    feat = toks.select(
        "doc_id",
        "lang",
        (F.expr(h60_spark("tok")) % _DSIR_BUCKETS).alias("b"),
    ).persist()
    tgt = feat.filter(F.col("lang") == "en").groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    raw = (
        feat.filter(~F.col("lang").eqNullSafe("en"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("cr"))
    )
    flog2 = lambda c: F.length(F.bin(c)) - 1  # noqa: E731  (F.ln swap point)
    scored = (
        feat.filter(~F.col("lang").eqNullSafe("en"))
        .join(F.broadcast(tgt), "b", "left")
        .join(F.broadcast(raw), "b", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum(
                flog2(F.coalesce(F.col("ct"), F.lit(0)) + 1)
                - flog2(F.coalesce(F.col("cr"), F.lit(0)) + 1)
            )
            .cast("long")
            .alias("llr_log2"),
        )
    )
    return scored.select(
        "doc_id", "n_toks", "llr_log2", (F.col("llr_log2") >= 0).alias("selected")
    )


# ---------------------------------------------------------------------------
# ngram_novelty_eval
# ---------------------------------------------------------------------------

_NOVELTY_SPLIT_PCT = 80  # hash-split: 80% train / 20% eval

_NOVELTY_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {_SHINGLES_DUCK} AS sh,
         {h60_duck("CAST(doc_id AS VARCHAR) || '|novel'")} % 100 < {_NOVELTY_SPLIT_PCT}
           AS is_train
  FROM documents
),
train_sh AS (
  SELECT DISTINCT UNNEST(sh) AS g FROM docs WHERE is_train
),
eval_sh AS (
  SELECT doc_id, UNNEST(list_distinct(sh)) AS g FROM docs
  WHERE NOT is_train AND LEN(sh) > 0
)
SELECT e.doc_id,
       COUNT(*) AS n_shingles,
       CAST(COALESCE(SUM(CASE WHEN t.g IS NULL THEN 1 END), 0) AS BIGINT) AS n_novel,
       CAST(ROUND(COALESCE(SUM(CASE WHEN t.g IS NULL THEN 1 END), 0) * 1.0
                  / COUNT(*), 6) AS DOUBLE) AS novelty
FROM eval_sh e LEFT JOIN train_sh t ON t.g = e.g
GROUP BY e.doc_id
"""


@register(
    "ngram_novelty_eval",
    oracle=_NOVELTY_ORACLE,
    description="Train/eval n-gram novelty: share of each eval document's "
    "distinct 3-shingles absent from the hash-split train partition — the "
    "memorization-risk companion to exact-match contamination_check",
    tags=("curation", "contamination", "eval", "extension"),
)
def ngram_novelty_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shingle explode per side, a distinct on the train shingle set
    (map-side partial), and a left join keyed by shingle hash — the shuffle
    is on shingle text, whose cardinality grows with content (Heaps), never
    quadratically. At 100 TB the train set is a bloom-filter candidate; the
    exact left join here IS the oracle-verifiable reference semantics."""
    docs = spread(tbl(spark, sf_dir, "documents")).select(
        "doc_id",
        F.expr(_SHINGLES).alias("sh"),
        (
            F.expr(h60_spark("CAST(doc_id AS STRING) || '|novel'")) % 100
            < _NOVELTY_SPLIT_PCT
        ).alias("is_train"),
    )
    train_sh = (
        docs.filter("is_train")
        .select(F.explode("sh").alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    eval_sh = (
        docs.filter(~F.col("is_train") & (F.size("sh") > 0))
        .select("doc_id", F.explode(F.array_distinct("sh")).alias("g"))
    )
    return (
        eval_sh.join(train_sh, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.coalesce(F.sum(F.when(F.col("hit").isNull(), 1)), F.lit(0)).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            F.col("n_novel").cast("long").alias("n_novel"),
            F.round(F.col("n_novel") * F.lit(1.0) / F.col("n_shingles"), 6)
            .cast("double")
            .alias("novelty"),
        )
    )


# ---------------------------------------------------------------------------
# quality_c4_rules
# ---------------------------------------------------------------------------

_C4_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text, {_TOKS_DUCK} AS ts FROM documents WHERE text IS NOT NULL
),
flags AS (
  SELECT doc_id,
         LEN(ts) AS n_words,
         LEN(ts) >= 5 AS pass_min_words,
         NOT contains(text, '{{') AND NOT contains(text, '}}') AS pass_no_code,
         NOT contains(lower(text), 'lorem ipsum') AS pass_no_boilerplate,
         substr(text, LENGTH(text), 1) IN ('.', '!', '?') AS pass_terminal_punct,
         LEN(ts) > 0
           AND list_sum(list_transform(ts, t -> LENGTH(t))) * 10
               BETWEEN 2 * LEN(ts) AND 120 * LEN(ts) AS pass_word_len
  FROM base
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       pass_min_words, pass_no_code, pass_no_boilerplate,
       pass_terminal_punct, pass_word_len,
       pass_min_words AND pass_no_code AND pass_no_boilerplate
         AND pass_word_len AS keep
FROM flags
"""


@register(
    "quality_c4_rules",
    oracle=_C4_ORACLE,
    description="C4 heuristic filter set (arXiv:1910.10683 §2.2): min word "
    "count, code-brace exclusion, boilerplate phrase, terminal punctuation, "
    "mean-word-length band — the second canonical rule family next to "
    "quality_gopher_rules",
    tags=("curation", "quality", "text", "extension"),
)
def quality_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure whole-stage-codegen string expressions — one scan, zero
    shuffles, trivially linear. The mean-word-length band is evaluated as
    an integer cross-multiplication (sum_len * 10 between 2n and 120n), so
    no division enters the flags. `keep` excludes the terminal-punctuation
    rule (the synthetic corpus has no punctuation; the flag is still
    emitted per doc, as C4 does per line)."""
    base = spread(tbl(spark, sf_dir, "documents")).where(F.col("text").isNotNull())
    ts = F.expr(_TOKS_SPARK)
    flags = base.select(
        "doc_id",
        F.size(ts).alias("n_words"),
        (F.size(ts) >= 5).alias("pass_min_words"),
        (~F.col("text").contains("{") & ~F.col("text").contains("}")).alias("pass_no_code"),
        (~F.lower("text").contains("lorem ipsum")).alias("pass_no_boilerplate"),
        F.expr("substr(text, length(text), 1) IN ('.', '!', '?')").alias(
            "pass_terminal_punct"
        ),
        F.expr(
            f"size({_TOKS_SPARK}) > 0 AND "
            f"aggregate({_TOKS_SPARK}, 0, (a, t) -> a + length(t)) * 10 "
            f"BETWEEN 2 * size({_TOKS_SPARK}) AND 120 * size({_TOKS_SPARK})"
        ).alias("pass_word_len"),
    )
    return flags.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        "pass_min_words",
        "pass_no_code",
        "pass_no_boilerplate",
        "pass_terminal_punct",
        "pass_word_len",
        (
            F.col("pass_min_words")
            & F.col("pass_no_code")
            & F.col("pass_no_boilerplate")
            & F.col("pass_word_len")
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# source_mixing_temperature
# ---------------------------------------------------------------------------

_MIXTEMP_ORACLE = f"""
WITH tok AS (
  SELECT source, SUM(LEN({_TOKS_DUCK})) AS n_tokens
  FROM documents WHERE source IS NOT NULL
  GROUP BY source
),
tot AS (SELECT SUM(n_tokens) AS t FROM tok),
w AS (
  SELECT source, n_tokens,
         sqrt(CAST(n_tokens AS DOUBLE) / tot.t) AS w_raw
  FROM tok CROSS JOIN tot
),
norm AS (
  SELECT list_sum(list_transform(list_sort(list(struct_pack(source := source,
                                                            wr := w_raw))),
                  e -> e.wr)) AS z
  FROM w
)
SELECT w.source, CAST(w.n_tokens AS BIGINT) AS n_tokens,
       CAST(ROUND(CAST(w.n_tokens AS DOUBLE) / (SELECT SUM(n_tokens) FROM tok), 6)
            AS DOUBLE) AS p_proportional,
       CAST(ROUND(w.w_raw / norm.z, 6) AS DOUBLE) AS p_temperature
FROM w CROSS JOIN norm
"""


@register(
    "source_mixing_temperature",
    oracle=_MIXTEMP_ORACLE,
    description="Temperature-scaled source mixing weights w ∝ p^(1/2) "
    "(τ=2 upsampling of low-resource sources, the multilingual-sampling "
    "convention) — sqrt keeps the scaling in single portable IEEE ops; "
    "complements the proportional source_mixing_weights",
    tags=("curation", "mixing", "extension"),
)
def source_mixing_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One token-count aggregation on the source key (micro-table), a 1-row
    total broadcast, and per-source sqrt scaling; the normalizer mixes the
    handful of per-source doubles, so it runs as the sequential
    source-sorted fold. General p^(1/τ) needs pow (not portable bit-exact);
    τ=2 is the documented portable point — the plan is τ-independent."""
    tok = (
        spread(tbl(spark, sf_dir, "documents"))
        .where(F.col("source").isNotNull())
        .groupBy("source")
        .agg(F.sum(F.size(F.expr(_TOKS_SPARK))).alias("n_tokens"))
    )
    tot = tok.agg(F.sum("n_tokens").alias("t"))
    w = tok.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.sqrt(F.col("n_tokens").cast("double") / F.col("t")).alias("w_raw"),
        F.col("t").alias("t"),
    )
    norm = w.agg(
        F.expr(
            "aggregate(array_sort(collect_list(struct(source, w_raw AS wr))), 0D, "
            "(acc, e) -> acc + e.wr)"
        ).alias("z")
    )
    return (
        w.crossJoin(F.broadcast(norm))
        .select(
            "source",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.col("n_tokens").cast("double") / F.col("t"), 6)
            .cast("double")
            .alias("p_proportional"),
            F.round(F.col("w_raw") / F.col("z"), 6).cast("double").alias("p_temperature"),
        )
    )
