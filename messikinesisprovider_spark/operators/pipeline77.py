"""Round 5 additions, part 9: generated-text eval + tokenizer accounting.

- ``eval_ngram_precision_bleu`` — BLEU-style modified n-gram precision
  (clipped counts) between hypothesis/reference document pairs (doc d vs
  doc d + N/2 under the deterministic split): for each unigram/bigram g,
  the match credit is min(count_hyp(g), count_ref(g)) — the clipping that
  stops a hypothesis from farming one reference word — summed per pair and
  corpus-level (micro-average), everything exact integers with ppm ratios.
  The brevity penalty is deliberately omitted (it needs exp(); the
  repo-wide no-libm rule) — what's reported is the p1/p2 core every BLEU
  implementation shares.
- ``tokenizer_fertility_by_lang`` — the tokenizer-eval accounting table:
  per language, whitespace words, BPE-ish regex tokens (the
  text_token_count_bpe tokenizer), characters, and the fertility ratios
  (tokens per word, chars per token) as exact ppm integers — the metric
  that decides whether a tokenizer is acceptable for a language.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import spread, tbl
from .retrieval3 import _TOKS_DUCK, _TOKS_SPARK

# ---------------------------------------------------------------------------
# eval_ngram_precision_bleu
# ---------------------------------------------------------------------------

_BLEU_SCALE = 10**6

# hyp doc d pairs with ref doc d + half (half = floor(max_id/2) + 1 over the
# dense 0..N-1 id space — computed inside the query so every SF works).
_BLEU_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents WHERE text IS NOT NULL
),
half AS (SELECT (MAX(doc_id) + 1) // 2 AS h FROM docs),
pairs AS (
  SELECT hyp.doc_id AS pair_id, hyp.toks AS htoks, ref.toks AS rtoks
  FROM docs hyp JOIN half ON hyp.doc_id < half.h
  JOIN docs ref ON ref.doc_id = hyp.doc_id + half.h
),
uni AS (
  SELECT pair_id, SUM(hn) AS hyp_total,
         SUM(LEAST(hn, COALESCE(rn, 0))) AS clipped
  FROM (
    SELECT p.pair_id, hg.g, COUNT(*) AS hn
    FROM pairs p, UNNEST(p.htoks) AS hg(g)
    GROUP BY p.pair_id, hg.g
  ) h
  LEFT JOIN (
    SELECT p.pair_id, rg.g, COUNT(*) AS rn
    FROM pairs p, UNNEST(p.rtoks) AS rg(g)
    GROUP BY p.pair_id, rg.g
  ) r USING (pair_id, g)
  GROUP BY pair_id
),
bi AS (
  SELECT pair_id, SUM(hn) AS hyp_total2,
         SUM(LEAST(hn, COALESCE(rn, 0))) AS clipped2
  FROM (
    SELECT p.pair_id, hg.g, COUNT(*) AS hn
    FROM pairs p, UNNEST(list_transform(range(1, len(p.htoks)),
         i -> p.htoks[i] || ' ' || p.htoks[i+1])) AS hg(g)
    GROUP BY p.pair_id, hg.g
  ) h
  LEFT JOIN (
    SELECT p.pair_id, rg.g, COUNT(*) AS rn
    FROM pairs p, UNNEST(list_transform(range(1, len(p.rtoks)),
         i -> p.rtoks[i] || ' ' || p.rtoks[i+1])) AS rg(g)
    GROUP BY p.pair_id, rg.g
  ) r USING (pair_id, g)
  GROUP BY pair_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(u.hyp_total) AS BIGINT) AS hyp_unigrams,
       CAST(SUM(u.clipped) AS BIGINT) AS clipped_unigrams,
       CAST(SUM(u.clipped) * {_BLEU_SCALE} // SUM(u.hyp_total) AS BIGINT) AS p1_ppm,
       CAST(SUM(b.hyp_total2) AS BIGINT) AS hyp_bigrams,
       CAST(SUM(b.clipped2) AS BIGINT) AS clipped_bigrams,
       CAST(CASE WHEN SUM(b.hyp_total2) > 0
                 THEN SUM(b.clipped2) * {_BLEU_SCALE} // SUM(b.hyp_total2)
                 ELSE 0 END AS BIGINT) AS p2_ppm
FROM uni u JOIN bi b USING (pair_id)
HAVING COUNT(*) > 0
"""


@register(
    "eval_ngram_precision_bleu",
    oracle=_BLEU_ORACLE,
    description="BLEU-style modified (clipped) unigram/bigram precision "
    "between deterministic hypothesis/reference doc pairs — exact integer "
    "clipped counts, ppm micro-averages; brevity penalty omitted by the "
    "no-libm rule (exp)",
    tags=("eval", "text", "extension"),
)
def eval_ngram_precision_bleu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: per-pair n-gram counting is a map-side explode +
    groupBy((pair, gram)); the hyp/ref comparison is an equi-join on
    (pair, gram) — never a cross of vocabularies."""
    docs = (
        spread(tbl(spark, sf_dir, "documents"))
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.expr(_TOKS_SPARK).alias("toks"))
        .persist()
    )
    half = docs.agg(
        F.expr("(MAX(doc_id) + 1) div 2").alias("h")
    )
    hyp = docs.crossJoin(F.broadcast(half)).filter(F.col("doc_id") < F.col("h")).select(
        F.col("doc_id").alias("pair_id"), F.col("toks").alias("htoks"), "h"
    )
    ref = docs.select(F.col("doc_id").alias("ref_id"), F.col("toks").alias("rtoks"))
    pairs = hyp.join(
        ref, F.col("ref_id") == F.col("pair_id") + F.col("h")
    ).select("pair_id", "htoks", "rtoks").persist()

    def grams(col: str, n: int) -> "F.Column":
        if n == 1:
            return F.col(col)
        return F.expr(
            f"transform(sequence(1, size({col}) - 1), i -> concat({col}[i-1], ' ', {col}[i]))"
        )

    def clipped(n: int, total_alias: str, clip_alias: str) -> DataFrame:
        h = (
            pairs.select("pair_id", F.explode(grams("htoks", n)).alias("g"))
            .groupBy("pair_id", "g")
            .agg(F.count(F.lit(1)).alias("hn"))
        )
        r = (
            pairs.select("pair_id", F.explode(grams("rtoks", n)).alias("g"))
            .groupBy("pair_id", "g")
            .agg(F.count(F.lit(1)).alias("rn"))
        )
        return (
            h.join(r, ["pair_id", "g"], "left")
            .groupBy("pair_id")
            .agg(
                F.sum("hn").alias(total_alias),
                F.sum(F.least(F.col("hn"), F.coalesce(F.col("rn"), F.lit(0)))).alias(
                    clip_alias
                ),
            )
        )

    uni = clipped(1, "hyp_total", "clipped1")
    bi = clipped(2, "hyp_total2", "clipped2")
    out = (
        uni.join(bi, "pair_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("hyp_total").cast("long").alias("hyp_unigrams"),
            F.sum("clipped1").cast("long").alias("clipped_unigrams"),
            F.expr(f"SUM(clipped1) * {_BLEU_SCALE} div SUM(hyp_total)")
            .cast("long")
            .alias("p1_ppm"),
            F.sum("hyp_total2").cast("long").alias("hyp_bigrams"),
            F.sum("clipped2").cast("long").alias("clipped_bigrams"),
            F.expr(
                f"CASE WHEN SUM(hyp_total2) > 0 "
                f"THEN SUM(clipped2) * {_BLEU_SCALE} div SUM(hyp_total2) ELSE 0 END"
            )
            .cast("long")
            .alias("p2_ppm"),
        )
        .filter(F.col("n_pairs") > 0)
    )
    return out


# ---------------------------------------------------------------------------
# tokenizer_fertility_by_lang
# ---------------------------------------------------------------------------

# The BPE-ish regex tokenizer shared with text_token_count_bpe: words,
# numbers, punctuation runs each count as tokens.
# One pattern, two literal spellings: DuckDB string literals keep backslashes
# verbatim; Spark SQL literals consume one level of escaping.
_FERT_TOKEN_RE_DUCK = "[a-z0-9]+|[^a-z0-9\\s]"
_FERT_TOKEN_RE_SPARK = "[a-z0-9]+|[^a-z0-9\\\\s]"

_FERT_ORACLE = f"""
WITH d AS (
  SELECT lang,
         LEN({_TOKS_DUCK}) AS n_words,
         LEN(regexp_extract_all(lower(text), '{_FERT_TOKEN_RE_DUCK}')) AS n_tokens,
         LEN(text) AS n_chars
  FROM documents WHERE text IS NOT NULL
)
SELECT COALESCE(lang, '') AS lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(CASE WHEN SUM(n_words) > 0
                 THEN SUM(n_tokens) * 1000000 // SUM(n_words) ELSE 0 END AS BIGINT)
         AS tokens_per_word_ppm,
       CAST(CASE WHEN SUM(n_tokens) > 0
                 THEN SUM(n_chars) * 1000000 // SUM(n_tokens) ELSE 0 END AS BIGINT)
         AS chars_per_token_ppm
FROM d GROUP BY COALESCE(lang, '')
"""


@register(
    "tokenizer_fertility_by_lang",
    oracle=_FERT_ORACLE,
    description="Tokenizer fertility accounting per language: whitespace "
    "words, BPE-ish regex tokens, characters, and the tokens-per-word / "
    "chars-per-token ratios as exact ppm integers — the acceptance metric "
    "for a tokenizer per language",
    tags=("text", "tokenizer", "eval", "extension"),
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        spread(tbl(spark, sf_dir, "documents"))
        .filter(F.col("text").isNotNull())
        .select(
            F.coalesce(F.col("lang"), F.lit("")).alias("lang"),
            F.expr(f"size({_TOKS_SPARK})").alias("n_words"),
            F.expr(f"size(regexp_extract_all(lower(text), '{_FERT_TOKEN_RE_SPARK}', 0))").alias(
                "n_tokens"
            ),
            F.length("text").alias("n_chars"),
        )
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.expr(
            "CASE WHEN SUM(n_words) > 0 "
            "THEN SUM(n_tokens) * 1000000 div SUM(n_words) ELSE 0 END"
        )
        .cast("long")
        .alias("tokens_per_word_ppm"),
        F.expr(
            "CASE WHEN SUM(n_tokens) > 0 "
            "THEN SUM(n_chars) * 1000000 div SUM(n_tokens) ELSE 0 END"
        )
        .cast("long")
        .alias("chars_per_token_ppm"),
    )
