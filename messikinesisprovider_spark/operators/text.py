"""Text-analysis operators over the `documents` table.

Designed for a 100 TB training-data pipeline: every operator is a pure
per-row projection (no shuffle, embarrassingly parallel, whole-stage
codegen'd — no Python UDFs in the hot path). Language-ID uses a stopword
n-gram heuristic; quality scoring uses length/punct/stopword ratios; token
counting uses whitespace and a BPE-ish regex; fingerprinting uses a
normalized content hash. All are expressed with built-in `pyspark.sql.
functions` so they also have exact DuckDB oracles.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import spread, tbl

# Tiny deterministic stopword lists per language (public common words).
STOPWORDS = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "de", "et", "est"),
    "zh": ("的", "是", "了", "在", "我"),
}


def _sql_in_list(words) -> str:
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"


@register(
    "text_stats",
    oracle="""
    SELECT doc_id,
           LENGTH(text) AS n_chars,
           LEN(str_split(text, ' ')) AS n_tokens,
           LEN(list_distinct(str_split(text, ' '))) AS n_unique_tokens,
           CAST(ROUND(LEN(list_distinct(str_split(text, ' '))) * 1.0
                      / LEN(str_split(text, ' ')), 6) AS DOUBLE) AS ttr
    FROM documents
    """,
    description="Per-document stats: chars, tokens, unique tokens, type-token ratio",
    tags=("text", "extension"),
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique_tokens"),
        F.round(F.size(F.array_distinct(toks)) * F.lit(1.0) / F.size(toks), 6)
        .cast("double")
        .alias("ttr"),
    )


@register(
    "text_token_count_bpe",
    oracle=r"""
    SELECT doc_id,
           LEN(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_ish_tokens,
           LEN(regexp_extract_all(text, '[0-9]+')) AS n_number_tokens
    FROM documents
    """,
    description="BPE-ish token counting via regex word/number/symbol classes",
    tags=("text", "tokenize", "extension"),
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.expr(r"regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
        .cast("bigint")
        .alias("n_bpe_ish_tokens"),
        F.size(F.expr(r"regexp_extract_all(text, '[0-9]+', 0)")).cast("bigint").alias("n_number_tokens"),
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             str_split(text, ' ') AS toks,
             LENGTH(text) AS n_chars
      FROM documents
    )
    SELECT doc_id,
           LEN(toks) AS n_tokens,
           CAST(ROUND(LEN(list_filter(toks, x -> x IN {_sql_in_list(STOPWORDS["en"])})) * 1.0
                      / LEN(toks), 6) AS DOUBLE) AS stopword_ratio,
           CAST(ROUND(n_chars * 1.0 / LEN(toks), 6) AS DOUBLE) AS avg_token_len,
           CAST(CASE WHEN LEN(toks) BETWEEN 10 AND 1000
                      AND n_chars * 1.0 / LEN(toks) BETWEEN 3 AND 12
                     THEN 1 ELSE 0 END AS INT) AS quality_pass
    FROM t
    """,
    description="Quality scoring: stopword ratio, avg token length, pass/fail gate",
    tags=("text", "quality", "extension"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    t = d.select(
        "doc_id",
        F.split(F.col("text"), " ").alias("toks"),
        F.length("text").alias("n_chars"),
    )
    n_toks = F.size("toks")
    avg_len = F.col("n_chars") * F.lit(1.0) / n_toks
    return t.select(
        "doc_id",
        n_toks.cast("bigint").alias("n_tokens"),
        F.round(
            F.size(F.expr(f"filter(toks, x -> x IN ({en}))")) * F.lit(1.0) / n_toks, 6
        )
        .cast("double")
        .alias("stopword_ratio"),
        F.round(avg_len, 6).cast("double").alias("avg_token_len"),
        F.when(n_toks.between(10, 1000) & avg_len.between(3, 12), 1)
        .otherwise(0)
        .cast("int")
        .alias("quality_pass"),
    )


@register(
    "text_lang_id",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang AS labeled_lang,
             LEN(list_filter(str_split(text, ' '), x -> x IN ('the','a','of','and','is'))) AS sc_en,
             LEN(list_filter(str_split(text, ' '), x -> x IN ('der','die','das','und','ist'))) AS sc_de,
             LEN(list_filter(str_split(text, ' '), x -> x IN ('el','la','de','y','es'))) AS sc_es,
             LEN(list_filter(str_split(text, ' '), x -> x IN ('le','la','de','et','est'))) AS sc_fr
      FROM documents
    )
    SELECT doc_id, labeled_lang,
           CASE
             WHEN sc_en >= sc_de AND sc_en >= sc_es AND sc_en >= sc_fr AND sc_en > 0 THEN 'en'
             WHEN sc_de >= sc_es AND sc_de >= sc_fr AND sc_de > 0 THEN 'de'
             WHEN sc_es >= sc_fr AND sc_es > 0 THEN 'es'
             WHEN sc_fr > 0 THEN 'fr'
             ELSE 'unk'
           END AS predicted_lang
    FROM scored
    """,
    description="Stopword-list language ID heuristic (deterministic tie-break order)",
    tags=("text", "langid", "extension"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")

    def score(words) -> "F.Column":
        lst = ", ".join(f"'{w}'" for w in words)
        return F.size(F.expr(f"filter(split(text, ' '), x -> x IN ({lst}))"))

    scored = d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        score(STOPWORDS["en"]).alias("sc_en"),
        score(STOPWORDS["de"]).alias("sc_de"),
        score(STOPWORDS["es"]).alias("sc_es"),
        score(STOPWORDS["fr"]).alias("sc_fr"),
    )
    c = F
    return scored.select(
        "doc_id",
        "labeled_lang",
        c.when(
            (c.col("sc_en") >= c.col("sc_de"))
            & (c.col("sc_en") >= c.col("sc_es"))
            & (c.col("sc_en") >= c.col("sc_fr"))
            & (c.col("sc_en") > 0),
            "en",
        )
        .when((c.col("sc_de") >= c.col("sc_es")) & (c.col("sc_de") >= c.col("sc_fr")) & (c.col("sc_de") > 0), "de")
        .when((c.col("sc_es") >= c.col("sc_fr")) & (c.col("sc_es") > 0), "es")
        .when(c.col("sc_fr") > 0, "fr")
        .otherwise("unk")
        .alias("predicted_lang"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS fingerprint
    FROM documents
    """,
    description="Normalized content fingerprint (lowercase, collapse whitespace, md5)",
    tags=("text", "fingerprint", "extension"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.regexp_replace("text", " +", " ")))).alias("fingerprint"),
    )


# --- Winnowing rolling-hash fingerprints (Schleimer/Wilkerson/Aiken, MOSS) ---

WINNOW_K = 8  # char k-gram length
WINNOW_W = 4  # winnow window (guarantee: any match of length >= K+W-1 is caught)
_ROLL_BASE = 257
_ROLL_MOD = (1 << 61) - 1


def winnow_fingerprints_py(text: str, k: int = WINNOW_K, w: int = WINNOW_W) -> list[int]:
    """Pure-Python reference: rolling polynomial hash over char k-grams, then
    winnowing (rightmost-min per window). Used by the vectorized UDF below
    and as the oracle in tests."""
    n = len(text)
    if n < k:
        return []
    b, m = _ROLL_BASE, _ROLL_MOD
    top = pow(b, k - 1, m)
    h = 0
    hashes = []
    for i, ch in enumerate(text):
        h = (h * b + ord(ch)) % m
        if i >= k:
            h = (h - ord(text[i - k]) * top * b) % m
        if i >= k - 1:
            hashes.append(h)
    fps: list[int] = []
    last = -1
    for start in range(0, max(1, len(hashes) - w + 1)):
        window = hashes[start : start + w]
        mn = min(window)
        idx = start + max(i for i, v in enumerate(window) if v == mn)  # rightmost min
        if idx != last:
            fps.append(hashes[idx])
            last = idx
    return fps


_M61 = (1 << 61) - 1


def _mulmod61(a, c):
    """(a * c) mod (2^61 - 1), vectorized and overflow-safe in int64.

    Requires a < 2^61 (scalar or array) and c < 2^21 (codepoints / small
    bases). Splits a into 32-bit halves and folds the high product with the
    Mersenne identity 2^61 ≡ 1 (mod 2^61 - 1); every intermediate stays
    below 2^62, so SIGNED int64 is safe — and on this numpy build int64
    elementwise ops are ~13x faster than uint64 (which falls off the SIMD
    path), measured 0.27s vs 3.4s per 100M multiplies.
    """
    import numpy as np

    a = np.asarray(a, dtype=np.int64)
    c = np.asarray(c, dtype=np.int64)
    hi = (a >> 32) * c          # < 2^50
    lo = (a & 0xFFFFFFFF) * c   # < 2^53
    r = ((hi & ((1 << 29) - 1)) << 32) + (hi >> 29) + lo  # < 2^62
    r = (r & _M61) + (r >> 61)
    return np.where(r >= _M61, r - _M61, r)


def _winnow_batch(texts, k: int = WINNOW_K, w: int = WINNOW_W):
    """Vectorized winnowing over a batch of strings; bit-identical to
    winnow_fingerprints_py (same k-gram polynomial hash mod 2^61-1, same
    rightmost-min window selection and consecutive-index dedup), but all
    per-character work is numpy over the flattened batch — no Python loop
    over positions. ~20x over the per-char reference on real batches.
    """
    import numpy as np

    texts = ["" if t is None else t for t in texts]
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    n_k = np.maximum(lens - (k - 1), 0)  # k-grams per doc
    if int(n_k.sum()) == 0:
        return [[] for _ in texts]

    # Flat codepoint array with doc offsets; utf-32-le decode yields
    # codepoints directly. int64 throughout, contiguous slices only, and
    # scratch buffers reused in place — strided access and fresh 25 MB
    # allocations are both an order of magnitude slower than the arithmetic
    # on the shared box this runs on.
    flat = np.frombuffer("".join(texts).encode("utf-32-le"), dtype=np.uint32).astype(
        np.int64
    )
    doc_start = np.concatenate(([0], np.cumsum(lens)[:-1]))

    # Polynomial hash at EVERY flat position (h(p) = sum_j coef[j]*cp[p+j]
    # mod m) over contiguous slices; positions straddling a doc boundary
    # produce garbage that is never selected below. One pass, no gathers.
    n_pos = len(flat) - (k - 1)
    coefs = [pow(_ROLL_BASE, k - 1 - j, _ROLL_MOD) for j in range(k)]
    h_all = np.zeros(n_pos, dtype=np.int64)
    t1 = np.empty(n_pos, dtype=np.int64)
    t2 = np.empty(n_pos, dtype=np.int64)
    for j, cf in enumerate(coefs):
        c = flat[j : j + n_pos]
        np.multiply(c, cf >> 32, out=t1)            # < 2^50
        np.bitwise_and(t1, (1 << 29) - 1, out=t2)
        np.left_shift(t2, 32, out=t2)               # < 2^61
        np.right_shift(t1, 29, out=t1)
        t2 += t1
        np.multiply(c, cf & 0xFFFFFFFF, out=t1)     # < 2^53
        t2 += t1                                    # < 2^62: (cf * c) pre-fold
        np.bitwise_and(t2, _M61, out=t1)
        np.right_shift(t2, 61, out=t2)
        t1 += t2                                    # (cf * c) mod-folded, < ~2^61
        h_all += t1                                 # < 2^62
        np.bitwise_and(h_all, _M61, out=t1)
        np.right_shift(h_all, 61, out=h_all)
        h_all += t1
    h_all -= np.int64(_M61) * (h_all >= _M61)

    # Winnow: pad each doc's hash run with w-1 sentinels (> any hash) so
    # windows never cross docs; window starts replicate the reference's
    # range(0, max(1, n_k - w + 1)).
    pad = w - 1
    n_starts = np.where(n_k > 0, np.maximum(n_k - (w - 1), 1), 0)
    padded_len = n_k + pad
    padded_start = np.concatenate(([0], np.cumsum(padded_len)[:-1]))
    padded = np.full(int(padded_len.sum()) + pad, np.int64(1) << 62, dtype=np.int64)
    gram_doc = np.repeat(np.arange(len(texts)), n_k)
    within = np.arange(int(n_k.sum()), dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(n_k)[:-1])), n_k
    )
    padded[padded_start[gram_doc] + within] = h_all[doc_start[gram_doc] + within]

    # Rightmost-min per window via w shifted CONTIGUOUS slices of `padded`
    # (sliding_window_view + axis argmin is 50x slower here: the fancy-index
    # materialization and the negative-stride reduction both fall off the
    # fast path).
    n_win = len(padded) - (w - 1)
    m = padded[w - 1 : w - 1 + n_win].copy()
    off = np.full(n_win, w - 1, dtype=np.int64)
    for j in range(w - 2, -1, -1):
        cand = padded[j : j + n_win]
        better = cand < m
        np.copyto(m, cand, where=better)
        off[better] = j

    start_doc = np.repeat(np.arange(len(texts)), n_starts)
    start_within = np.arange(int(n_starts.sum()), dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(n_starts)[:-1])), n_starts
    )
    starts = padded_start[start_doc] + start_within
    sel_off = off[starts]
    sel_idx = start_within + sel_off  # doc-local selected gram index

    # consecutive-duplicate drop (ref: `if idx != last`): within a doc the
    # selected index is non-decreasing, so a boundary-aware diff suffices.
    first_of_doc = np.concatenate(([True], start_doc[1:] != start_doc[:-1]))
    keep = first_of_doc | np.concatenate(([True], sel_idx[1:] != sel_idx[:-1]))
    kept_doc = start_doc[keep]
    kept_h = padded[starts + sel_off][keep]

    counts = np.bincount(kept_doc, minlength=len(texts))
    splits = np.split(kept_h, np.cumsum(counts)[:-1])
    return [s.tolist() for s in splits]


def winnowing_fingerprints(d: DataFrame) -> DataFrame:
    """doc_id, fps: array<bigint> — Arrow-vectorized winnowing."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    @pandas_udf(ArrayType(LongType()))
    def fp_udf(texts: pd.Series) -> pd.Series:
        return pd.Series(_winnow_batch(texts.tolist()))

    from .relational import spread

    return spread(d).select("doc_id", fp_udf("text").alias("fps"))


# Exact DuckDB oracle for winnowing: the rolling Karp-Rabin hash equals the
# direct polynomial sum over each k-gram (coefficients b^(k-1-j) mod m as
# literals, HUGEINT products, one mod), and rightmost-min window selection
# is an argmin on the key h*65536 - p (min h wins, ties to the largest p;
# gram positions stay far below 65536). Selected indices repeat only in
# consecutive windows, so DISTINCT reproduces the reference's consecutive
# dedupe. Verified against winnow_fingerprints_py on repeat/short/empty/
# unicode edge cases.
_WINNOW_COEFS = "[" + ",".join(
    str(pow(_ROLL_BASE, WINNOW_K - 1 - j, _ROLL_MOD)) for j in range(WINNOW_K)
) + "]"

_WINNOW_ORACLE = f"""
WITH grams AS (
  SELECT doc_id,
         UNNEST(range(0, GREATEST(0, length(text) - {WINNOW_K} + 1))) AS p,
         text
  FROM documents
),
hashed AS (
  SELECT doc_id, p,
         CAST(list_sum(list_transform(range(0, {WINNOW_K}),
           j -> CAST(unicode(substr(text, p + j + 1, 1)) AS HUGEINT)
                * list_extract({_WINNOW_COEFS}, j + 1))) % {_ROLL_MOD} AS BIGINT) AS h
  FROM grams
),
nk AS (SELECT doc_id, COUNT(*) AS n_k FROM hashed GROUP BY doc_id),
wins AS (
  SELECT s.doc_id, s.p AS s,
         MIN(CAST(g.h AS HUGEINT) * 65536 - g.p) AS kmin
  FROM hashed s
  JOIN nk ON nk.doc_id = s.doc_id
  JOIN hashed g ON g.doc_id = s.doc_id AND g.p BETWEEN s.p AND s.p + {WINNOW_W - 1}
  WHERE s.p <= GREATEST(0, nk.n_k - {WINNOW_W})
  GROUP BY s.doc_id, s.p
),
sel AS (
  SELECT DISTINCT doc_id,
         CAST((kmin + 65535) // 65536 AS BIGINT) AS h,
         CAST(CAST((kmin + 65535) // 65536 AS HUGEINT) * 65536 - kmin AS BIGINT) AS idx
  FROM wins
)
SELECT d.doc_id,
       CAST(COUNT(sel.idx) AS INT) AS n_fingerprints,
       CAST(COUNT(DISTINCT sel.h) AS INT) AS n_distinct_fingerprints,
       MIN(sel.h) AS min_fp
FROM documents d LEFT JOIN sel ON sel.doc_id = d.doc_id
GROUP BY d.doc_id
"""


@register(
    "text_winnowing",
    oracle=_WINNOW_ORACLE,
    description=f"Winnowing fingerprints (k={WINNOW_K} char-grams, w={WINNOW_W}): "
    "per-doc count + selectivity; oracle replicates the rolling hash and "
    "rightmost-min windowing exactly",
    tags=("text", "fingerprint", "winnowing", "extension"),
)
def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    fps = winnowing_fingerprints(d)
    return fps.select(
        "doc_id",
        F.size("fps").alias("n_fingerprints"),
        F.expr("size(array_distinct(fps))").alias("n_distinct_fingerprints"),
        F.array_min("fps").alias("min_fp"),
    )
