"""Round 4 additions, part 22: multiset set-ops, T5 span corruption, URL
canonicalization.

- ``bag_set_ops_all`` — INTERSECT ALL / EXCEPT ALL with true BAG
  semantics (min / truncated-difference of multiplicities), which the
  existing R7 queries never exercised (set_operations calls exceptAll on
  deduplicated inputs).  Two duplicate-bearing priority projections split
  by order-key parity; the per-value multiplicities of both bag results
  are the output, so the compare verifies multiplicity arithmetic, not
  just membership.

- ``span_corruption_masking`` — the T5/UL2 denoising-objective prep
  step: deterministic ~20% of token positions masked (portable hash of
  (doc, pos)), CONSECUTIVE masked positions collapse into one sentinel
  span.  Because the mask is pure position arithmetic, span starts need
  no window/lag: a position starts a span iff mask(i) AND NOT mask(i-1).
  One tokenize-explode -> map-side conditional aggregate per source:
  token/mask/span counts, masked target chars, and a modulo-reduced
  masked-token checksum that pins WHICH tokens were masked.

- ``url_canonicalize_dedup`` — crawl-side URL canonicalization (scheme
  case, www prefix, query strings, trailing slash) followed by exact
  dedup on the canonical form: raw URLs are synthesized deterministically
  from doc ids with all four variance axes, canonicalized with pure
  string functions (no regex — Java and RE2 dialects need not agree),
  and the variant-count histogram + canonical checksum verify the
  collapse.  All map-side until one groupBy on the canonical key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import tbl

# ---------------------------------------------------------------------------
# bag_set_ops_all
# ---------------------------------------------------------------------------

_BAG_ORACLE = """
WITH a AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderkey % 2 = 1),
b AS (SELECT o_orderpriority AS p FROM orders WHERE o_orderkey % 2 = 0),
ia AS (SELECT p FROM a INTERSECT ALL SELECT p FROM b),
ea AS (SELECT p FROM a EXCEPT ALL SELECT p FROM b),
eb AS (SELECT p FROM b EXCEPT ALL SELECT p FROM a)
SELECT 'intersect_all' AS op, p, CAST(COUNT(*) AS BIGINT) AS n FROM ia GROUP BY p
UNION ALL
SELECT 'a_except_all_b', p, CAST(COUNT(*) AS BIGINT) FROM ea GROUP BY p
UNION ALL
SELECT 'b_except_all_a', p, CAST(COUNT(*) AS BIGINT) FROM eb GROUP BY p
"""


@register(
    "bag_set_ops_all",
    oracle=_BAG_ORACLE,
    description="Multiset INTERSECT ALL / EXCEPT ALL (bag semantics: min "
    "and truncated difference of multiplicities) over duplicate-bearing "
    "priority projections split by key parity; output is the per-value "
    "multiplicity of each bag result in both directions",
    tags=("relational", "set-ops", "extension"),
)
def bag_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 2 == 1).select(F.col("o_orderpriority").alias("p"))
    b = o.filter(F.col("o_orderkey") % 2 == 0).select(F.col("o_orderpriority").alias("p"))

    def counted(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("n")).select(
            F.lit(tag).alias("op"), "p", "n"
        )

    return (
        counted(a.intersectAll(b), "intersect_all")
        .unionAll(counted(a.exceptAll(b), "a_except_all_b"))
        .unionAll(counted(b.exceptAll(a), "b_except_all_a"))
    )


# ---------------------------------------------------------------------------
# span_corruption_masking
# ---------------------------------------------------------------------------

_MASK_DENOM = 5  # mask ~20% of token positions
_CK_MOD = 1000003


def _mask_pred(engine: str, pos: str) -> str:
    h = (h60_duck if engine == "duck" else h60_spark)(
        f"'msk|' || CAST(doc_id AS {'VARCHAR' if engine == 'duck' else 'STRING'}) || '|' || CAST({pos} AS {'VARCHAR' if engine == 'duck' else 'STRING'})"
    )
    return f"({h} % {_MASK_DENOM} = 0)"


def _span_oracle() -> str:
    mask_i = _mask_pred("duck", "pos")
    mask_prev = _mask_pred("duck", "(pos - 1)")
    ck = h60_duck("tok") + f" % {_CK_MOD}"
    return f"""
WITH toks AS (
  SELECT doc_id, COALESCE(source, '<null>') AS source,
         u.tok AS tok, u.pos AS pos
  FROM (
    SELECT doc_id, source,
           UNNEST(list_transform(list_filter(string_split(text, ' '), x -> x <> ''),
                                 (x, i) -> {{'tok': x, 'pos': i}})) AS u
    FROM documents
  )
),
flagged AS (
  SELECT doc_id, source, tok, pos,
         {mask_i} AS m,
         CASE WHEN pos = 1 THEN FALSE ELSE {mask_prev} END AS m_prev
  FROM toks
)
SELECT source,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) FILTER (WHERE m) AS BIGINT) AS n_masked,
       CAST(COUNT(*) FILTER (WHERE m AND NOT m_prev) AS BIGINT) AS n_spans,
       CAST(COALESCE(SUM(length(tok)) FILTER (WHERE m), 0) AS BIGINT) AS target_chars,
       CAST(COALESCE(SUM({ck}) FILTER (WHERE m), 0) AS BIGINT) AS masked_checksum
FROM flagged
GROUP BY source
"""


@register(
    "span_corruption_masking",
    oracle=_span_oracle(),
    description=f"T5-style span-corruption prep: ~1/{_MASK_DENOM} of token "
    "positions masked by portable (doc, pos) hash, consecutive masks "
    "collapse to one span — span starts are pure position arithmetic "
    "(mask(i) AND NOT mask(i-1), no lag window); per-source token/mask/"
    "span accounting plus a modulo-reduced masked-token checksum",
    tags=("curation", "llm", "text", "extension"),
)
def span_corruption_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce(F.col("source"), F.lit("<null>")).alias("source"),
        F.expr("filter(split(text, ' '), x -> x <> '')").alias("toks"),
    )
    tok = d.select(
        "doc_id",
        "source",
        F.posexplode("toks").alias("pos0", "tok"),
    ).select("doc_id", "source", "tok", (F.col("pos0") + 1).alias("pos"))
    flagged = tok.select(
        "doc_id",
        "source",
        "tok",
        "pos",
        F.expr(_mask_pred("spark", "pos")).alias("m"),
        F.expr(f"CASE WHEN pos = 1 THEN FALSE ELSE {_mask_pred('spark', '(pos - 1)')} END").alias(
            "m_prev"
        ),
    )
    ck = h60_spark("tok") + f" % {_CK_MOD}"
    return flagged.groupBy("source").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.count(F.when(F.col("m"), 1)).cast("long").alias("n_masked"),
        F.count(F.when(F.col("m") & ~F.col("m_prev"), 1)).cast("long").alias("n_spans"),
        F.coalesce(F.sum(F.when(F.col("m"), F.length("tok"))), F.lit(0))
        .cast("long")
        .alias("target_chars"),
        F.coalesce(F.sum(F.when(F.col("m"), F.expr(ck))), F.lit(0))
        .cast("long")
        .alias("masked_checksum"),
    )


# ---------------------------------------------------------------------------
# url_canonicalize_dedup
# ---------------------------------------------------------------------------


def _raw_url(engine: str) -> str:
    c = "VARCHAR" if engine == "duck" else "STRING"
    return (
        f"'HTTPS://' || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)"
        f" || 'Example' || CAST(doc_id % 7 AS {c}) || '.COM/Path/'"
        f" || CAST(doc_id % 50 AS {c})"
        f" || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)"
        f" || (CASE WHEN doc_id % 5 = 0 THEN '?utm_source=x&sid=' || CAST(doc_id % 11 AS {c}) ELSE '' END)"
    )


def _canon_steps(engine: str, url: str) -> str:
    """Canonical form via pure string functions (no regex — Java vs RE2
    dialects need not agree): drop query, lowercase scheme+host, strip
    www., strip one trailing slash. Path case is preserved."""
    first_part = "split_part" if engine == "duck" else "substring_index"
    noq = f"{first_part}({url}, '?', 1)"
    # after '://'
    after = f"substr({noq}, position('://' IN {noq}) + 3)"
    host = f"{first_part}({after}, '/', 1)"
    path = f"substr({after}, length({host}) + 1)"
    lhost = f"lower({host})"
    nohost_www = f"CASE WHEN {lhost} LIKE 'www.%' THEN substr({lhost}, 5) ELSE {lhost} END"
    joined = f"'https://' || {nohost_www} || {path}"
    return (
        f"CASE WHEN {joined} LIKE '%/' THEN substr({joined}, 1, length({joined}) - 1) "
        f"ELSE {joined} END"
    )


def _url_oracle() -> str:
    raw = _raw_url("duck")
    canon = _canon_steps("duck", "raw_url")
    ck = h60_duck("canon") + f" % {_CK_MOD}"
    return f"""
WITH urls AS (SELECT doc_id, {raw} AS raw_url FROM documents),
canond AS (SELECT doc_id, {canon} AS canon FROM urls),
grouped AS (
  SELECT canon, CAST(COUNT(*) AS BIGINT) AS n_variants, {ck} AS ck
  FROM canond GROUP BY canon
)
SELECT n_variants,
       CAST(COUNT(*) AS BIGINT) AS n_canonicals,
       CAST(SUM(ck) AS BIGINT) AS canon_checksum
FROM grouped
GROUP BY n_variants
"""


@register(
    "url_canonicalize_dedup",
    oracle=_url_oracle(),
    description="Crawl URL canonicalization + exact dedup: deterministic "
    "raw URLs with four variance axes (scheme case, www., query string, "
    "trailing slash) collapsed by pure string functions (no regex — "
    "dialects differ), then the variant-count histogram + canonical "
    "checksum verify the collapse; map-side until one canonical groupBy",
    tags=("curation", "dedup", "text", "extension"),
)
def url_canonicalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_raw_url("spark")).alias("raw_url")
    )
    canond = d.select(F.expr(_canon_steps("spark", "raw_url")).alias("canon"))
    ck = h60_spark("canon") + f" % {_CK_MOD}"
    grouped = canond.groupBy("canon").agg(
        F.count(F.lit(1)).cast("long").alias("n_variants"),
    ).select("n_variants", F.expr(ck).alias("ck"))
    return grouped.groupBy("n_variants").agg(
        F.count(F.lit(1)).cast("long").alias("n_canonicals"),
        F.sum("ck").cast("long").alias("canon_checksum"),
    )
