"""Round 8 additions, part 3: Kneser-Ney LM scoring, dynamic-gap session
windows, content-defined chunking, and rank-biased overlap.

- ``ngram_lm_kneser_ney``: interpolated Kneser-Ney bigram probabilities
  (Kneser & Ney 1995; Chen & Goodman 1999) — THE production n-gram
  smoothing, next to ``ngram_lm_score``'s unsmoothed MLE shape
  (pipeline4). Absolute discount d = 3/4 keeps everything rational:
  P(w2|w1) = max(4c-3,0)/(4*c(w1)) + (3*n1+(w1,.)*n1+(.,w2))/(4*c(w1)*D)
  — two exact-integer divisions and one add, identical IEEE doubles in
  both engines (no log/exp anywhere).
- ``session_window_dynamic_gap``: Spark's NATIVE ``session_window(ts,
  gap_column)`` API — per-event gap (purchases keep sessions alive 30 min,
  everything else 10) — against an interval-union oracle in epoch
  microseconds. The fixed-gap API is covered by streaming_session_window;
  the dynamic form is its own code path in the analyzer (gap is an
  expression, merged as a union of half-open [ts, ts+gap) ranges).
- ``dedup_cdc_chunks``: content-defined chunking (the Rabin/Gear rolling-
  hash boundary trick of LBFS/restic/borg, Muthitacharoen et al. SOSP'01)
  — chunk boundaries where an 8-char polynomial rolling hash hits 0 mod
  32, so boundaries SURVIVE insertions/deletions (unlike the fixed-width
  spans of dedup_exact_substring); duplicate chunks across docs are the
  dedup signal. The rolling hash is pure integer arithmetic (codepoint *
  31^k), replicated literally in the oracle.
- ``eval_rank_biased_overlap``: RBO@10, p=0.9 (Webber, Moffat & Zobel,
  TOIS 2010) between two hash-derived rankings per language — the
  TOP-WEIGHTED ranking-similarity member next to the unweighted
  kendall_tau_exact / eval_spearman_footrule. Geometric weights are
  Python-computed double literals embedded in both plans, overlaps are
  exact integers, and the weighted sum is one fixed-order chain.

Reference parity note: the reference engine (SURVEY.md §0) has no
analytics surface; these extend the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .dedup import bind1, h60_duck, h60_spark
from .relational import events_tbl, spread, tbl

# ---------------------------------------------------------------------------
# ngram_lm_kneser_ney
# ---------------------------------------------------------------------------

_KN_TOPK = 20

_KN_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS w,
         UNNEST(range(1, 1 + len(string_split(text, ' ')))) AS p
  FROM documents WHERE text IS NOT NULL
),
big AS (
  SELECT doc_id, w AS w1, LEAD(w) OVER (PARTITION BY doc_id ORDER BY p) AS w2
  FROM toks QUALIFY w2 IS NOT NULL
),
cb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM big GROUP BY 1, 2),
ctx AS (
  SELECT w1, CAST(SUM(c) AS BIGINT) AS c1,
         CAST(COUNT(*) AS BIGINT) AS n1_fwd
  FROM cb GROUP BY 1
),
cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1_bwd FROM cb GROUP BY 1),
d AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM cb)
SELECT w1, w2, c, c1, n1_fwd, n1_bwd, nd AS d_bigrams,
       CAST(ROUND(CAST(GREATEST(4 * c - 3, 0) AS DOUBLE) / (4 * c1)
            + CAST(3 * n1_fwd * n1_bwd AS DOUBLE) / (4 * c1 * nd), 6)
            AS DOUBLE) AS p_kn
FROM cb JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN d
ORDER BY c DESC, w1, w2
LIMIT {_KN_TOPK}
"""


@register(
    "ngram_lm_kneser_ney",
    oracle=_KN_ORACLE,
    description="Interpolated Kneser-Ney bigram LM (absolute discount 3/4): "
    "continuation probabilities from distinct-predecessor counts, all "
    f"rational arithmetic — top-{_KN_TOPK} bigrams with exact P_KN; the "
    "production smoothing next to ngram_lm_score's MLE shape",
    tags=("text", "lm", "extension"),
)
def ngram_lm_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three map-side-combinable aggregations over the bigram table (which
    is itself one groupBy over exploded tokens): context totals + distinct
    followers, distinct predecessors, and the global distinct-bigram
    scalar (1-row broadcast). The discount 3/4 makes every term a ratio of
    BIGINTs, so the two divisions produce identical IEEE doubles in both
    engines — no log-space smoothing anywhere."""
    toks = (
        tbl(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("p", "w"))
    )
    wd = W.partitionBy("doc_id").orderBy("p")
    big = (
        toks.withColumn("w2", F.lead("w").over(wd))
        .filter(F.col("w2").isNotNull())
        .select(F.col("w").alias("w1"), "w2")
    )
    cb = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ctx = cb.groupBy("w1").agg(
        F.sum("c").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1_fwd"),
    )
    cont = cb.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n1_bwd"))
    d = cb.agg(F.count(F.lit(1)).cast("long").alias("d_bigrams"))
    p_kn = F.round(
        F.expr("CAST(GREATEST(4 * c - 3, 0) AS DOUBLE) / (4 * c1)")
        + F.expr("CAST(3 * n1_fwd * n1_bwd AS DOUBLE) / (4 * c1 * d_bigrams)"),
        6,
    ).cast("double")
    return (
        cb.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(d))
        .select("w1", "w2", "c", "c1", "n1_fwd", "n1_bwd", "d_bigrams", p_kn.alias("p_kn"))
        .orderBy(F.col("c").desc(), "w1", "w2")
        .limit(_KN_TOPK)
    )


# ---------------------------------------------------------------------------
# session_window_dynamic_gap
# ---------------------------------------------------------------------------

_GAP_LONG_S = 1800  # purchases keep the session alive 30 min
_GAP_SHORT_S = 600  # everything else 10 min

def _swdg_oracle() -> str:
    # interval-union sessionization in epoch microseconds: an event's range
    # is [ts, ts + gap); a session is a maximal union of overlapping ranges
    return f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS e,
         epoch_us(ts) + CASE WHEN event_type = 'purchase'
                             THEN {_GAP_LONG_S} * 1000000 ELSE {_GAP_SHORT_S} * 1000000 END AS ge
  FROM events WHERE ts IS NOT NULL
),
flagged AS (
  SELECT user_id, event_id, e, ge,
         CASE WHEN MAX(ge) OVER (PARTITION BY user_id ORDER BY e, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   > e
              THEN 0 ELSE 1 END AS is_new
  FROM ev
),
sess AS (
  -- the SAME (e, event_id) tiebreak as flagged: with a different tie order
  -- a tied (is_new=1, is_new=0) pair could land in different sessions
  SELECT user_id, e, ge,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY e, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM flagged
)
SELECT user_id,
       make_timestamp(MIN(e)) AS session_start,
       make_timestamp(MAX(ge)) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, sid
"""


@register(
    "session_window_dynamic_gap",
    oracle=_swdg_oracle(),
    description="Native session_window(ts, gap_expression) with a PER-EVENT "
    "gap (purchase 30 min, else 10): the dynamic-gap analyzer path, merged "
    "as a union of half-open [ts, ts+gap) ranges; oracle replicates the "
    "interval-union in epoch microseconds",
    tags=("window", "session", "api", "extension"),
)
def session_window_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle on the session key — Spark's session_window aggregation
    sorts within user partitions and merges ranges in-state; the dynamic
    gap is evaluated per row before the merge, which is why it composes
    with watermarks in streaming too (same operator). At 100 TB this is
    the sessionization you ship when dwell time depends on the event."""
    gap = F.when(F.col("event_type") == "purchase", F.lit(f"{_GAP_LONG_S} seconds")).otherwise(
        F.lit(f"{_GAP_SHORT_S} seconds")
    )
    ev = events_tbl(spark, sf_dir).filter(F.col("ts").isNotNull())
    return (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# dedup_cdc_chunks
# ---------------------------------------------------------------------------

_CDC_WIN = 8  # rolling-hash window (chars)
_CDC_MOD = 32  # boundary when hash % 32 == 0 -> ~32-char expected chunks
_CDC_MIN_LEN = 16  # ignore fragments below this


def _roll_spark(i: str) -> str:
    # polynomial hash of the 8 chars ENDING at position i (1-based):
    # sum(codepoint * 31^(7-k)); pure integer, fits BIGINT. Reads the
    # precomputed codepoint array `cp` (0-based) instead of calling
    # substr(text, pos, 1) per term: UTF8String substring is O(pos) (it
    # walks bytes to find the codepoint boundary), which made the original
    # per-position 8-term probe O(len^2) per document — the array is built
    # once per row, so the whole boundary scan is O(8 * len).
    terms = [
        f"(cp[{i} - {_CDC_WIN - k}] * {31 ** (_CDC_WIN - 1 - k)}L)"
        for k in range(_CDC_WIN)
    ]
    return "(" + " + ".join(terms) + ")"


def _roll_duck(i: str) -> str:
    # CAST: DuckDB ascii() is INT32 and 31^7 overflows it in multiplication
    terms = [
        f"(CAST(ascii(substr(text, {i} - {_CDC_WIN - 1} + {k}, 1)) AS BIGINT)"
        f" * {31 ** (_CDC_WIN - 1 - k)})"
        for k in range(_CDC_WIN)
    ]
    return "(" + " + ".join(terms) + ")"


_CDC_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, text, length(text) AS ln
  FROM documents WHERE text IS NOT NULL AND length(text) >= {_CDC_WIN}
),
cuts AS (
  SELECT doc_id, text, ln,
         list_sort(list_distinct(
           [0] || list_filter(list_transform(range({_CDC_WIN}, ln + 1),
                    i -> CASE WHEN {_roll_duck('i')} % {_CDC_MOD} = 0 THEN i END),
                  x -> x IS NOT NULL) || [ln])) AS b
  FROM docs
),
chunks AS (
  SELECT doc_id,
         UNNEST(list_transform(range(2, 1 + len(b)),
                j -> substr(text, b[j - 1] + 1, b[j] - b[j - 1]))) AS chunk
  FROM cuts
),
kept AS (SELECT doc_id, chunk FROM chunks WHERE length(chunk) >= {_CDC_MIN_LEN}),
hashed AS (SELECT doc_id, {h60_duck('chunk')} AS chunk_h, length(chunk) AS clen FROM kept)
SELECT chunk_h, CAST(MIN(clen) AS BIGINT) AS clen,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occ
FROM hashed GROUP BY chunk_h
HAVING COUNT(DISTINCT doc_id) >= 2
"""


@register(
    "dedup_cdc_chunks",
    oracle=_CDC_ORACLE,
    description="Content-defined chunking dedup: boundaries where an 8-char "
    f"integer rolling hash = 0 mod {_CDC_MOD} (insert/delete-robust, unlike "
    "fixed-width spans); duplicate chunks shared by >= 2 docs — the "
    "storage-dedup / shift-robust near-dup signal",
    tags=("dedup", "text", "cdc", "extension"),
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Everything per-document is ONE codegen'd array expression (boundary
    positions -> cut list -> chunk substrings) — no UDF, no shuffle until
    the chunk-hash groupBy, which is map-side combinable. Chunk volume is
    ~n_chars/32 slim rows. Boundaries depend only on local 8-char windows,
    so an insertion shifts at most the chunk it lands in — the property
    fixed-width spans (dedup_exact_substring) lack."""
    # spread(): the boundary scan + chunk md5 are CPU-bound per-row work,
    # and the single-file test table scans as ONE partition — round-robin
    # unlocks every core for the map stage (gated: skipped at real split counts).
    docs = (
        spread(tbl(spark, sf_dir, "documents"))
        .filter(F.col("text").isNotNull() & (F.length("text") >= _CDC_WIN))
        .select("doc_id", "text", F.length("text").alias("ln"))
    )
    # distinct BEFORE sort: DuckDB's list_distinct does not preserve order,
    # so the portable shape is dedupe-then-sort in both engines.
    # The codepoint array is bound ONCE via bind1 (a bare projected column
    # would be re-inlined by CollapseProject into every one of the 8 lambda
    # references — recomputing the split per boundary position).
    body = (
        f"array_sort(array_distinct(concat(array(0), "
        f"filter(transform(sequence({_CDC_WIN}, ln), "
        f"i -> CASE WHEN {_roll_spark('i')} % {_CDC_MOD} = 0 THEN i END), "
        f"x -> x IS NOT NULL), array(ln))))"
    )
    bexpr = bind1("transform(split(text, ''), ch -> ascii(ch))", "cp", body)
    cuts = docs.select("doc_id", "text", F.expr(bexpr).alias("b"))
    chunks = cuts.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(b) - 1), "
                "j -> substr(text, b[j - 1] + 1, b[j] - b[j - 1]))"
            )
        ).alias("chunk"),
    ).filter(F.length("chunk") >= _CDC_MIN_LEN)
    hashed = chunks.select(
        "doc_id",
        F.expr(h60_spark("chunk")).alias("chunk_h"),
        F.length("chunk").alias("clen"),
    )
    return (
        hashed.groupBy("chunk_h")
        .agg(
            F.min("clen").cast("long").alias("clen"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occ"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# eval_rank_biased_overlap
# ---------------------------------------------------------------------------

_RBO_P = 0.9
_RBO_DEPTH = 10
# (1-p) * p^(d-1) as full-precision double literals — identical in both
# engines because they PARSE the same decimal literal, never compute pow()
_RBO_W = [(1 - _RBO_P) * _RBO_P ** (d - 1) for d in range(1, _RBO_DEPTH + 1)]


def _rbo_expr(prefix: str) -> str:
    terms = [
        f"({_RBO_W[d - 1]!r} * (CAST({prefix}{d} AS DOUBLE) / {d}))"
        for d in range(1, _RBO_DEPTH + 1)
    ]
    return " + ".join(terms)


def _rbo_overlap_cols_duck() -> str:
    return ",\n         ".join(
        f"CAST(SUM(CASE WHEN ra <= {d} AND rb <= {d} THEN 1 ELSE 0 END) AS BIGINT) AS o{d}"
        for d in range(1, _RBO_DEPTH + 1)
    )


_RBO_ORACLE = f"""
WITH docs AS (
  SELECT COALESCE(lang, '') AS lang, doc_id,
         {h60_duck("CAST(doc_id AS VARCHAR) || '|score'")} AS sa,
         {h60_duck("CAST(doc_id AS VARCHAR) || '|score2'")} AS sb
  FROM documents
),
ranked AS (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY sa DESC, doc_id) AS ra,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY sb DESC, doc_id) AS rb
  FROM docs
),
ov AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         {_rbo_overlap_cols_duck()}
  FROM ranked GROUP BY lang
)
SELECT lang, n_docs, o{_RBO_DEPTH} AS overlap_at_{_RBO_DEPTH},
       CAST(ROUND({_rbo_expr('o')}, 6) AS DOUBLE) AS rbo_at_{_RBO_DEPTH}
FROM ov
"""


@register(
    "eval_rank_biased_overlap",
    oracle=_RBO_ORACLE,
    description=f"RBO@{_RBO_DEPTH} (p={_RBO_P}) between two hash-derived "
    "rankings per language: top-weighted ranking similarity (geometric "
    "depth weights as parsed double literals, overlaps exact integers, "
    "one fixed-order weighted sum) — the top-weighted member next to "
    "kendall_tau_exact / eval_spearman_footrule",
    tags=("evaluation", "ranking", "extension"),
)
def eval_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rank windows sharing the lang partitioning (one shuffle), one
    conditional aggregation for the ten prefix overlaps, one literal
    weighted sum. At 100 TB the group key is the query id and prefix
    depths are constants — a pure reduce."""
    docs = tbl(spark, sf_dir, "documents").select(
        F.coalesce(F.col("lang"), F.lit("")).alias("lang"),
        "doc_id",
        F.expr(h60_spark("CAST(doc_id AS STRING) || '|score'")).alias("sa"),
        F.expr(h60_spark("CAST(doc_id AS STRING) || '|score2'")).alias("sb"),
    )
    wa = W.partitionBy("lang").orderBy(F.col("sa").desc(), F.col("doc_id"))
    wb = W.partitionBy("lang").orderBy(F.col("sb").desc(), F.col("doc_id"))
    ranked = docs.select(
        "lang",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wb).alias("rb"),
    )
    ov = ranked.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        *[
            F.sum(
                F.when((F.col("ra") <= d) & (F.col("rb") <= d), 1).otherwise(0)
            )
            .cast("long")
            .alias(f"o{d}")
            for d in range(1, _RBO_DEPTH + 1)
        ],
    )
    return ov.select(
        "lang",
        "n_docs",
        F.col(f"o{_RBO_DEPTH}").alias(f"overlap_at_{_RBO_DEPTH}"),
        F.round(F.expr(_rbo_expr("o")), 6).cast("double").alias(f"rbo_at_{_RBO_DEPTH}"),
    )
