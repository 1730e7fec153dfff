"""Round 4 additions, part 28: prefix-filter set-similarity join and
exact mergeable bitmap distinct.

- ``setsim_prefix_filter_join`` — the EXACT Jaccard similarity join done
  the scalable way (Chaudhuri/Bayardo prefix filtering, the PPJoin
  family) over 3-word-shingle sets: order each document's distinct
  shingles by ascending global document frequency (rarest first, shingle
  tiebreak), keep only the PREFIX of length |set| - ceil(t*|set|) + 1,
  and generate candidates by self-joining on prefix shingles only.  The
  shingle universe matters: this corpus has a 31-WORD vocabulary (every
  word is in up to 78%% of docs — word-level prefix filtering degenerates
  to a 45M-candidate quadratic), while 3-shingles have df <= 25 at sf0.1
  (27k-term long tail), exactly the regime the filter needs.  Any pair with Jaccard >= t MUST
  share a prefix token (pigeonhole on the sorted universe), so the join
  is lossless while the fan-out is bounded by the document frequency of
  RARE tokens — the hot-token quadratic never materializes.  A size
  filter (t*|a| <= |b|) prunes further before verification; the
  verification join computes exact integer intersections only for
  candidates, and the threshold test 10*inter >= 9*union is pure integer
  arithmetic (t = 0.9).  The OUTPUT is the per-document top-1 nearest
  near-duplicate (deterministic jaccard/inter/partner ordering), keeping
  results linear in corpus size — the all-pairs emission is quadratic
  inside template clusters (measured 7.1M pairs at sf0.1 for t = 0.6).
  Contrast: dedup_ngram_jaccard verifies a capped shingle join;
  minhash/simhash are probabilistic buckets.  This is the exact-result
  bucket-free third path.

- ``bitmap_distinct_rollup`` — COUNT(DISTINCT) as mergeable-exact bitmap
  state: users are packed 63-per-word (word = user DIV 63, bit = user %
  63 — bit 63 never set, so BIGINT sign never flips), per-(day, word)
  BIT_OR gives per-day bitmaps, and the weekly rollup merges the DAILY
  state with another BIT_OR instead of rescanning raw events — the exact
  twin of HLL-sketch rollup (sketch_distinct_rollup) with additive
  partial aggregation at every level.  Per-day distinct =
  SUM(bit_count(word)); the oracle checks both levels against plain
  COUNT(DISTINCT), so the bitmap algebra itself is what's verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .dedup import bind1
from .relational import events_tbl, spread, tbl

# ---------------------------------------------------------------------------
# setsim_prefix_filter_join
# ---------------------------------------------------------------------------

# Jaccard threshold 0.9 as the exact rational 9/10: all filters are integer
# cross-multiplications.  The output is the per-document TOP-1 near-duplicate
# (linear in corpus size) — emitting all pairs is quadratic inside template
# clusters (measured 7.1M pairs at sf0.1 for t=0.6 on this corpus).
_T_NUM, _T_DEN = 9, 10

_SETSIM_ORACLE = f"""
WITH words AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
  FROM documents WHERE text IS NOT NULL
),
tok AS (
  -- 3-word shingles (1-based list indexing; range is empty when len < 3)
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS token
  FROM words, UNNEST(range(1, len(ws) - 1)) t(i)
),
df AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM tok GROUP BY token
),
ordered AS (
  SELECT t.doc_id, t.token,
         ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY d.freq, t.token) AS pos,
         COUNT(*) OVER (PARTITION BY t.doc_id) AS sz
  FROM tok t JOIN df d ON d.token = t.token
),
prefix AS (
  -- prefix length = sz - ceil(t*sz) + 1, with ceil(9*sz/10) integer-exact
  -- (// is DuckDB integer division; plain / yields DOUBLE and CAST rounds)
  SELECT doc_id, token, sz FROM ordered
  WHERE pos <= sz - (({_T_NUM} * sz + {_T_DEN} - 1) // {_T_DEN}) + 1
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sz AS sz_a, b.sz AS sz_b
  FROM prefix a JOIN prefix b
    ON a.token = b.token AND a.doc_id < b.doc_id
  WHERE {_T_NUM} * a.sz <= {_T_DEN} * b.sz
    AND {_T_NUM} * b.sz <= {_T_DEN} * a.sz
),
verified AS (
  SELECT c.doc_a, c.doc_b, c.sz_a, c.sz_b,
         CAST(COUNT(*) AS BIGINT) AS inter
  FROM cand c
  JOIN tok ta ON ta.doc_id = c.doc_a
  JOIN tok tb ON tb.doc_id = c.doc_b AND tb.token = ta.token
  GROUP BY c.doc_a, c.doc_b, c.sz_a, c.sz_b
),
matched AS (
  SELECT doc_a, doc_b, inter, sz_a + sz_b - inter AS union_sz FROM verified
  WHERE {_T_DEN} * inter >= {_T_NUM} * (sz_a + sz_b - inter)
),
sym AS (
  SELECT doc_a AS doc_id, doc_b AS partner, inter, union_sz FROM matched
  UNION ALL
  SELECT doc_b AS doc_id, doc_a AS partner, inter, union_sz FROM matched
),
best AS (
  SELECT *,
         CAST(inter AS DOUBLE) / CAST(union_sz AS DOUBLE) AS jaccard,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY CAST(inter AS DOUBLE) / CAST(union_sz AS DOUBLE) DESC,
                                     inter DESC, partner) AS rk,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_matches
  FROM sym
)
SELECT doc_id, partner AS best_match,
       CAST(inter AS BIGINT) AS inter,
       CAST(union_sz AS BIGINT) AS union_sz,
       jaccard,
       CAST(n_matches AS BIGINT) AS n_matches
FROM best WHERE rk = 1
"""


@register(
    "setsim_prefix_filter_join",
    oracle=_SETSIM_ORACLE,
    description="Per-document nearest near-duplicate under EXACT "
    "Jaccard>=0.9 via prefix filtering (PPJoin family): token universe "
    "ordered by ascending global df, candidates generated ONLY on the "
    "rare prefix tokens (lossless by pigeonhole; fan-out bounded by "
    "rare-token df), size filter pre-verification, exact integer "
    "intersection verify with the threshold as the rational "
    "cross-multiplication 10*inter >= 9*union; top-1 per doc keeps the "
    "output linear (all-pairs is quadratic inside template clusters)",
    tags=("dedup", "similarity", "join", "llm-pipeline", "extension"),
)
def setsim_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread(): the regexp shingling is CPU-bound map work and the
    # single-file test table scans as ONE partition (gated: skipped at real split
    # counts). Persisting tok was tried and measured worse (see
    # OPTIMIZATION_r08.md) — the parallel scan is the cheap fix.
    docs = spread(tbl(spark, sf_dir, "documents")).filter(F.col("text").isNotNull())
    # 3-word shingles; bind1 evaluates the word array once (CollapseProject
    # would otherwise re-run the regexp per reference), and the CASE guards
    # sequence() against size < 3 (a negative-step sequence, not empty).
    shingles = bind1(
        "regexp_extract_all(lower(text), '[a-z]+', 0)",
        "ws",
        "CASE WHEN size(ws) >= 3 THEN "
        "transform(sequence(0, size(ws) - 3), "
        "i -> concat(ws[i], ' ', ws[i + 1], ' ', ws[i + 2])) "
        "ELSE CAST(array() AS array<string>) END",
    )
    tok = docs.select("doc_id", F.explode(F.expr(shingles)).alias("token")).distinct()
    df = tok.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    wdoc = W.partitionBy("doc_id").orderBy("freq", "token")
    ordered = (
        tok.join(df, "token")
        .select(
            "doc_id",
            "token",
            F.row_number().over(wdoc).alias("pos"),
            F.count(F.lit(1)).over(W.partitionBy("doc_id")).alias("sz"),
        )
    )
    prefix = ordered.filter(
        F.col("pos")
        <= F.col("sz") - F.expr(f"({_T_NUM} * sz + {_T_DEN} - 1) DIV {_T_DEN}") + 1
    ).select("doc_id", "token", "sz")
    a = prefix.alias("a")
    b = prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(
            (_T_NUM * F.col("a.sz") <= _T_DEN * F.col("b.sz"))
            & (_T_NUM * F.col("b.sz") <= _T_DEN * F.col("a.sz"))
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
        .distinct()
    )
    ta = tok.alias("ta")
    tb = tok.alias("tb")
    verified = (
        cand.join(ta, F.col("ta.doc_id") == F.col("doc_a"))
        .join(
            tb,
            (F.col("tb.doc_id") == F.col("doc_b"))
            & (F.col("tb.token") == F.col("ta.token")),
        )
        .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    matched = verified.filter(
        _T_DEN * F.col("inter")
        >= _T_NUM * (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    ).select(
        "doc_a",
        "doc_b",
        "inter",
        (F.col("sz_a") + F.col("sz_b") - F.col("inter")).alias("union_sz"),
    )
    sym = matched.select(
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").alias("partner"),
        "inter",
        "union_sz",
    ).unionAll(
        matched.select(
            F.col("doc_b").alias("doc_id"),
            F.col("doc_a").alias("partner"),
            "inter",
            "union_sz",
        )
    )
    jac = F.col("inter").cast("double") / F.col("union_sz").cast("double")
    wbest = W.partitionBy("doc_id").orderBy(
        jac.desc(), F.col("inter").desc(), F.col("partner")
    )
    best = sym.select(
        "doc_id",
        "partner",
        "inter",
        "union_sz",
        jac.alias("jaccard"),
        F.row_number().over(wbest).alias("rk"),
        F.count(F.lit(1)).over(W.partitionBy("doc_id")).cast("long").alias("n_matches"),
    )
    return best.filter(F.col("rk") == 1).select(
        "doc_id",
        F.col("partner").alias("best_match"),
        "inter",
        "union_sz",
        "jaccard",
        "n_matches",
    )


# ---------------------------------------------------------------------------
# bitmap_distinct_rollup
# ---------------------------------------------------------------------------

_BMAP_ORACLE = """
WITH ev AS (
  SELECT date_trunc('day', ts) AS day, date_trunc('week', ts) AS week, user_id
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
daily AS (
  SELECT week, day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS d
  FROM ev GROUP BY week, day
)
SELECT CAST(w.week AS TIMESTAMP) AS week,
       CAST(d.n_days AS BIGINT) AS n_days,
       CAST(d.user_days AS BIGINT) AS user_days,
       CAST(w.weekly_distinct AS BIGINT) AS weekly_distinct
FROM (SELECT week, COUNT(DISTINCT user_id) AS weekly_distinct FROM ev GROUP BY week) w
JOIN (SELECT week, COUNT(*) AS n_days, SUM(d) AS user_days FROM daily GROUP BY week) d
  ON d.week = w.week
"""


@register(
    "bitmap_distinct_rollup",
    oracle=_BMAP_ORACLE,
    description="Exact COUNT(DISTINCT) as mergeable bitmap state: users "
    "packed 63-per-BIGINT word (bit 63 never set), per-(day,word) BIT_OR "
    "bitmaps, weekly level merged FROM THE DAILY STATE by a second BIT_OR "
    "— no raw rescan, additive partials at every level (the exact twin of "
    "the HLL rollup); per-level distinct = SUM(bit_count(word)); the "
    "oracle is plain COUNT(DISTINCT) at both levels, so the bitmap "
    "algebra is what's verified",
    tags=("analytics", "sketch", "rollup", "extension"),
)
def bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            F.date_trunc("day", "ts").alias("day"),
            F.date_trunc("week", "ts").alias("week"),
            F.expr("user_id DIV 63").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))").alias("mask"),
        )
    )
    daily = ev.groupBy("week", "day", "word").agg(F.expr("bit_or(mask)").alias("bits"))
    per_day = daily.groupBy("week", "day").agg(
        F.sum(F.bit_count("bits")).cast("long").alias("d")
    )
    weekly_words = daily.groupBy("week", "word").agg(F.expr("bit_or(bits)").alias("bits"))
    weekly = weekly_words.groupBy("week").agg(
        F.sum(F.bit_count("bits")).cast("long").alias("weekly_distinct")
    )
    day_side = per_day.groupBy("week").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("d").cast("long").alias("user_days"),
    )
    return weekly.join(day_side, "week").select(
        F.col("week").cast("timestamp").alias("week"),
        "n_days",
        "user_days",
        "weekly_distinct",
    )
