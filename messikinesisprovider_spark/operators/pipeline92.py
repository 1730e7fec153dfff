"""Round 8 additions, part 2: a generation-eval recall metric and a
preference-data planner.

- ``eval_rouge_n_f1``: corpus-level ROUGE-2 F1 per source over
  deterministic (even doc_id = candidate, +1 = reference) pairs — the
  RECALL twin of ``eval_ngram_precision_bleu`` (pipeline77, which owns the
  clipped-precision side of generation eval). Clipped bigram matches; F1
  via the integer identity 2m/(cand_total + ref_total) — one double
  division from exact BIGINTs.
- ``dpo_pair_construction``: preference-pair mining per (source, lang)
  group — rank docs by a quality key, pair rank i from the top (chosen)
  with rank i from the bottom (rejected), i <= n/2, with the margin
  attached. The window is partitioned by the group key; at 100 TB groups
  are prompts and per-group candidate lists are bounded.

(An MRR@k eval, a BLEU-core precision metric and a largest-remainder
apportionment planner already exist — ``eval_mrr_at_k`` pipeline75,
``eval_ngram_precision_bleu`` pipeline77, ``apportion_largest_remainder``
pipeline44 — so this module adds only the genuinely-new members.)

Reference parity note: the reference engine (SURVEY.md §0) has no
analytics surface; these extend the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import tbl

# ---------------------------------------------------------------------------
# shared candidate/reference pairing + n-gram counts (BLEU / ROUGE)
# ---------------------------------------------------------------------------

_PAIR_CTE_DUCK = """
pairs AS (
  SELECT c.doc_id // 2 AS pair_id, COALESCE(c.source, '') AS src,
         c.text AS cand_text, r.text AS ref_text
  FROM documents c JOIN documents r ON r.doc_id = c.doc_id + 1
  WHERE c.doc_id % 2 = 0 AND c.text IS NOT NULL AND r.text IS NOT NULL
),
toks AS (
  SELECT pair_id, src, 'c' AS side, UNNEST(string_split(cand_text, ' ')) AS w,
         UNNEST(range(1, 1 + len(string_split(cand_text, ' ')))) AS p
  FROM pairs
  UNION ALL
  SELECT pair_id, src, 'r' AS side, UNNEST(string_split(ref_text, ' ')) AS w,
         UNNEST(range(1, 1 + len(string_split(ref_text, ' ')))) AS p
  FROM pairs
),
grams AS (
  SELECT pair_id, src, side, 1 AS n, w AS g FROM toks
  UNION ALL
  SELECT pair_id, src, side, 2 AS n,
         w || ' ' || LEAD(w) OVER (PARTITION BY pair_id, side ORDER BY p) AS g
  FROM toks QUALIFY g IS NOT NULL
),
gcounts AS (
  SELECT pair_id, src, side, n, g, COUNT(*) AS c
  FROM grams GROUP BY 1, 2, 3, 4, 5
),
matched AS (
  SELECT cc.pair_id, cc.src, cc.n,
         SUM(LEAST(cc.c, rc.c)) AS m
  FROM gcounts cc JOIN gcounts rc
    ON cc.pair_id = rc.pair_id AND cc.n = rc.n AND cc.g = rc.g
   AND cc.side = 'c' AND rc.side = 'r'
  GROUP BY 1, 2, 3
),
totals AS (
  SELECT pair_id, src, side, n, SUM(c) AS t
  FROM gcounts GROUP BY 1, 2, 3, 4
),
persrc AS (
  SELECT t.src,
         CAST(SUM(CASE WHEN t.side = 'c' AND t.n = 1 THEN t.t ELSE 0 END) AS BIGINT) AS total1,
         CAST(SUM(CASE WHEN t.side = 'c' AND t.n = 2 THEN t.t ELSE 0 END) AS BIGINT) AS total2,
         CAST(SUM(CASE WHEN t.side = 'r' AND t.n = 1 THEN t.t ELSE 0 END) AS BIGINT) AS ref_total1,
         CAST(SUM(CASE WHEN t.side = 'r' AND t.n = 2 THEN t.t ELSE 0 END) AS BIGINT) AS ref_total2
  FROM totals t GROUP BY 1
),
msrc AS (
  SELECT src,
         CAST(SUM(CASE WHEN n = 1 THEN m ELSE 0 END) AS BIGINT) AS match1,
         CAST(SUM(CASE WHEN n = 2 THEN m ELSE 0 END) AS BIGINT) AS match2
  FROM matched GROUP BY 1
)
"""


def _pairs(spark: SparkSession, sf_dir: str):
    d = tbl(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    c = d.filter(F.col("doc_id") % 2 == 0).select(
        F.expr("doc_id DIV 2").alias("pair_id"),
        F.col("doc_id").alias("cand_id"),
        F.coalesce(F.col("source"), F.lit("")).alias("src"),
        F.col("text").alias("cand_text"),
    )
    # join_id = ref doc_id - 1, so cand_id == join_id pairs cand with cand+1
    r = d.select((F.col("doc_id") - 1).alias("join_id"), F.col("text").alias("ref_text"))
    return c, r


def _bigrams(c, r):
    """Per-side bigram rows straight off the token array: adjacent split()
    elements joined map-side — same strings the old LEAD-window produced,
    but with zero shuffle (the window sorted the full token explode by
    (pair_id, side, p) first; adjacency is already explicit in the array).
    The size >= 2 guard is required because Spark's sequence(1, 0) DESCENDS
    ([1, 0]) instead of being empty; bind1 keeps split() evaluated once."""
    from .dedup import bind1

    pairs = c.join(r, c["cand_id"] == r["join_id"]).select(
        "pair_id", "src", "cand_text", "ref_text"
    )
    grams = None
    for side, col in [("c", "cand_text"), ("r", "ref_text")]:
        bg = bind1(
            f"split({col}, ' ')",
            "t",
            "CASE WHEN size(t) >= 2 THEN "
            "transform(sequence(1, size(t) - 1), i -> concat_ws(' ', t[i - 1], t[i])) "
            "ELSE CAST(array() AS ARRAY<STRING>) END",
        )
        g = pairs.select(
            "pair_id",
            "src",
            F.lit(side).alias("side"),
            F.explode(F.expr(bg)).alias("g"),
        )
        grams = g if grams is None else grams.unionAll(g)
    return grams


@register(
    "eval_rouge_n_f1",
    oracle=f"""
WITH {_PAIR_CTE_DUCK}
SELECT p.src AS source,
       COALESCE(m.match2, 0) AS match2, p.total2 AS cand_total2,
       p.ref_total2,
       CASE WHEN p.total2 + p.ref_total2 > 0
            THEN CAST(2 * COALESCE(m.match2, 0) AS DOUBLE) / (p.total2 + p.ref_total2)
            ELSE 0.0 END AS rouge2_f1
FROM persrc p LEFT JOIN msrc m ON p.src = m.src
""",
    description="Corpus ROUGE-2 F1 per source over the BLEU pairs: clipped "
    "bigram matches; F1 via the integer identity 2m/(cand+ref totals) — "
    "one exact-rational double division",
    tags=("evaluation", "text", "extension"),
)
def eval_rouge_n_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shares the BLEU pairing/n-gram plan (two groupBys + one per-pair
    clip join); the F1 identity 2PR/(P+R) == 2m/(ct+rt) keeps it one
    division from exact integers."""
    c, r = _pairs(spark, sf_dir)
    grams = _bigrams(c, r)
    gcounts = grams.groupBy("pair_id", "src", "side", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    cc = gcounts.filter(F.col("side") == "c").alias("cc")
    rc = gcounts.filter(F.col("side") == "r").alias("rc")
    matched = (
        cc.join(
            rc,
            (F.col("cc.pair_id") == F.col("rc.pair_id")) & (F.col("cc.g") == F.col("rc.g")),
        )
        .select(F.col("cc.src").alias("src"), F.least(F.col("cc.c"), F.col("rc.c")).alias("m"))
        .groupBy("src")
        .agg(F.sum("m").cast("long").alias("match2"))
    )
    totals = gcounts.groupBy("src").agg(
        F.sum(F.when(F.col("side") == "c", F.col("c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("cand_total2"),
        F.sum(F.when(F.col("side") == "r", F.col("c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("ref_total2"),
    )
    j = totals.join(matched, "src", "left").select(
        "src",
        F.coalesce(F.col("match2"), F.lit(0)).alias("match2"),
        "cand_total2",
        "ref_total2",
    )
    return j.select(
        F.col("src").alias("source"),
        "match2",
        "cand_total2",
        "ref_total2",
        F.when(
            F.col("cand_total2") + F.col("ref_total2") > 0,
            (F.lit(2) * F.col("match2")).cast("double")
            / (F.col("cand_total2") + F.col("ref_total2")),
        )
        .otherwise(F.lit(0.0))
        .alias("rouge2_f1"),
    )


# ---------------------------------------------------------------------------
# dpo_pair_construction
# ---------------------------------------------------------------------------

_DPO_ORACLE = """
WITH docs AS (
  SELECT COALESCE(source, '') AS src, COALESCE(lang, '') AS lang,
         doc_id, n_chars
  FROM documents WHERE text IS NOT NULL
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY src, lang ORDER BY n_chars DESC, doc_id) AS top_r,
         ROW_NUMBER() OVER (PARTITION BY src, lang ORDER BY n_chars ASC, doc_id DESC) AS bot_r,
         COUNT(*) OVER (PARTITION BY src, lang) AS n
  FROM docs
)
SELECT a.src AS source, a.lang,
       CAST(a.top_r AS BIGINT) AS pair_idx,
       a.doc_id AS chosen_id, b.doc_id AS rejected_id,
       CAST(a.n_chars - b.n_chars AS BIGINT) AS margin
FROM ranked a JOIN ranked b
  ON a.src = b.src AND a.lang = b.lang AND a.top_r = b.bot_r
WHERE a.top_r <= a.n // 2
"""


@register(
    "dpo_pair_construction",
    oracle=_DPO_ORACLE,
    description="Preference-pair mining per (source, lang) group: rank i "
    "from the top (chosen) paired with rank i from the bottom (rejected), "
    "i <= n/2, quality-margin attached — the DPO/RLHF dataset construction "
    "shape (two windows sharing one partitioning + a rank-equality join)",
    tags=("pipeline", "preference", "extension"),
)
def dpo_pair_construction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both rank windows share the (src, lang) partitioning — one shuffle;
    the pairing join is rank-to-rank inside the group (equi-join on the
    group key + rank). At 100 TB the group key is the prompt id and each
    group's candidate list is bounded, so this is a partition-local sort."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("text").isNotNull()).select(
        F.coalesce(F.col("source"), F.lit("")).alias("src"),
        F.coalesce(F.col("lang"), F.lit("")).alias("lang"),
        "doc_id",
        "n_chars",
    )
    wt = W.partitionBy("src", "lang").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    wb = W.partitionBy("src", "lang").orderBy(F.col("n_chars").asc(), F.col("doc_id").desc())
    wn = W.partitionBy("src", "lang")
    ranked = docs.select(
        "src",
        "lang",
        "doc_id",
        "n_chars",
        F.row_number().over(wt).alias("top_r"),
        F.row_number().over(wb).alias("bot_r"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    a = ranked.alias("a")
    b = ranked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.src") == F.col("b.src"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.top_r") == F.col("b.bot_r")),
        )
        .filter(F.col("a.top_r") <= F.expr("a.n DIV 2"))
        .select(
            F.col("a.src").alias("source"),
            F.col("a.lang").alias("lang"),
            F.col("a.top_r").cast("long").alias("pair_idx"),
            F.col("a.doc_id").alias("chosen_id"),
            F.col("b.doc_id").alias("rejected_id"),
            (F.col("a.n_chars") - F.col("b.n_chars")).cast("long").alias("margin"),
        )
    )
