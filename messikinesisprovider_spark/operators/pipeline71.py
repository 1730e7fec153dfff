"""Round 5 additions, part 3: ranking/calibration evals and preference
aggregation — the measurement jobs an LLM training pipeline runs alongside
dedup/curation, all exact-integer or single-division deterministic (the
pipeline14 conventions: scaled integer numerators, decimal-exact sums, one
IEEE division at the end — no libm log/pow anywhere).

- ``eval_auc_pr_exact`` — exact Average Precision (area under the
  precision-recall curve, step interpolation): global rank over
  (score DESC, vec_id) via the two-pass range-partitioned ranking
  (ranking.global_row_number with a running positive count — no
  single-partition window), AP = (1/P) * sum over positive ranks of
  (tp_k / k) as a scaled-integer numerator + one double division; also
  precision@10. Complements eval_auc_exact (ROC) — PR is the eval that
  matters under class imbalance.
- ``brier_score_decomposition`` — Murphy decomposition of the Brier score
  (reliability - resolution + uncertainty + within-bin variance) over the
  same hash-derived per-mille forecasts eval_calibration_ece uses: every
  term is an exact integer numerator over a power-of-ten denominator.
- ``bradley_terry_two_rounds`` — pairwise-preference strength fitting (the
  RLHF reward-model data shape): supplier "duels" mined per part (cheaper
  min price wins, suppkey tiebreak), then TWO minorization-maximization
  rounds of the Bradley-Terry MLE update w_i <- W_i / sum_j n_ij/(w_i+w_j).
  Round 1 from equal strengths is exactly 2*W_i/E_i (one division); round 2
  re-joins the pair table against round-1 strengths — per-pair terms are
  single IEEE divisions, summed decimal-exact.
- ``doc_unigram_surprisal`` — the log-free perplexity-gate analog: per
  document, the mean inverse corpus frequency of its tokens as a scaled
  integer (sum over occurrences of N_total*1000 div c(token), then div
  n_tokens). Rare-token-heavy (high-surprisal) docs rank first — the same
  screening role a unigram-LM perplexity filter plays, expressed in exact
  integer arithmetic (the term_salience_topk convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import h60_duck, h60_spark
from .ranking import global_row_number
from .relational import spread, tbl
from .retrieval3 import _TOKS_DUCK, _TOKS_SPARK

# ---------------------------------------------------------------------------
# eval_auc_pr_exact
# ---------------------------------------------------------------------------

_AP_SCALE = 10**9

_AP_ORACLE = f"""
WITH base AS (
  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS s,
         CASE WHEN label % 2 <> 0 THEN 1 ELSE 0 END AS is_pos
  FROM embeddings
  WHERE label IS NOT NULL AND embedding IS NOT NULL AND len(embedding) >= 1
    AND abs(CAST(embedding[1] AS DOUBLE)) < 1e30
),
ranked AS (
  SELECT is_pos,
         ROW_NUMBER() OVER (ORDER BY s DESC, vec_id) AS rn,
         SUM(is_pos) OVER (ORDER BY s DESC, vec_id
                           ROWS UNBOUNDED PRECEDING) AS tp
  FROM base
),
tot AS (
  SELECT COUNT(*) AS n, COALESCE(SUM(is_pos), 0) AS n_pos,
         COALESCE(MAX(CASE WHEN rn = 10 THEN tp END), 0) AS tp_at_10
  FROM ranked
),
ap AS (
  SELECT COALESCE(SUM((tp * {_AP_SCALE}) // rn), 0) AS ap_num
  FROM ranked WHERE is_pos = 1
)
SELECT CAST(n AS BIGINT) AS n_scored,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(ap_num AS BIGINT) AS ap_num,
       CASE WHEN n_pos > 0
            THEN CAST(ap_num AS DOUBLE) / (CAST({_AP_SCALE} AS DOUBLE) * n_pos)
       END AS average_precision,
       CASE WHEN n >= 10 THEN CAST(tp_at_10 AS DOUBLE) / 10 END AS precision_at_10
FROM tot, ap
"""


@register(
    "eval_auc_pr_exact",
    oracle=_AP_ORACLE,
    description="Exact Average Precision (step-interpolated PR-AUC) + "
    "precision@10 via two-pass global ranking with a running positive "
    "count; scaled-integer AP numerator, one double division",
    tags=("eval", "statistics", "ranking", "extension"),
)
def eval_auc_pr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PR twin of eval_auc_exact. The global ordering uses
    ranking.global_row_number (range-partitioned two-pass with running
    sums), so no single-partition window exists at any scale; AP terms are
    computed only on positive rows (|positives| of them), aggregated
    map-side."""
    e1 = F.element_at("embedding", 1).cast("double")
    base = (
        tbl(spark, sf_dir, "embeddings")
        .where(
            F.col("label").isNotNull()
            & F.col("embedding").isNotNull()
            & (F.size("embedding") >= 1)
            & (F.abs(e1) < F.lit(1e30))
        )
        .select(
            "vec_id",
            e1.alias("s"),
            F.when(F.col("label") % 2 != 0, 1).otherwise(0).alias("is_pos"),
        )
    )
    ranked, _n = global_row_number(
        base,
        [F.col("s").desc(), F.col("vec_id")],
        rn_col="rn",
        running_sums={"is_pos": "tp"},
    )
    tot = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("is_pos"), F.lit(0)).alias("n_pos"),
        F.coalesce(
            F.max(F.when(F.col("rn") == 10, F.col("tp"))), F.lit(0)
        ).alias("tp_at_10"),
    )
    ap = ranked.filter(F.col("is_pos") == 1).agg(
        F.coalesce(
            F.sum(F.expr(f"(tp * {_AP_SCALE}) div rn")), F.lit(0)
        ).alias("ap_num")
    )
    return tot.crossJoin(ap).select(
        F.col("n").cast("long").alias("n_scored"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("ap_num").cast("long").alias("ap_num"),
        F.when(
            F.col("n_pos") > 0,
            F.col("ap_num").cast("double") / (F.lit(float(_AP_SCALE)) * F.col("n_pos")),
        ).alias("average_precision"),
        F.when(F.col("n") >= 10, F.col("tp_at_10").cast("double") / 10).alias(
            "precision_at_10"
        ),
    )


# ---------------------------------------------------------------------------
# brier_score_decomposition
# ---------------------------------------------------------------------------

_BR_SCALE = 10**9

_BRIER_ORACLE = f"""
WITH preds AS (
  SELECT doc_id,
         {h60_duck("CAST(doc_id AS VARCHAR) || '|s'")} % 1000 AS p_m,
         CASE WHEN {h60_duck("CAST(doc_id AS VARCHAR) || '|l'")} % 3 = 0
              THEN 1 ELSE 0 END AS y
  FROM documents
),
bins AS (
  SELECT p_m // 100 AS bin, COUNT(*) AS n_b, SUM(p_m) AS s_b, SUM(y) AS pos_b,
         SUM(p_m * p_m) AS s2_b
  FROM preds GROUP BY 1
),
tot AS (
  SELECT SUM(n_b) AS n, SUM(pos_b) AS pos,
         SUM((p.s_b - 1000 * p.pos_b) * (p.s_b - 1000 * p.pos_b) * {_BR_SCALE} // p.n_b)
           AS rel_num,
         SUM((p.n_b * p.s2_b - p.s_b * p.s_b) * {_BR_SCALE} // p.n_b) AS wbv_num
  FROM bins p
),
res_t AS (
  SELECT SUM((t.n * b.pos_b - b.n_b * t.pos) * (t.n * b.pos_b - b.n_b * t.pos)
             * {_BR_SCALE} // (b.n_b * t.n * t.n)) AS res_num
  FROM bins b CROSS JOIN tot t
),
bs_t AS (
  SELECT SUM((p_m - 1000 * y) * (p_m - 1000 * y)) AS bs_num FROM preds
)
SELECT CAST(n AS BIGINT) AS n_preds,
       CAST(pos AS BIGINT) AS n_pos,
       CAST(bs_num AS BIGINT) AS bs_num,
       CAST(bs_num AS DOUBLE) / (1000000.0 * n) AS brier_score,
       CAST(rel_num AS DOUBLE) / ({_BR_SCALE} * 1000000.0 * n) AS reliability,
       CAST(res_num AS DOUBLE) / ({_BR_SCALE} * 1.0 * n) AS resolution,
       CAST(pos * (n - pos) AS DOUBLE) / (CAST(n AS DOUBLE) * n) AS uncertainty,
       CAST(wbv_num AS DOUBLE) / ({_BR_SCALE} * 1000000.0 * n) AS within_bin_var
FROM tot, res_t, bs_t
"""


@register(
    "brier_score_decomposition",
    oracle=_BRIER_ORACLE,
    description="Murphy decomposition of the Brier score (reliability / "
    "resolution / uncertainty / within-bin variance) over the ECE query's "
    "hash-derived per-mille forecasts — every term an exact scaled-integer "
    "numerator with one double division",
    tags=("eval", "statistics", "extension"),
)
def brier_score_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scan -> 10 forecast bins -> closed-form decomposition terms.
    Integer envelope: numerators peak at (n*pos_b)^2 * SCALE/n_b ~ 1e17 at
    sf0.1 — within int64; at true corpus scale the two squared factors move
    to DECIMAL(38,0), the documented pipeline14 widening."""
    preds = spread(tbl(spark, sf_dir, "documents")).select(
        F.expr(h60_spark("CAST(doc_id AS STRING) || '|s'") + " % 1000").alias("p_m"),
        F.expr(
            "CASE WHEN "
            + h60_spark("CAST(doc_id AS STRING) || '|l'")
            + " % 3 = 0 THEN 1 ELSE 0 END"
        ).alias("y"),
    )
    bins = preds.groupBy((F.col("p_m") / 100).cast("long").alias("bin")).agg(
        F.count(F.lit(1)).alias("n_b"),
        F.sum("p_m").alias("s_b"),
        F.sum("y").alias("pos_b"),
        F.sum(F.col("p_m") * F.col("p_m")).alias("s2_b"),
    )
    tot = bins.agg(
        F.sum("n_b").alias("n"),
        F.sum("pos_b").alias("pos"),
        F.sum(
            F.expr(
                f"(s_b - 1000 * pos_b) * (s_b - 1000 * pos_b) * {_BR_SCALE} div n_b"
            )
        ).alias("rel_num"),
        F.sum(
            F.expr(f"(n_b * s2_b - s_b * s_b) * {_BR_SCALE} div n_b")
        ).alias("wbv_num"),
    )
    res = (
        bins.crossJoin(F.broadcast(tot.select("n", "pos")))
        .agg(
            F.sum(
                F.expr(
                    f"(n * pos_b - n_b * pos) * (n * pos_b - n_b * pos) "
                    f"* {_BR_SCALE} div (n_b * n * n)"
                )
            ).alias("res_num")
        )
    )
    bs = preds.agg(
        F.sum(F.expr("(p_m - 1000 * y) * (p_m - 1000 * y)")).alias("bs_num")
    )
    return (
        tot.crossJoin(res)
        .crossJoin(bs)
        .select(
            F.col("n").cast("long").alias("n_preds"),
            F.col("pos").cast("long").alias("n_pos"),
            F.col("bs_num").cast("long").alias("bs_num"),
            (F.col("bs_num").cast("double") / (1000000.0 * F.col("n"))).alias(
                "brier_score"
            ),
            (
                F.col("rel_num").cast("double") / (_BR_SCALE * 1000000.0 * F.col("n"))
            ).alias("reliability"),
            (F.col("res_num").cast("double") / (_BR_SCALE * 1.0 * F.col("n"))).alias(
                "resolution"
            ),
            (
                (F.col("pos") * (F.col("n") - F.col("pos"))).cast("double")
                / (F.col("n").cast("double") * F.col("n"))
            ).alias("uncertainty"),
            (
                F.col("wbv_num").cast("double") / (_BR_SCALE * 1000000.0 * F.col("n"))
            ).alias("within_bin_var"),
        )
    )


# ---------------------------------------------------------------------------
# bradley_terry_two_rounds
# ---------------------------------------------------------------------------

_BT_TOPK = 20

_BT_ORACLE = f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS price
  FROM lineitem GROUP BY 1, 2
),
duel AS (
  SELECT a.l_suppkey AS sa, b.l_suppkey AS sb,
         CASE WHEN a.price < b.price
                OR (a.price = b.price AND a.l_suppkey < b.l_suppkey)
              THEN 1 ELSE 0 END AS a_wins
  FROM ps a JOIN ps b
    ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
),
pair AS (
  SELECT sa, sb, COUNT(*) AS n_ij, SUM(a_wins) AS wins_a
  FROM duel GROUP BY 1, 2
),
stats AS (
  SELECT s, SUM(n) AS enc, SUM(w) AS wins FROM (
    SELECT sa AS s, n_ij AS n, wins_a AS w FROM pair
    UNION ALL
    SELECT sb AS s, n_ij AS n, n_ij - wins_a AS w FROM pair
  ) GROUP BY s
),
w1 AS (
  SELECT s, enc, wins, 2.0 * wins / enc AS w FROM stats
),
den2 AS (
  SELECT s, CAST(SUM(CAST(term AS DECIMAL(27,15))) AS DOUBLE) AS den FROM (
    SELECT p.sa AS s, p.n_ij / (wa.w + wb.w) AS term
    FROM pair p JOIN w1 wa ON wa.s = p.sa JOIN w1 wb ON wb.s = p.sb
    UNION ALL
    SELECT p.sb AS s, p.n_ij / (wa.w + wb.w) AS term
    FROM pair p JOIN w1 wa ON wa.s = p.sa JOIN w1 wb ON wb.s = p.sb
  ) GROUP BY s
)
SELECT CAST(w1.s AS BIGINT) AS suppkey,
       CAST(w1.enc AS BIGINT) AS encounters,
       CAST(w1.wins AS BIGINT) AS wins,
       CAST(ROUND(w1.w, 6) AS DOUBLE) AS strength_r1,
       CAST(ROUND(CASE WHEN den2.den > 0 THEN w1.wins / den2.den END, 6) AS DOUBLE)
         AS strength_r2
FROM w1 JOIN den2 ON den2.s = w1.s
ORDER BY strength_r2 DESC, suppkey
LIMIT {_BT_TOPK}
"""


@register(
    "bradley_terry_two_rounds",
    oracle=_BT_ORACLE,
    description="Bradley-Terry preference strengths from pairwise duels "
    "(cheapest supplier per shared part wins), TWO MM iterations of "
    "w_i = W_i / sum_j n_ij/(w_i+w_j); round-1 strengths are exact "
    "2*wins/encounters, round-2 terms single IEEE divisions summed "
    "decimal-exact — the RLHF pairwise-preference aggregation shape",
    tags=("eval", "statistics", "mining", "extension"),
)
def bradley_terry_two_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: duels are a per-part self-join of the (part, supplier)
    min-price table — fan-out bounded by suppliers-per-part, never |parts|²;
    the pair table is aggregated once and re-joined per MM round against the
    |suppliers|-sized strengths table (an equi-join; broadcastable while
    strengths fit, shuffle-join beyond)."""
    # Persist the (part, supplier, min price) table: both sides of the duel
    # self-join read it, and without the cache each side re-runs the full
    # lineitem scan + aggregation (measured 5.8 s -> ~3 s at sf0.1).
    ps = (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("price"))
        .persist()
    )
    a = ps.alias("a")
    b = ps.alias("b")
    duel = a.join(
        b,
        (F.col("a.l_partkey") == F.col("b.l_partkey"))
        & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
    ).select(
        F.col("a.l_suppkey").alias("sa"),
        F.col("b.l_suppkey").alias("sb"),
        F.when(
            (F.col("a.price") < F.col("b.price"))
            | (
                (F.col("a.price") == F.col("b.price"))
                & (F.col("a.l_suppkey") < F.col("b.l_suppkey"))
            ),
            1,
        )
        .otherwise(0)
        .alias("a_wins"),
    )
    pair = duel.groupBy("sa", "sb").agg(
        F.count(F.lit(1)).alias("n_ij"), F.sum("a_wins").alias("wins_a")
    ).persist()
    stats = (
        pair.select(F.col("sa").alias("s"), F.col("n_ij").alias("n"), F.col("wins_a").alias("w"))
        .unionAll(
            pair.select(
                F.col("sb").alias("s"),
                F.col("n_ij").alias("n"),
                (F.col("n_ij") - F.col("wins_a")).alias("w"),
            )
        )
        .groupBy("s")
        .agg(F.sum("n").alias("enc"), F.sum("w").alias("wins"))
    )
    # Persist the strengths (|suppliers| rows): wa, wb and the final join all
    # read it, and each would otherwise recompute the stats chain.
    w1 = stats.select(
        "s", "enc", "wins", (2.0 * F.col("wins") / F.col("enc")).alias("w")
    ).persist()
    wa = w1.select(F.col("s").alias("sa"), F.col("w").alias("w_a"))
    wb = w1.select(F.col("s").alias("sb"), F.col("w").alias("w_b"))
    # One pass over the joined pair terms: emit both endpoints' (s, term)
    # rows with a single explode instead of a self-union that would execute
    # the 3-way join twice (the knn_graph_build mirroring trick).
    terms = pair.join(wa, "sa").join(wb, "sb")
    den2 = (
        terms.select(
            F.explode(
                F.expr(
                    "array(struct(sa AS s, n_ij / (w_a + w_b) AS term), "
                    "named_struct('s', sb, 'term', n_ij / (w_a + w_b)))"
                )
            ).alias("p")
        )
        .select("p.s", "p.term")
        .groupBy("s")
        .agg(F.expr("CAST(SUM(CAST(term AS DECIMAL(27,15))) AS DOUBLE)").alias("den"))
    )
    return (
        w1.join(den2, "s")
        .select(
            F.col("s").cast("long").alias("suppkey"),
            F.col("enc").cast("long").alias("encounters"),
            F.col("wins").cast("long").alias("wins"),
            F.round(F.col("w"), 6).cast("double").alias("strength_r1"),
            F.round(
                F.when(F.col("den") > 0, F.col("wins") / F.col("den")), 6
            )
            .cast("double")
            .alias("strength_r2"),
        )
        .orderBy(F.col("strength_r2").desc(), "suppkey")
        .limit(_BT_TOPK)
    )


# ---------------------------------------------------------------------------
# doc_unigram_surprisal
# ---------------------------------------------------------------------------

_SURPRISAL_TOPK = 30

_SURPRISAL_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, UNNEST({_TOKS_DUCK}) AS t
  FROM documents WHERE text IS NOT NULL
),
cnt AS (SELECT t, COUNT(*) AS c FROM toks GROUP BY t),
tot AS (SELECT COUNT(*) AS n_total FROM toks),
per_doc AS (
  SELECT toks.doc_id,
         COUNT(*) AS n_tokens,
         SUM((tot.n_total * 1000) // cnt.c) AS score_num
  FROM toks JOIN cnt ON cnt.t = toks.t CROSS JOIN tot
  GROUP BY toks.doc_id
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(score_num // n_tokens AS BIGINT) AS surprisal_pm
FROM per_doc
ORDER BY surprisal_pm DESC, doc_id
LIMIT {_SURPRISAL_TOPK}
"""


@register(
    "doc_unigram_surprisal",
    oracle=_SURPRISAL_ORACLE,
    description="Log-free perplexity-gate analog: per-document mean inverse "
    "corpus token frequency as a scaled integer (N_total*1000 div c(t), "
    "averaged per doc); rare-token-heavy docs rank first — the unigram-LM "
    "screening role without cross-engine libm log risk",
    tags=("text", "curation", "quality", "extension"),
)
def doc_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side token explode -> global count table -> equi-join back (the
    corpus-count join is on the token key; at 100 TB the count table is the
    materialized vocabulary, orders smaller than the corpus)."""
    toks = (
        spread(tbl(spark, sf_dir, "documents"))
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.explode(F.expr(_TOKS_SPARK)).alias("t"))
    ).persist()
    cnt = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    tot = toks.agg(F.count(F.lit(1)).alias("n_total"))
    per_doc = (
        toks.join(cnt, "t")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.expr("(n_total * 1000) div c")).alias("score_num"),
        )
    )
    return (
        per_doc.select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.expr("score_num div n_tokens").cast("long").alias("surprisal_pm"),
        )
        .orderBy(F.col("surprisal_pm").desc(), "doc_id")
        .limit(_SURPRISAL_TOPK)
    )
