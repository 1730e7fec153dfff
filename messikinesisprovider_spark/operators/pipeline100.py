"""Round 8 additions, part 10: off-policy evaluation, char-level entropy,
intermittent-demand forecasting.

``offpolicy_ips_dr_eval`` — offline (off-policy) evaluation of a target
action policy from logged interaction data: the inverse-propensity
(Horvitz & Thompson 1952) estimate and the doubly-robust estimate
(Dudík, Langford & Li, arXiv:1103.4601) with CROSS-FITTING — the outcome
model is fit on one hash-half of the log and evaluated on the other
(Chernozhukov et al. 2018) so the DR correction is non-degenerate (a
model fit on the evaluation half itself collapses DR to the direct
estimate). Events are the logged (context, action, reward) triples;
logging propensities are a literal policy table. Everything reduces to
per-(context, action, half) integer-cent aggregates plus closed-form
double formulas — two shuffles at any scale.

``text_char_entropy`` — per-document character-bigram Shannon entropy:
H = ln(n) - (1/n)·sum(c·ln c) over bigram counts. The cheap "is this
text natural or boilerplate/gibberish" curation signal (the in-plan
stand-in for the compression-ratio filter Gopher applies,
arXiv:2112.11446 §A1.1, zlib being unavailable to a SQL engine); the
log-sum is a per-doc bigram-sorted sequential fold, bounded by document
length. Complements token-level ``doc_unigram_surprisal`` (corpus LM
surprisal) and ``text_repetition_ratio`` (span duplication).

``forecast_croston_intermittent`` — Croston's method (Croston, Oper.
Res. Q. 1972) for intermittent demand: separate exponential smoothing of
nonzero demand SIZES and inter-demand INTERVALS, forecast = size/interval.
The standard forecaster for sparse part-level demand where Holt/SES on
the raw (mostly zero) series is biased. alpha = 1/8 — dyadic, so the
fold's divisions never round and the day-ordered recurrence is bit-exact
cross-engine (the ``forecast_holt_linear`` convention).

Reference parity note: the reference engine (SURVEY.md §0) has no
analytics surface; these extend the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import bind1, h60_duck, h60_spark
from .relational import events_tbl, spread, tbl

# ---------------------------------------------------------------------------
# offpolicy_ips_dr_eval
# ---------------------------------------------------------------------------

_OP_NCTX = 4
# target policy: context -> action (a literal deterministic policy)
_OP_PI = {0: "click", 1: "view", 2: "purchase", 3: "signup"}
# literal logging propensities p_log(pi(c) | c) — the probability the
# logging policy assigned to the TARGET action in each context
_OP_PLOG = {0: 0.30, 1: 0.25, 2: 0.15, 3: 0.20}

_OP_PI_SQL = "CASE context " + " ".join(
    f"WHEN {c} THEN '{a}'" for c, a in _OP_PI.items()
) + " END"
_OP_P_SQL = "CASE context " + " ".join(
    f"WHEN {c} THEN {p}" for c, p in _OP_PLOG.items()
) + " END"


def _op_oracle() -> str:
    h = h60_duck("'half|' || CAST(event_id AS VARCHAR)")
    return f"""
WITH logged AS (
  SELECT user_id % {_OP_NCTX} AS context, event_type AS action,
         CAST(ROUND(LEAST(COALESCE(value, 0), 100) * 100) AS BIGINT) AS cents,
         CASE WHEN ({h}) % 2 = 0 THEN 'M' ELSE 'E' END AS half
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
agg AS (
  SELECT context,
         CAST(COUNT(*) FILTER (WHERE half = 'E') AS BIGINT) AS n_e,
         CAST(COUNT(*) FILTER (WHERE half = 'E' AND action = {_OP_PI_SQL})
              AS BIGINT) AS n_e_pi,
         CAST(COALESCE(SUM(cents) FILTER (WHERE half = 'E' AND action = {_OP_PI_SQL}), 0)
              AS BIGINT) AS r_e_pi,
         CAST(COUNT(*) FILTER (WHERE half = 'M' AND action = {_OP_PI_SQL})
              AS BIGINT) AS n_m_pi,
         CAST(COALESCE(SUM(cents) FILTER (WHERE half = 'M' AND action = {_OP_PI_SQL}), 0)
              AS BIGINT) AS r_m_pi
  FROM logged GROUP BY 1
)
SELECT context, n_e AS n_eval,
       CAST(ROUND(CASE WHEN n_m_pi > 0
                       THEN r_m_pi / (n_m_pi * 100.0) ELSE 0.0 END, 6)
            AS DOUBLE) AS v_direct,
       CAST(ROUND(r_e_pi / (({_OP_P_SQL}) * n_e * 100.0), 6) AS DOUBLE) AS v_ips,
       CAST(ROUND(
         (CASE WHEN n_m_pi > 0 THEN r_m_pi / (n_m_pi * 100.0) ELSE 0.0 END)
         + (r_e_pi / 100.0
            - n_e_pi * (CASE WHEN n_m_pi > 0
                             THEN r_m_pi / (n_m_pi * 100.0) ELSE 0.0 END))
           / (({_OP_P_SQL}) * n_e), 6) AS DOUBLE) AS v_dr
FROM agg WHERE n_e > 0
"""


@register(
    "offpolicy_ips_dr_eval",
    oracle=_op_oracle(),
    description="Off-policy evaluation of a literal target policy from "
    "logged (context, action, reward) events: inverse-propensity estimate "
    "(Horvitz & Thompson 1952) against a literal logging-propensity table "
    "and the doubly-robust estimate (Dudík et al. arXiv:1103.4601) with a "
    "cross-fitted hash-half outcome model (Chernozhukov et al. 2018) — "
    "integer-cent aggregates, closed-form doubles",
    tags=("experimentation", "off-policy", "bandits", "extension"),
)
def offpolicy_ips_dr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One groupBy(context) over conditional integer aggregates carries the
    whole estimator — the IPS/DR algebra happens on four context rows, so
    the 100 TB plan is one map-side-combined aggregation."""
    h = h60_spark("'half|' || CAST(event_id AS STRING)")
    e = events_tbl(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    logged = e.select(
        (F.col("user_id") % _OP_NCTX).alias("context"),
        F.col("event_type").alias("action"),
        F.expr(
            "CAST(ROUND(LEAST(COALESCE(value, 0), 100) * 100) AS BIGINT)"
        ).alias("cents"),
        F.expr(f"CASE WHEN ({h}) % 2 = 0 THEN 'M' ELSE 'E' END").alias("half"),
    )
    is_pi = F.col("action") == F.expr(_OP_PI_SQL)
    agg = logged.groupBy("context").agg(
        F.count(F.when(F.col("half") == "E", 1)).cast("long").alias("n_e"),
        F.count(F.when((F.col("half") == "E") & is_pi, 1))
        .cast("long")
        .alias("n_e_pi"),
        F.coalesce(F.sum(F.when((F.col("half") == "E") & is_pi, F.col("cents"))), F.lit(0))
        .cast("long")
        .alias("r_e_pi"),
        F.count(F.when((F.col("half") == "M") & is_pi, 1))
        .cast("long")
        .alias("n_m_pi"),
        F.coalesce(F.sum(F.when((F.col("half") == "M") & is_pi, F.col("cents"))), F.lit(0))
        .cast("long")
        .alias("r_m_pi"),
    )
    q_hat = F.when(
        F.col("n_m_pi") > 0, F.col("r_m_pi") / (F.col("n_m_pi") * F.lit(100.0))
    ).otherwise(F.lit(0.0))
    p = F.expr(_OP_P_SQL)
    v_ips = F.col("r_e_pi") / (p * F.col("n_e") * F.lit(100.0))
    v_dr = q_hat + (
        F.col("r_e_pi") / F.lit(100.0) - F.col("n_e_pi") * q_hat
    ) / (p * F.col("n_e"))
    return agg.filter(F.col("n_e") > 0).select(
        "context",
        F.col("n_e").alias("n_eval"),
        F.round(q_hat, 6).cast("double").alias("v_direct"),
        F.round(v_ips, 6).cast("double").alias("v_ips"),
        F.round(v_dr, 6).cast("double").alias("v_dr"),
    )


# ---------------------------------------------------------------------------
# text_char_entropy
# ---------------------------------------------------------------------------

_TCE_LOW = 3.0  # natural ~200-char text sits near ln(150)~5; runs/repeats far below

_TCE_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, text FROM documents
  WHERE text IS NOT NULL AND length(text) >= 2
),
bigrams AS (
  SELECT doc_id, substr(text, CAST(t.i AS INT), 2) AS bg
  FROM docs CROSS JOIN UNNEST(range(1, length(text))) AS t(i)
),
counts AS (
  SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS c
  FROM bigrams GROUP BY 1, 2
),
folded AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         list_sum(list_transform(list(c * ln(c) ORDER BY bg), v -> v)) AS clnc
  FROM counts GROUP BY 1
)
SELECT doc_id, n AS n_bigrams, n_distinct AS n_distinct_bigrams,
       CAST(ROUND(ln(n) - COALESCE(clnc, 0.0) / n, 6) AS DOUBLE) AS entropy,
       (ln(n) - COALESCE(clnc, 0.0) / n) < {_TCE_LOW} AS low_entropy
FROM folded
"""


@register(
    "text_char_entropy",
    oracle=_TCE_ORACLE,
    description="Per-document character-bigram Shannon entropy "
    "(H = ln n - sum(c ln c)/n) with a low-entropy boilerplate flag — the "
    "in-plan stand-in for Gopher's compression-ratio filter "
    "(arXiv:2112.11446); per-doc bigram-sorted sequential log-sum fold, "
    "bounded by document length",
    tags=("text", "quality", "curation", "extension"),
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The explode fans out to ~len(text) rows per document and collapses
    straight back to per-doc counts — a map-side-combinable shuffle keyed
    by doc, arrays bounded by doc length. No UDF anywhere."""
    d = (
        spread(tbl(spark, sf_dir, "documents"))
        .filter(F.col("text").isNotNull() & (F.length("text") >= 2))
        .select("doc_id", "text")
    )
    bigrams = d.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))")
        ).alias("bg"),
    )
    counts = bigrams.groupBy("doc_id", "bg").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    folded = counts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(bg, c))), "
            "s -> s.c * ln(s.c)), 0D, (a, x) -> a + x)"
        ).alias("clnc"),
    )
    h = F.log(F.col("n")) - F.coalesce(F.col("clnc"), F.lit(0.0)) / F.col("n")
    return folded.select(
        "doc_id",
        F.col("n").alias("n_bigrams"),
        F.col("n_distinct").alias("n_distinct_bigrams"),
        F.round(h, 6).cast("double").alias("entropy"),
        (h < _TCE_LOW).alias("low_entropy"),
    )


# ---------------------------------------------------------------------------
# forecast_croston_intermittent
# ---------------------------------------------------------------------------
#
# z' = z + (q - z)/8, p' = p + (I - p)/8 (alpha = 1/8, dyadic): the size
# and interval recurrences are single correctly-rounded IEEE ops in an
# identical order, so the fold is bit-exact cross-engine.

_CRO_MIN_DAYS = 3

_CRO_ORACLE = f"""
WITH demand AS (
  SELECT l_partkey,
         CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
              AS DOUBLE) AS day,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS q
  FROM lineitem
  GROUP BY 1, 2
),
folded AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_demand_days,
         list_reduce(
           list_prepend([0.0, 0.0, 0.0, 0.0], list([day, q, 0.0, 0.0] ORDER BY day)),
           (acc, e) -> CASE
             WHEN acc[4] = 0.0 THEN [e[2], 0.0, e[1], 1.0]
             WHEN acc[4] = 1.0 THEN [acc[1] + (e[2] - acc[1]) / 8.0,
                                     e[1] - acc[3], e[1], 2.0]
             ELSE [acc[1] + (e[2] - acc[1]) / 8.0,
                   acc[2] + ((e[1] - acc[3]) - acc[2]) / 8.0,
                   e[1], acc[4] + 1.0] END
         ) AS st
  FROM demand GROUP BY 1
)
SELECT l_partkey, n_demand_days,
       CAST(ROUND(st[1], 6) AS DOUBLE) AS demand_size,
       CAST(ROUND(st[2], 6) AS DOUBLE) AS demand_interval_days,
       CAST(ROUND(st[1] / st[2], 6) AS DOUBLE) AS croston_rate
FROM folded
WHERE n_demand_days >= {_CRO_MIN_DAYS} AND st[2] > 0
"""

_CRO_FOLD_SPARK = """
aggregate(
  array_sort(dq),
  array(0D, 0D, 0D, 0D),
  (acc, e) -> CASE
    WHEN acc[3] = 0D THEN array(e.q, 0D, e.day, 1D)
    WHEN acc[3] = 1D THEN array(acc[0] + (e.q - acc[0]) / 8D,
                                e.day - acc[2], e.day, 2D)
    ELSE array(acc[0] + (e.q - acc[0]) / 8D,
               acc[1] + ((e.day - acc[2]) - acc[1]) / 8D,
               e.day, acc[3] + 1D) END
)
"""


@register(
    "forecast_croston_intermittent",
    oracle=_CRO_ORACLE,
    description="Croston's intermittent-demand method (Croston 1972) per "
    "part: separate alpha=1/8 exponential smoothing of nonzero demand "
    "sizes and inter-demand intervals over ship-day totals, forecast rate "
    "= size/interval — dyadic coefficients, day-ordered fold, bit-exact "
    "cross-engine (the forecast_holt_linear convention)",
    tags=("timeseries", "forecast", "extension"),
)
def forecast_croston_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(part, day) decimal-exact totals then one skinny per-part fold;
    the state is four doubles per key, arrays bounded by the calendar. The
    intermittent series never materializes its zeros — only demand days
    exist as rows, exactly how a 100 TB parts ledger arrives."""
    li = spread(tbl(spark, sf_dir, "lineitem"))
    demand = (
        li.groupBy(
            "l_partkey",
            F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("double")
            .alias("day"),
        )
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("q"))
    )
    folded = demand.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_demand_days"),
        F.collect_list(F.struct("day", "q")).alias("dq"),
    )
    body = (
        "struct(round(st[0], 6) AS demand_size, "
        "round(st[1], 6) AS demand_interval_days, "
        "CASE WHEN st[1] > 0 THEN round(st[0] / st[1], 6) END AS croston_rate, "
        "st[1] > 0 AS pos)"
    )
    out = folded.select(
        "l_partkey",
        "n_demand_days",
        F.expr(bind1(_CRO_FOLD_SPARK, "st", body)).alias("o"),
    ).filter((F.col("n_demand_days") >= _CRO_MIN_DAYS) & F.col("o.pos"))
    return out.select(
        "l_partkey",
        "n_demand_days",
        F.col("o.demand_size").cast("double").alias("demand_size"),
        F.col("o.demand_interval_days").cast("double").alias("demand_interval_days"),
        F.col("o.croston_rate").cast("double").alias("croston_rate"),
    )
