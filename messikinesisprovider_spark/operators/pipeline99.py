"""Round 8 additions, part 9: game-theoretic attribution and sequential /
ratio-metric experimentation.

``attribution_shapley_exact`` — exact Shapley-value channel attribution
(Shapley 1953; applied to conversion paths per Zhao et al.,
arXiv:1804.05327): the characteristic function v(S) counts conversions
achievable by users whose touched channel set is contained in S, and
each channel's credit is the exact Shapley average of its marginal
contributions over all 2^k coalitions. The channel universe here is the
k=4 non-conversion event types, so the subset lattice is 16 rows —
enumerated EXACTLY (no sampling), with credits kept as integers
scaled by k! = 24. The cooperative-game sibling of the heuristic
``attribution_linear`` / ``attribution_position_based`` /
``attribution_time_decay`` family.

``ab_sprt_sequential`` — Wald's sequential probability ratio test (Wald
1945) on per-purchase conversion, users hash-split into two arms: the
cumulative log-likelihood ratio for H1: p=0.25 vs H0: p=0.15 over the
daily series, with the (alpha=beta=0.05) decision boundaries ±ln(19).
Cumulative trial/success counts stay INTEGER (exact running sums); the
LLR is one double expression per row off those integers, so no float
accumulation order exists to diverge.

``ab_ratio_delta_method`` — variance of a RATIO metric (revenue per
event) by the delta method over per-user unit aggregates (Deng,
Knoblich & Lu, KDD 2018): Var(X̄/Ȳ) ≈ (σx² − 2R·σxy + R²·σy²) / (n·ȳ²).
Per-user and per-arm moments are exact decimal sums; the final formula
is one identical double expression in both engines. The ratio-metric
complement to ``ab_test_cuped`` (variance reduction) and
``welch_t_test`` (mean metrics).

Reference parity note: the reference engine (SURVEY.md §0) has no
analytics surface; these extend the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import events_tbl

# ---------------------------------------------------------------------------
# attribution_shapley_exact
# ---------------------------------------------------------------------------

_SH_CHANNELS = (("click", 1), ("view", 2), ("error", 4), ("signup", 8))
_SH_K = len(_SH_CHANNELS)
_SH_FULL = (1 << _SH_K) - 1
# Shapley coalition weight numerators |S|!(k-1-|S|)! for k=4 (denominator 4!)
_SH_W = {0: 6, 1: 2, 2: 2, 3: 6}
_SH_KFACT = 24

_SH_MASK_SQL = "CASE event_type " + " ".join(
    f"WHEN '{name}' THEN {bit}" for name, bit in _SH_CHANNELS
) + " ELSE 0 END"

def _sh_w_sql(col: str) -> str:
    return (
        f"CASE bit_count({col}) "
        + " ".join(f"WHEN {c} THEN {w}" for c, w in _SH_W.items())
        + " END"
    )

_SH_ORACLE = f"""
WITH users AS (
  SELECT user_id,
         CAST(bit_or({_SH_MASK_SQL}) AS BIGINT) AS mask,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events WHERE user_id IS NOT NULL
  GROUP BY 1
),
cover AS (
  SELECT t.s AS s, CAST(SUM(conv) AS BIGINT) AS v
  FROM users
  CROSS JOIN UNNEST(range(0, {_SH_FULL + 1})) AS t(s)
  WHERE (t.s & mask) = mask
  GROUP BY 1
),
v AS (
  SELECT s.s, COALESCE(cover.v, 0) AS v
  FROM UNNEST(range(0, {_SH_FULL + 1})) AS s(s)
  LEFT JOIN cover ON cover.s = s.s
),
pairs AS (
  SELECT c.name, c.bit, t.s AS s
  FROM (VALUES {", ".join(f"('{n}', {b})" for n, b in _SH_CHANNELS)}) c(name, bit)
  CROSS JOIN UNNEST(range(0, {_SH_FULL + 1})) AS t(s)
  WHERE (t.s & c.bit) = 0
)
SELECT p.name AS channel,
       CAST(SUM(({_sh_w_sql("p.s")}) * (vy.v - vn.v)) AS BIGINT) AS phi_x24,
       CAST(ROUND(SUM(({_sh_w_sql("p.s")}) * (vy.v - vn.v)) / 24.0, 6) AS DOUBLE) AS phi
FROM pairs p
JOIN v vn ON vn.s = p.s
JOIN v vy ON vy.s = (p.s | p.bit)
GROUP BY 1
"""


@register(
    "attribution_shapley_exact",
    oracle=_SH_ORACLE,
    description="Exact Shapley-value conversion attribution (Shapley 1953; "
    "Zhao et al. arXiv:1804.05327) over the k=4 non-purchase channels: "
    "v(S) = conversions by users whose touched channel set is within S, "
    "full 2^k coalition enumeration, credits exact as phi*k! integers — "
    "the cooperative-game sibling of the attribution_* heuristics",
    tags=("attribution", "game-theory", "extension"),
)
def attribution_shapley_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One groupBy collapses the corpus to (user, mask, conv); everything
    after runs on the 16-row subset lattice. The superset fan-out (<= 16
    rows per USER AGGREGATE, never per event) replaces the theta-join
    (mask & s) = mask with plain equi-joins, so no BNLJ appears at any
    scale."""
    e = events_tbl(spark, sf_dir).filter(F.col("user_id").isNotNull())
    users = e.groupBy("user_id").agg(
        F.expr(f"CAST(bit_or({_SH_MASK_SQL}) AS BIGINT)").alias("mask"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    cover = (
        users.select(
            F.explode(
                F.expr(
                    f"filter(sequence(0, {_SH_FULL}), s -> (s & mask) = mask)"
                )
            ).alias("s"),
            "conv",
        )
        .groupBy("s")
        .agg(F.sum("conv").cast("long").alias("v"))
    )
    subsets = spark.range(_SH_FULL + 1).select(F.col("id").alias("s"))
    v = subsets.join(cover, "s", "left").select(
        "s", F.coalesce("v", F.lit(0)).alias("v")
    )
    channels = spark.createDataFrame(list(_SH_CHANNELS), ["name", "bit"])
    pairs = channels.select(
        "name",
        "bit",
        F.explode(
            F.expr(f"filter(sequence(0, {_SH_FULL}), s -> (s & bit) = 0)")
        ).alias("s"),
    )
    vn = v.select(F.col("s").alias("s_no"), F.col("v").alias("v_no"))
    vy = v.select(F.col("s").alias("s_yes"), F.col("v").alias("v_yes"))
    scored = (
        pairs.join(vn, pairs.s == vn.s_no)
        .join(vy, (pairs.s.bitwiseOR(pairs.bit)) == vy.s_yes)
        .select(
            "name",
            (
                F.expr(_sh_w_sql("s")) * (F.col("v_yes") - F.col("v_no"))
            ).alias("term"),
        )
    )
    return scored.groupBy(F.col("name").alias("channel")).agg(
        F.sum("term").cast("long").alias("phi_x24"),
        F.round(F.sum("term") / F.lit(float(_SH_KFACT)), 6)
        .cast("double")
        .alias("phi"),
    )


# ---------------------------------------------------------------------------
# ab_sprt_sequential
# ---------------------------------------------------------------------------

# CAST to DOUBLE before dividing: Spark parses bare 0.25/0.15 as DECIMAL
# literals and the decimal division ROUNDS (ln(1.666667) != ln(5/3)) —
# DuckDB's decimal division returns DOUBLE, so only Spark would drift
_SPRT_P0 = "CAST(0.15 AS DOUBLE)"
_SPRT_P1 = "CAST(0.25 AS DOUBLE)"
# ln(p1/p0), ln((1-p1)/(1-p0)), boundaries at alpha = beta = 0.05
_SPRT_LR1 = f"ln({_SPRT_P1} / {_SPRT_P0})"
_SPRT_LR0 = f"ln((1.0 - {_SPRT_P1}) / (1.0 - {_SPRT_P0}))"
_SPRT_BOUND = "ln(19.0)"

_SPRT_ARM = "CASE WHEN ({h}) % 2 = 0 THEN 'A' ELSE 'B' END"


def _sprt_oracle() -> str:
    h = h60_duck("'arm|' || CAST(user_id AS VARCHAR)")
    return f"""
WITH ev AS (
  SELECT {_SPRT_ARM.format(h=h)} AS arm, CAST(ts AS DATE) AS day,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
daily AS (
  SELECT arm, day, CAST(COUNT(*) AS BIGINT) AS trials,
         CAST(SUM(conv) AS BIGINT) AS conv
  FROM ev GROUP BY 1, 2
),
cum AS (
  SELECT arm, day,
         CAST(SUM(trials) OVER (PARTITION BY arm ORDER BY day) AS BIGINT) AS cum_trials,
         CAST(SUM(conv) OVER (PARTITION BY arm ORDER BY day) AS BIGINT) AS cum_conv
  FROM daily
)
SELECT arm, CAST(day AS TIMESTAMP) AS day, cum_trials, cum_conv,
       CAST(ROUND(cum_conv * {_SPRT_LR1}
                  + (cum_trials - cum_conv) * {_SPRT_LR0}, 6) AS DOUBLE) AS llr,
       CASE
         WHEN cum_conv * {_SPRT_LR1} + (cum_trials - cum_conv) * {_SPRT_LR0}
              >= {_SPRT_BOUND} THEN 'accept_h1'
         WHEN cum_conv * {_SPRT_LR1} + (cum_trials - cum_conv) * {_SPRT_LR0}
              <= -{_SPRT_BOUND} THEN 'accept_h0'
         ELSE 'continue' END AS decision
FROM cum
"""


@register(
    "ab_sprt_sequential",
    oracle=_sprt_oracle(),
    description="Wald sequential probability ratio test (Wald 1945) on "
    "purchase conversion, users hash-split into arms A/B: daily cumulative "
    "integer trial/success counts, LLR for p1=0.25 vs p0=0.15 as one "
    "double expression per row, ±ln(19) decision boundaries at "
    "alpha=beta=0.05 — the sequential-testing complement of ab_test_cuped",
    tags=("experimentation", "statistics", "extension"),
)
def ab_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running counts are INTEGER window sums (exact under any partial
    aggregation order); the float LLR is derived per row from those
    integers, so the sequential statistic carries no float accumulation
    at all. Output is bounded by arms x calendar days."""
    h = h60_spark("'arm|' || CAST(user_id AS STRING)")
    e = events_tbl(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    daily = (
        e.select(
            F.expr(_SPRT_ARM.format(h=h)).alias("arm"),
            F.col("ts").cast("date").alias("day"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("conv"),
        )
        .groupBy("arm", "day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("trials"),
            F.sum("conv").cast("long").alias("conv"),
        )
    )
    w = Window.partitionBy("arm").orderBy("day")
    cum = daily.select(
        "arm",
        "day",
        F.sum("trials").over(w).cast("long").alias("cum_trials"),
        F.sum("conv").over(w).cast("long").alias("cum_conv"),
    )
    llr = F.col("cum_conv") * F.expr(_SPRT_LR1) + (
        F.col("cum_trials") - F.col("cum_conv")
    ) * F.expr(_SPRT_LR0)
    bound = F.expr(_SPRT_BOUND)
    return cum.select(
        "arm",
        F.col("day").cast("timestamp").alias("day"),
        "cum_trials",
        "cum_conv",
        F.round(llr, 6).cast("double").alias("llr"),
        F.when(llr >= bound, F.lit("accept_h1"))
        .when(llr <= -bound, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    )


# ---------------------------------------------------------------------------
# ab_ratio_delta_method
# ---------------------------------------------------------------------------


def _delta_oracle() -> str:
    h = h60_duck("'arm|' || CAST(user_id AS VARCHAR)")
    return f"""
WITH per_user AS (
  SELECT user_id,
         COALESCE(SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(ROUND(value * 100) AS BIGINT) END), 0) AS xc,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events WHERE user_id IS NOT NULL
  GROUP BY user_id
),
m AS (
  SELECT {_SPRT_ARM.format(h=h)} AS arm, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(xc AS DECIMAL(38,0))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(xc AS DECIMAL(19,0)) * xc) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y AS DECIMAL(19,0)) * y) AS DOUBLE) AS syy,
         CAST(SUM(CAST(xc AS DECIMAL(19,0)) * y) AS DOUBLE) AS sxy
  FROM per_user GROUP BY 1
  HAVING COUNT(*) >= 2
)
SELECT arm, n AS n_users,
       CAST(ROUND(sx / sy / 100.0, 6) AS DOUBLE) AS ratio,
       CAST(ROUND(sqrt(
         ((sxx - sx * sx / n) / (n - 1)
          - 2.0 * (sx / sy) * ((sxy - sx * sy / n) / (n - 1))
          + (sx / sy) * (sx / sy) * ((syy - sy * sy / n) / (n - 1)))
         / (n * (sy / n) * (sy / n))) / 100.0, 6) AS DOUBLE) AS se_delta
FROM m
"""


@register(
    "ab_ratio_delta_method",
    oracle=_delta_oracle(),
    description="Delta-method standard error of a ratio metric (revenue "
    "per event) over per-user unit aggregates, users hash-split into "
    "arms (Deng, Knoblich & Lu, KDD 2018): exact decimal moments, one "
    "identical double formula both engines — the ratio-metric complement "
    "of ab_test_cuped and welch_t_test",
    tags=("experimentation", "statistics", "extension"),
)
def ab_ratio_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two shuffles total (user aggregate, arm moments), both pure
    Catalyst; the moments are decimal-exact so arm-level doubles are
    order-independent at any partition count."""
    h = h60_spark("'arm|' || CAST(user_id AS STRING)")
    e = events_tbl(spark, sf_dir).filter(F.col("user_id").isNotNull())
    # integer-scaled moments (the welch_t_test convention): value is a
    # 2-decimal quantity, so cents are exact BIGINTs and every moment is
    # integer/decimal arithmetic until the closed-form formula
    per_user = e.groupBy("user_id").agg(
        F.expr(
            "COALESCE(SUM(CASE WHEN event_type = 'purchase' "
            "THEN CAST(ROUND(value * 100) AS BIGINT) END), 0)"
        ).alias("xc"),
        F.count(F.lit(1)).cast("long").alias("y"),
    )
    m = per_user.groupBy(
        F.expr(_SPRT_ARM.format(h=h)).alias("arm")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("CAST(SUM(CAST(xc AS DECIMAL(38,0))) AS DOUBLE)").alias("sx"),
        F.expr("CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE)").alias("sy"),
        F.expr("CAST(SUM(CAST(xc AS DECIMAL(19,0)) * xc) AS DOUBLE)").alias("sxx"),
        F.expr("CAST(SUM(CAST(y AS DECIMAL(19,0)) * y) AS DOUBLE)").alias("syy"),
        F.expr("CAST(SUM(CAST(xc AS DECIMAL(19,0)) * y) AS DOUBLE)").alias("sxy"),
    ).filter(F.col("n") >= 2)
    r = F.col("sx") / F.col("sy")
    var_x = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (
        F.col("n") - 1
    )
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / (
        F.col("n") - 1
    )
    var_y = (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")) / (
        F.col("n") - 1
    )
    mean_y = F.col("sy") / F.col("n")
    se = F.sqrt(
        (var_x - F.lit(2.0) * r * cov + r * r * var_y)
        / (F.col("n") * mean_y * mean_y)
    )
    return m.select(
        "arm",
        F.col("n").alias("n_users"),
        F.round(r / F.lit(100.0), 6).cast("double").alias("ratio"),
        F.round(se / F.lit(100.0), 6).cast("double").alias("se_delta"),
    )
