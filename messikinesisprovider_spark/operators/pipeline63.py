"""Round 4 additions, part 38: stratified causal effect and rater
agreement.

- ``causal_stratified_ate`` — covariate-adjusted treatment effect by
  direct standardization (the workhorse behind observational A/B
  readouts): treatment = user signed up, outcome = lifetime purchase
  cents, confounder = click-activity stratum (0 / 1-2 / 3-5 / 6+).
  Every statistic is integer micro-units: per-stratum effect =
  (sum1*1e6) DIV n1 - (sum0*1e6) DIV n0, the overall ATE the
  stratum-size-weighted integer average — no float accumulates across
  strata, so there is no cross-engine summation-order risk (the
  diff_in_diff/CUPED family's remaining float step eliminated).  Strata
  missing a treatment arm emit NULL effects and are excluded from the
  ALL row's weights on both sides identically.

- ``cohens_kappa_langid`` — inter-rater agreement between the labeled
  lang and the stopword classifier's prediction (closing the eval loop
  langid_confusion_matrix opened): kappa = (po - pe) / (1 - pe) with
  po = agree/N and pe = sum_k row_k*col_k / N^2 becomes the exact BIGINT
  ratio (agree*N - sum_rc) / (N^2 - sum_rc) — chance-corrected accuracy
  with zero floats until the one display division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import events_tbl, tbl

# ---------------------------------------------------------------------------
# causal_stratified_ate
# ---------------------------------------------------------------------------

_STRATUM_SQL = """
CASE WHEN clicks = 0 THEN '0'
     WHEN clicks <= 2 THEN '1-2'
     WHEN clicks <= 5 THEN '3-5'
     ELSE '6+' END
"""

_ATE_ORACLE = f"""
WITH users AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS treated,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicks,
         COALESCE(SUM(CASE WHEN event_type = 'purchase' AND value IS NOT NULL
                           THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END), 0) AS cents
  FROM events WHERE user_id IS NOT NULL
  GROUP BY user_id
),
strata AS (
  SELECT {_STRATUM_SQL} AS stratum,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(treated) AS BIGINT) AS n_treated,
         CAST(SUM(1 - treated) AS BIGINT) AS n_control,
         CAST(SUM(treated * cents) AS BIGINT) AS sum1,
         CAST(SUM((1 - treated) * cents) AS BIGINT) AS sum0
  FROM users GROUP BY 1
),
effects AS (
  SELECT *,
         CASE WHEN n_treated = 0 OR n_control = 0 THEN NULL
              ELSE (sum1 * 1000000) // n_treated - (sum0 * 1000000) // n_control
         END AS effect_micro
  FROM strata
),
overall AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n,
         CAST(SUM(n_treated) AS BIGINT) AS n_treated,
         CAST(SUM(n_control) AS BIGINT) AS n_control,
         CASE WHEN SUM(CASE WHEN effect_micro IS NOT NULL THEN n END) IS NULL THEN NULL
              ELSE SUM(CASE WHEN effect_micro IS NOT NULL THEN n * effect_micro END)
                   // SUM(CASE WHEN effect_micro IS NOT NULL THEN n END)
         END AS effect_micro
  FROM effects
)
SELECT stratum, n, n_treated, n_control, effect_micro,
       CAST(effect_micro AS DOUBLE) / 1000000 / 100 AS effect_dollars
FROM effects
UNION ALL
SELECT 'ALL' AS stratum, n, n_treated, n_control, effect_micro,
       CAST(effect_micro AS DOUBLE) / 1000000 / 100 AS effect_dollars
FROM overall
"""


@register(
    "causal_stratified_ate",
    oracle=_ATE_ORACLE,
    description="Stratified (direct-standardization) treatment effect: "
    "signup -> lifetime purchase cents adjusted by click-activity "
    "strata; per-stratum effect and the size-weighted ALL row are exact "
    "integer micro-units ((sum*1e6) DIV n differences) — no float "
    "crosses strata, eliminating summation-order risk; one-armed strata "
    "emit NULL and drop from the ALL weights identically on both sides",
    tags=("analytics", "causal", "statistics", "extension"),
)
def causal_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = (
        events_tbl(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0)).alias("treated"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("clicks"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("event_type") == "purchase") & F.col("value").isNotNull(),
                        F.expr("CAST(ROUND(value * 100) AS BIGINT)"),
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("cents"),
        )
    )
    strata = users.groupBy(F.expr(_STRATUM_SQL.replace("\n", " ")).alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("treated").cast("long").alias("n_treated"),
        F.sum(1 - F.col("treated")).cast("long").alias("n_control"),
        F.sum(F.col("treated") * F.col("cents")).cast("long").alias("sum1"),
        F.sum((1 - F.col("treated")) * F.col("cents")).cast("long").alias("sum0"),
    )
    effects = strata.withColumn(
        "effect_micro",
        F.when((F.col("n_treated") == 0) | (F.col("n_control") == 0), F.lit(None)).otherwise(
            F.expr("(sum1 * 1000000) DIV n_treated - (sum0 * 1000000) DIV n_control")
        ),
    )
    per = effects.select(
        "stratum",
        "n",
        "n_treated",
        "n_control",
        "effect_micro",
        (F.col("effect_micro").cast("double") / 1000000 / 100).alias("effect_dollars"),
    )
    overall = effects.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("n_treated").cast("long").alias("n_treated"),
        F.sum("n_control").cast("long").alias("n_control"),
        F.expr(
            "CASE WHEN SUM(CASE WHEN effect_micro IS NOT NULL THEN n END) IS NULL "
            "THEN NULL ELSE SUM(CASE WHEN effect_micro IS NOT NULL THEN n * effect_micro END) "
            "DIV SUM(CASE WHEN effect_micro IS NOT NULL THEN n END) END"
        ).alias("effect_micro"),
    ).select(
        F.lit("ALL").alias("stratum"),
        "n",
        "n_treated",
        "n_control",
        "effect_micro",
        (F.col("effect_micro").cast("double") / 1000000 / 100).alias("effect_dollars"),
    )
    return per.unionByName(overall)


# ---------------------------------------------------------------------------
# cohens_kappa_langid
# ---------------------------------------------------------------------------

_KAPPA_ORACLE = """
WITH scored AS (
  SELECT COALESCE(lang, 'unk') AS labeled_lang,
         LEN(list_filter(str_split(text, ' '), x -> x IN ('the','a','of','and','is'))) AS sc_en,
         LEN(list_filter(str_split(text, ' '), x -> x IN ('der','die','das','und','ist'))) AS sc_de,
         LEN(list_filter(str_split(text, ' '), x -> x IN ('el','la','de','y','es'))) AS sc_es,
         LEN(list_filter(str_split(text, ' '), x -> x IN ('le','la','de','et','est'))) AS sc_fr
  FROM documents
),
pred AS (
  SELECT labeled_lang,
         CASE
           WHEN sc_en >= sc_de AND sc_en >= sc_es AND sc_en >= sc_fr AND sc_en > 0 THEN 'en'
           WHEN sc_de >= sc_es AND sc_de >= sc_fr AND sc_de > 0 THEN 'de'
           WHEN sc_es >= sc_fr AND sc_es > 0 THEN 'es'
           WHEN sc_fr > 0 THEN 'fr'
           ELSE 'unk'
         END AS predicted_lang
  FROM scored
),
cells AS (SELECT labeled_lang, predicted_lang, COUNT(*) AS n FROM pred GROUP BY 1, 2),
margins AS (
  SELECT COALESCE(r.k, c.k) AS k,
         COALESCE(r.rn, 0) AS row_n, COALESCE(c.cn, 0) AS col_n
  FROM (SELECT labeled_lang AS k, SUM(n) AS rn FROM cells GROUP BY 1) r
  FULL OUTER JOIN (SELECT predicted_lang AS k, SUM(n) AS cn FROM cells GROUP BY 1) c
    ON c.k = r.k
),
agg AS (
  SELECT (SELECT COALESCE(SUM(n), 0) FROM cells) AS n_total,
         (SELECT COALESCE(SUM(n), 0) FROM cells WHERE labeled_lang = predicted_lang) AS agree,
         (SELECT COALESCE(SUM(row_n * col_n), 0) FROM margins) AS sum_rc
)
SELECT CAST(n_total AS BIGINT) AS n_total,
       CAST(agree AS BIGINT) AS agree,
       CAST(sum_rc AS BIGINT) AS sum_rc,
       CAST(agree * n_total - sum_rc AS BIGINT) AS kappa_num,
       CAST(n_total * n_total - sum_rc AS BIGINT) AS kappa_den,
       CASE WHEN n_total * n_total = sum_rc THEN 0.0
            ELSE CAST(agree * n_total - sum_rc AS DOUBLE)
                 / CAST(n_total * n_total - sum_rc AS DOUBLE) END AS kappa
FROM agg
"""


@register(
    "cohens_kappa_langid",
    oracle=_KAPPA_ORACLE,
    description="Cohen's kappa between labeled lang and the stopword "
    "classifier: kappa = (agree*N - sum(row_k*col_k)) / (N^2 - sum_rc) — "
    "chance-corrected agreement as an exact BIGINT ratio, one display "
    "division; the rater-agreement companion to langid_confusion_matrix",
    tags=("text", "evaluation", "statistics", "extension"),
)
def cohens_kappa_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import text_lang_id

    pred = text_lang_id(spark, sf_dir).select(
        F.coalesce(F.col("labeled_lang"), F.lit("unk")).alias("labeled_lang"),
        "predicted_lang",
    )
    cells = pred.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    rows = cells.groupBy(F.col("labeled_lang").alias("k")).agg(F.sum("n").alias("row_n"))
    cols = cells.groupBy(F.col("predicted_lang").alias("k")).agg(F.sum("n").alias("col_n"))
    margins = rows.join(cols, "k", "full").select(
        F.coalesce(F.col("row_n"), F.lit(0)).alias("row_n"),
        F.coalesce(F.col("col_n"), F.lit(0)).alias("col_n"),
    )
    totals = cells.agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("n_total"),
        F.coalesce(
            F.sum(
                F.when(F.col("labeled_lang") == F.col("predicted_lang"), F.col("n")).otherwise(0)
            ),
            F.lit(0),
        ).alias("agree"),
    )
    sum_rc = margins.agg(
        F.coalesce(F.sum(F.col("row_n") * F.col("col_n")), F.lit(0)).alias("sum_rc")
    )
    return totals.crossJoin(F.broadcast(sum_rc)).select(
        F.col("n_total").cast("long").alias("n_total"),
        F.col("agree").cast("long").alias("agree"),
        F.col("sum_rc").cast("long").alias("sum_rc"),
        (F.col("agree") * F.col("n_total") - F.col("sum_rc")).cast("long").alias("kappa_num"),
        (F.col("n_total") * F.col("n_total") - F.col("sum_rc")).cast("long").alias("kappa_den"),
        F.when(F.col("n_total") * F.col("n_total") == F.col("sum_rc"), F.lit(0.0))
        .otherwise(
            (F.col("agree") * F.col("n_total") - F.col("sum_rc")).cast("double")
            / (F.col("n_total") * F.col("n_total") - F.col("sum_rc")).cast("double")
        )
        .alias("kappa"),
    )
