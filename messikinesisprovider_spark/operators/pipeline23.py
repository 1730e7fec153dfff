"""Rolling robust statistics + classifier evaluation, round 3 (appended).

``rolling_median_k``: per-user rolling EXACT median of the last
``ROLL_K`` event values — the robust-center baseline behind online
outlier scoring (the windowed twin of ``anomaly_mad_flags``'s global
medians). The frame's values are collected per row (bounded: at most
ROLL_K elements live per output row), sorted in-plan, and the DISCRETE
lower median is selected by index — interpolation-free, so the value is
an element of the input and bit-portable. One shuffle on user_id; the
collect+sort runs inside the window frame, never globally.

``langid_confusion_matrix``: the evaluation closing the loop on
``text_lang_id``: predicted vs declared language as a confusion matrix
with per-cell counts, per-truth-row totals and per-mille recall — plus
the overall accuracy riding on every row. One aggregate over the scored
documents; |langs|² output rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .relational import events_tbl
from .text import text_lang_id

ROLL_K = 5  # rolling window width (rows)

_ROLL_ORACLE = f"""
WITH ev AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
),
framed AS (
  SELECT event_id, user_id, ts, value,
         list_sort(list(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN {ROLL_K - 1} PRECEDING AND CURRENT ROW)) AS vals
  FROM ev
)
SELECT event_id, user_id, ts, value,
       CAST(LEN(vals) AS BIGINT) AS n_in_frame,
       vals[(LEN(vals) + 1) // 2] AS rolling_median
FROM framed
"""


@register(
    "rolling_median_k",
    oracle=_ROLL_ORACLE,
    description=f"Per-user rolling exact discrete median over the last {ROLL_K} "
    "values (collect+sort inside the window frame; interpolation-free)",
    tags=("timeseries", "robust", "window", "extension"),
)
def rolling_median_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling lower median by index selection (see module doc)."""
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(ROLL_K - 1), W.currentRow)
    )
    ev = (
        events_tbl(spark, sf_dir)
        .where(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("value").isNotNull()
        )
        .select("event_id", "user_id", "ts", "value")
    )
    framed = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.sort_array(F.collect_list("value").over(w)).alias("vals"),
    )
    return framed.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.size("vals").cast("long").alias("n_in_frame"),
        F.expr("vals[(size(vals) + 1) div 2 - 1]").alias("rolling_median"),
    )


_LANGID_CONF_ORACLE = """
WITH scored AS (
  SELECT doc_id, COALESCE(lang, 'unk') AS labeled_lang,
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
cells AS (
  SELECT labeled_lang, predicted_lang, COUNT(*) AS n
  FROM pred GROUP BY 1, 2
),
overall AS (
  SELECT SUM(CASE WHEN labeled_lang = predicted_lang THEN n ELSE 0 END) AS n_correct,
         SUM(n) AS n_total
  FROM cells
),
tot AS (
  SELECT labeled_lang, predicted_lang, n,
         SUM(n) OVER (PARTITION BY labeled_lang) AS n_labeled,
         n_correct, n_total
  FROM cells CROSS JOIN overall
)
SELECT labeled_lang, predicted_lang, CAST(n AS BIGINT) AS n,
       CAST(n_labeled AS BIGINT) AS n_labeled,
       CAST((1000 * n) // n_labeled AS BIGINT) AS recall_pm,
       CAST((1000 * n_correct) // n_total AS BIGINT) AS accuracy_pm
FROM tot
"""


@register(
    "langid_confusion_matrix",
    oracle=_LANGID_CONF_ORACLE,
    description="Confusion matrix of the lang-id heuristic vs the declared "
    "language: per-cell counts, per-truth recall, overall accuracy (pm)",
    tags=("text", "langid", "eval", "extension"),
)
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier eval over text_lang_id's own scoring (one aggregate;
    totals via windows over the |langs|² micro-table — NULL declared
    langs coalesce to 'unk' so the edge fixtures stay real rows)."""
    pred = (
        text_lang_id(spark, sf_dir)
        .withColumn("labeled_lang", F.coalesce(F.col("labeled_lang"), F.lit("unk")))
        .select("labeled_lang", "predicted_lang")
    )
    cells = pred.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    wl = W.partitionBy("labeled_lang")
    overall = cells.agg(
        F.sum(
            F.when(F.col("labeled_lang") == F.col("predicted_lang"), F.col("n")).otherwise(0)
        ).alias("n_correct"),
        F.sum("n").alias("n_total"),
    )
    tot = cells.crossJoin(F.broadcast(overall)).select(
        "labeled_lang",
        "predicted_lang",
        "n",
        F.sum("n").over(wl).alias("n_labeled"),
        "n_correct",
        "n_total",
    )
    return tot.select(
        "labeled_lang",
        "predicted_lang",
        F.col("n").cast("long").alias("n"),
        F.col("n_labeled").cast("long").alias("n_labeled"),
        F.expr("CAST((1000 * n) div n_labeled AS BIGINT)").alias("recall_pm"),
        F.expr("CAST((1000 * n_correct) div n_total AS BIGINT)").alias("accuracy_pm"),
    )
