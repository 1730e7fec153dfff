"""Quality-weighted importance sampling, round 3k.

``sample_quality_weighted``: the DCLM/FineWeb-style corpus downsampling
shape — documents are tiered by cheap quality signals and each tier keeps a
different deterministic fraction (high quality keeps everything, mid 1/2,
low 1/8). Membership is a pure function of the portable 60-bit hash of the
doc id, so re-runs, re-partitions and incremental ingest agree on the
sample; the emitted per-tier accounting includes the Horvitz-Thompson
estimate (n_kept x inverse probability), whose agreement with n_total is
the unbiasedness check every weighted-sampling pipeline should ship with.

Everything is integer-exact: the stopword-ratio gate is cross-multiplied
(stop_cnt * 5 >= n_tokens instead of ratio >= 0.2) so no division enters
the tier decision, and keep/drop is hash mod denominator.

Reference parity note: the reference (SURVEY.md §0) has no sampling
surface; extends the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import tbl
from .text import STOPWORDS

_EN = ", ".join(f"'{w}'" for w in STOPWORDS["en"])

# tier -> keep numerator/denominator (keep iff h % den < num)
TIERS = {"high": (1, 1), "mid": (1, 2), "low": (1, 8)}


@register(
    "sample_quality_weighted",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
      FROM documents WHERE text IS NOT NULL
    ),
    feat AS (
      SELECT doc_id, len(tk) AS n_toks,
             len(list_filter(tk, t -> t IN ({_EN}))) AS stop_cnt
      FROM toks
    ),
    tiered AS (
      SELECT doc_id,
             CASE WHEN n_toks BETWEEN 10 AND 1000 AND stop_cnt * 5 >= n_toks
                  THEN 'high'
                  WHEN n_toks BETWEEN 5 AND 2000 THEN 'mid'
                  ELSE 'low' END AS tier
      FROM feat
    ),
    decided AS (
      SELECT tier,
             CASE tier WHEN 'high' THEN 1 WHEN 'mid' THEN 2 ELSE 8 END AS den,
             {h60_duck("('qws|' || doc_id)")} %
               CASE tier WHEN 'high' THEN 1 WHEN 'mid' THEN 2 ELSE 8 END < 1
               AS keep
      FROM tiered
    )
    SELECT tier, MIN(den) AS inv_p,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (keep) AS n_kept,
           CAST(COUNT(*) FILTER (keep) * MIN(den) AS BIGINT) AS ht_estimate
    FROM decided
    GROUP BY tier
    """,
    description="Quality-tiered importance sampling (keep-all/1:2/1:8 by "
    "integer-exact quality gates, hash-deterministic membership) with the "
    "Horvitz-Thompson accounting",
    tags=("sampling", "quality", "extension"),
)
def sample_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scan, one map-side-combined aggregate; membership never shuffles.

    Scale plan: tiering and the keep decision are pure row-local
    expressions (tokenize -> counts -> cross-multiplied gate -> hash mod),
    so the only shuffle is the 3-row tier summary's final aggregate. The
    kept-document SET is recovered by re-running the same expressions as a
    filter — the summary here is the audit artifact; at 100 TB you write
    the kept set partition-by-partition with zero extra passes because
    membership is a pure function of the row.
    """
    d = tbl(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    feat = d.select(
        "doc_id",
        F.expr("filter(split(lower(text), ' '), t -> t <> '')").alias("tk"),
    ).select(
        "doc_id",
        F.size("tk").alias("n_toks"),
        F.size(F.expr(f"filter(tk, t -> t IN ({_EN}))")).alias("stop_cnt"),
    )
    tiered = feat.select(
        "doc_id",
        F.when(
            F.col("n_toks").between(10, 1000) & (F.col("stop_cnt") * 5 >= F.col("n_toks")),
            F.lit("high"),
        )
        .when(F.col("n_toks").between(5, 2000), F.lit("mid"))
        .otherwise(F.lit("low"))
        .alias("tier"),
    )
    den = (
        F.when(F.col("tier") == "high", F.lit(1))
        .when(F.col("tier") == "mid", F.lit(2))
        .otherwise(F.lit(8))
    )
    decided = tiered.select(
        "tier",
        den.alias("den"),
        (F.expr(h60_spark("concat('qws|', doc_id)")) % den < 1).alias("keep"),
    )
    return decided.groupBy("tier").agg(
        F.min("den").alias("inv_p"),
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(F.col("keep"), F.lit(1))).alias("n_kept"),
        (F.count(F.when(F.col("keep"), F.lit(1))) * F.min("den"))
        .cast("bigint")
        .alias("ht_estimate"),
    )
