"""Round 4 additions, part 25: exact two-sample KS statistic and a
hash-deterministic bootstrap.

- ``ks_test_drift_exact`` — the two-sample Kolmogorov-Smirnov statistic
  (the standard continuous-distribution drift detector beside the binned
  ``drift_chisquare_bins``), computed EXACTLY: per distinct value the
  group counts reduce map-side, the global cumulative counts come from
  the repo's two-pass range-partitioned ranking (no single-partition
  window), and D's argmax is found on the INTEGER cross-product form
  |cum1*n2 - cum2*n1| — no per-row division, so ties and the maximum are
  exact; one final IEEE division converts to D.  Output is one row:
  (D, its location, the integer numerator, group sizes).

- ``bootstrap_mean_ci_hash`` — the scalable bootstrap: 32 deterministic
  resamples via hash multiplicities (0/1/2 with P = 1/4, 1/2, 1/4 — mean
  1, variance 1/2, the Poisson(1)-style resample weight), each resample
  mean an exact integer-cents ratio.  The whole thing is one literal
  explode + one groupBy — map-side partials, no data movement beyond 32
  keys; the CI is read off the order statistics of the 32 means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import h60_duck, h60_spark
from .ranking import global_row_number
from .relational import events_tbl, spread

# ---------------------------------------------------------------------------
# ks_test_drift_exact
# ---------------------------------------------------------------------------

_KS_ORACLE = """
WITH ev AS (
  SELECT value,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g
  FROM events WHERE value IS NOT NULL
),
pervalue AS (
  SELECT value,
         CAST(SUM(g) AS BIGINT) AS c1,
         CAST(SUM(1 - g) AS BIGINT) AS c2
  FROM ev GROUP BY value
),
cum AS (
  SELECT value,
         SUM(c1) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
         SUM(c2) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
  FROM pervalue
),
tot AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM pervalue),
scored AS (
  SELECT c.value, c.cum1, c.cum2, t.n1, t.n2,
         ABS(c.cum1 * t.n2 - c.cum2 * t.n1) AS d_num
  FROM cum c CROSS JOIN tot t
)
SELECT CAST(d_num AS BIGINT) AS d_num,
       CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       value AS at_value,
       CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS ks_d
FROM scored
ORDER BY d_num DESC, value
LIMIT 1
"""


@register(
    "ks_test_drift_exact",
    oracle=_KS_ORACLE,
    description="Two-sample Kolmogorov-Smirnov drift statistic, exact: "
    "per-value group counts map-side, global cumulative counts via the "
    "two-pass range-partitioned ranking (no single-partition window), "
    "argmax on the INTEGER form |cum1*n2 - cum2*n1| (exact ties), one "
    "final IEEE division; single-row output",
    tags=("analytics", "drift", "statistics", "extension"),
)
def ks_test_drift_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select(
            "value",
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("g"),
        )
    )
    pervalue = ev.groupBy("value").agg(
        F.sum("g").cast("long").alias("c1"),
        F.sum(1 - F.col("g")).cast("long").alias("c2"),
    )
    cum, _n = global_row_number(
        pervalue,
        order_by=["value"],
        rn_col="_rn",
        running_sums={"c1": "cum1", "c2": "cum2"},
    )
    tot = pervalue.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    scored = cum.crossJoin(F.broadcast(tot)).select(
        "value",
        "n1",
        "n2",
        F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")).alias("d_num"),
    )
    return (
        scored.orderBy(F.col("d_num").desc(), F.col("value"))
        .limit(1)
        .select(
            F.col("d_num").cast("long").alias("d_num"),
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            F.col("value").alias("at_value"),
            (
                F.col("d_num").cast("double")
                / (F.col("n1").cast("double") * F.col("n2").cast("double"))
            ).alias("ks_d"),
        )
    )


# ---------------------------------------------------------------------------
# bootstrap_mean_ci_hash
# ---------------------------------------------------------------------------

_BOOT_B = 32


def _boot_oracle() -> str:
    h = h60_duck("'bs|' || CAST(event_id AS VARCHAR) || '|' || CAST(b.b AS VARCHAR)")
    return f"""
WITH ev AS (
  SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
),
weighted AS (
  SELECT b.b,
         CASE ({h}) % 4 WHEN 0 THEN 0 WHEN 3 THEN 2 ELSE 1 END AS m,
         cents
  FROM ev CROSS JOIN (SELECT UNNEST(range(0, {_BOOT_B})) AS b) b
)
SELECT CAST(b AS BIGINT) AS resample,
       CAST(SUM(m) AS BIGINT) AS n_eff,
       CAST(SUM(m * cents) AS DOUBLE) / CAST(SUM(m) AS DOUBLE) / 100 AS mean_value
FROM weighted
GROUP BY b
HAVING SUM(m) > 0
"""


@register(
    "bootstrap_mean_ci_hash",
    oracle=_boot_oracle(),
    description=f"Deterministic bootstrap: {_BOOT_B} resamples via hash "
    "multiplicities 0/1/2 (P=1/4,1/2,1/4 — Poisson(1)-style weights, no "
    "RNG state), each resample mean an exact integer-cents ratio; one "
    "literal explode + one map-side-combined groupBy over 32 keys; the "
    "CI reads off the order statistics of the resample means",
    tags=("analytics", "statistics", "sampling", "extension"),
)
def bootstrap_mean_ci_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = h60_spark("'bs|' || CAST(event_id AS STRING) || '|' || CAST(b AS STRING)")
    # spread(): 32 md5 evaluations per event are CPU-bound map work, and the
    # single-file test table scans as ONE partition — without the round-robin
    # the whole resample explode runs on one core (gated: skipped at real split counts).
    ev = (
        spread(events_tbl(spark, sf_dir))
        .filter(F.col("value").isNotNull())
        .select("event_id", F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"))
    )
    weighted = ev.select(
        "cents",
        "event_id",
        F.explode(F.array(*[F.lit(b) for b in range(_BOOT_B)])).alias("b"),
    ).select(
        "b",
        "cents",
        F.expr(f"CASE ({h}) % 4 WHEN 0 THEN 0 WHEN 3 THEN 2 ELSE 1 END").alias("m"),
    )
    return (
        weighted.groupBy("b")
        .agg(
            F.sum("m").cast("long").alias("n_eff"),
            (
                F.sum(F.col("m") * F.col("cents")).cast("double")
                / F.sum("m").cast("double")
                / F.lit(100)
            ).alias("mean_value"),
        )
        .filter(F.col("n_eff") > 0)
        .select(F.col("b").cast("long").alias("resample"), "n_eff", "mean_value")
    )
