"""Round 4 additions, part 20: causal readout, forensic digit audit, and
robust trimmed means.

- ``diff_in_diff_estimate`` — the 2x2 difference-in-differences estimator
  (the workhorse causal readout beside ``ab_test_cuped``): units split
  into treatment/control by the portable hash, time split pre/post at a
  fixed boundary; all four cell means from ONE conditional-aggregate scan
  (no join), each mean one IEEE division of an exact decimal sum; the DiD
  interaction is three double subtractions — deterministic.

- ``benford_first_digit_audit`` — the forensic data-quality screen: first
  significant digit of every positive value via a pure-arithmetic CASE
  ladder (NO double->string formatting, which differs across engines; NO
  log10 at runtime), observed share vs the Benford expectation
  log10(1+1/d) embedded as python-computed double literals, per-digit
  chi-square contribution.  Per-digit rows only — no cross-row double
  sum, so every output value is order-independent.

- ``winsorized_trimmed_mean`` — robust location estimates per group:
  10%-trimmed mean (drop the k lowest/highest by (value, id) rank,
  k = floor(n/10) exact integers) and winsorized mean (clamp to the
  boundary order statistics) from one partitioned rank window + a
  per-group boundary broadcast; all sums decimal-exact.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import events_tbl

# ---------------------------------------------------------------------------
# diff_in_diff_estimate
# ---------------------------------------------------------------------------

_DID_BOUNDARY = "2024-01-16 00:00:00"


def _did_cell(treated: int, post: int, engine: str) -> tuple[str, str]:
    """(n_expr, sum_expr) for one 2x2 cell as conditional aggregates."""
    h = (h60_duck if engine == "duck" else h60_spark)(
        "'trt|' || CAST(user_id AS VARCHAR)" if engine == "duck" else "'trt|' || CAST(user_id AS STRING)"
    )
    cond = (
        f"{h} % 2 = {treated} AND (ts >= TIMESTAMP '{_DID_BOUNDARY}') = {'TRUE' if post else 'FALSE'}"
    )
    n = f"COUNT(*) FILTER (WHERE {cond})" if engine == "duck" else f"COUNT(IF({cond}, 1, NULL))"
    s = (
        f"SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE {cond})"
        if engine == "duck"
        else f"SUM(IF({cond}, CAST(value AS DECIMAL(18,6)), NULL))"
    )
    return n, s


def _did_sql(engine: str) -> str:
    cells = {}
    for t in (0, 1):
        for p in (0, 1):
            n, s = _did_cell(t, p, engine)
            cells[(t, p)] = (n, s)
    sel = []
    for (t, p), (n, s) in cells.items():
        tag = f"{'t' if t else 'c'}{'_post' if p else '_pre'}"
        sel.append(f"CAST({n} AS BIGINT) AS n_{tag}")
        sel.append(f"CAST({s} AS DOUBLE) / {n} AS mean_{tag}")
    means = {
        (t, p): f"CAST({s} AS DOUBLE) / {n}" for (t, p), (n, s) in cells.items()
    }
    did = f"(({means[(1,1)]}) - ({means[(1,0)]})) - (({means[(0,1)]}) - ({means[(0,0)]}))"
    return (
        "SELECT "
        + ", ".join(sel)
        + f", {did} AS did_estimate FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL"
    )


@register(
    "diff_in_diff_estimate",
    oracle=_did_sql("duck"),
    description="2x2 difference-in-differences: hash-assigned treatment, "
    "fixed pre/post time boundary, all four cell means from ONE "
    "conditional-aggregate scan (decimal sums, one IEEE division each); "
    "the interaction estimate is three double subtractions — no join, no "
    "window",
    tags=("analytics", "causal", "experiment", "extension"),
)
def diff_in_diff_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("value").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", "ts", "value")
    )
    ev.createOrReplaceTempView("events_did")
    return spark.sql(_did_sql("spark").replace("FROM events ", "FROM events_did ").replace(
        "WHERE value IS NOT NULL AND user_id IS NOT NULL", ""
    ))


# ---------------------------------------------------------------------------
# benford_first_digit_audit
# ---------------------------------------------------------------------------

# Benford expectations as python-computed double literals — both engines
# parse the same shortest-round-trip decimal, so no runtime log10.
_BENFORD_P = {d: math.log10(1 + 1 / d) for d in range(1, 10)}

# pure-arithmetic first-digit ladder for values in (0, 1e6): scale into
# [1, 10) by dividing/multiplying by a power of ten chosen via comparisons
# (identical IEEE ops in both engines), then floor.
_DIGIT_EXPR = """
CAST(FLOOR(CASE
  WHEN value >= 100000 THEN value / 100000
  WHEN value >= 10000 THEN value / 10000
  WHEN value >= 1000 THEN value / 1000
  WHEN value >= 100 THEN value / 100
  WHEN value >= 10 THEN value / 10
  WHEN value >= 1 THEN value
  WHEN value >= 0.1 THEN value * 10
  WHEN value >= 0.01 THEN value * 100
  WHEN value >= 0.001 THEN value * 1000
  ELSE value * 10000
END) AS BIGINT)
"""


def _benford_sql() -> str:
    # CAST(... AS DOUBLE): a bare decimal literal is DECIMAL in both
    # engines (with engine-specific precision rules) — force the shared
    # IEEE type so downstream arithmetic is bit-identical.
    p_case = " ".join(
        f"WHEN {d} THEN CAST({_BENFORD_P[d]!r} AS DOUBLE)" for d in range(1, 10)
    )
    return f"""
WITH digits AS (
  SELECT {_DIGIT_EXPR} AS digit
  FROM events WHERE value IS NOT NULL AND value > 0 AND value < 1000000
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM digits WHERE digit BETWEEN 1 AND 9),
obs AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM digits WHERE digit BETWEEN 1 AND 9 GROUP BY digit
)
SELECT o.digit, o.n_obs,
       CAST(o.n_obs AS DOUBLE) / t.n AS obs_share,
       CASE o.digit {p_case} END AS benford_share,
       (CAST(o.n_obs AS DOUBLE) - t.n * (CASE o.digit {p_case} END))
       * (CAST(o.n_obs AS DOUBLE) - t.n * (CASE o.digit {p_case} END))
       / (t.n * (CASE o.digit {p_case} END)) AS chi2_term
FROM obs o CROSS JOIN tot t
"""


@register(
    "benford_first_digit_audit",
    oracle=_benford_sql(),
    description="Benford first-digit forensic audit: first significant "
    "digit via a pure-arithmetic CASE ladder (no double formatting, no "
    "runtime log10 — expectations are python-computed literals), observed "
    "vs expected share and per-digit chi-square contribution; per-digit "
    "rows only so no cross-row double accumulation",
    tags=("dq", "forensic", "analytics", "extension"),
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("value").isNotNull() & (F.col("value") > 0) & (F.col("value") < 1_000_000))
        .select(F.expr(_DIGIT_EXPR).alias("digit"))
        .filter(F.col("digit").between(1, 9))
    )
    obs = ev.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    tot = obs.agg(F.sum("n_obs").alias("n"))
    p_col = F.element_at(
        F.create_map(*[F.lit(x) for d in range(1, 10) for x in (d, _BENFORD_P[d])]),
        F.col("digit").cast("int"),
    )
    joined = obs.crossJoin(F.broadcast(tot)).withColumn("benford_share", p_col)
    dev = F.col("n_obs").cast("double") - F.col("n") * F.col("benford_share")
    return joined.select(
        "digit",
        "n_obs",
        (F.col("n_obs").cast("double") / F.col("n")).alias("obs_share"),
        "benford_share",
        (dev * dev / (F.col("n") * F.col("benford_share"))).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# winsorized_trimmed_mean
# ---------------------------------------------------------------------------

_TRIM_PCT = 10  # trim k = floor(n/10) from each tail


def _wins_oracle() -> str:
    return f"""
WITH ev AS (
  SELECT event_type, event_id, value FROM events WHERE value IS NOT NULL
),
ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM ev
),
bounds AS (
  SELECT event_type, n, n // {_TRIM_PCT} AS k,
         MIN(CASE WHEN rn = n // {_TRIM_PCT} + 1 THEN value END) AS lo,
         MIN(CASE WHEN rn = n - n // {_TRIM_PCT} THEN value END) AS hi
  FROM ranked GROUP BY event_type, n
),
agg AS (
  SELECT r.event_type, b.n, b.k,
         SUM(CASE WHEN r.rn > b.k AND r.rn <= b.n - b.k
                  THEN CAST(r.value AS DECIMAL(18,6)) END) AS trim_sum,
         SUM(CAST(LEAST(GREATEST(r.value, b.lo), b.hi) AS DECIMAL(18,6))) AS wins_sum
  FROM ranked r JOIN bounds b USING (event_type)
  GROUP BY r.event_type, b.n, b.k
)
SELECT event_type, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k_trimmed,
       CAST(trim_sum AS DOUBLE) / (n - 2 * k) AS trimmed_mean,
       CAST(wins_sum AS DOUBLE) / n AS winsorized_mean
FROM agg
"""


@register(
    "winsorized_trimmed_mean",
    oracle=_wins_oracle(),
    description=f"Robust location per group: {_TRIM_PCT}%-trimmed mean "
    "(k = floor(n/10) exact from partitioned rank) and winsorized mean "
    "(clamp to boundary order statistics); decimal-exact sums, one IEEE "
    "division each; boundary lookup is a per-group micro join",
    tags=("analytics", "robust", "window", "extension"),
)
def winsorized_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select("event_type", "event_id", "value")
    )
    wrank = W.partitionBy("event_type").orderBy("value", "event_id")
    wpart = W.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(wrank).alias("rn"),
        F.count(F.lit(1)).over(wpart).alias("n"),
    )
    k = F.expr(f"n DIV {_TRIM_PCT}")
    bounds = (
        ranked.withColumn("k", k)
        .groupBy("event_type", "n", "k")
        .agg(
            F.min(F.when(F.col("rn") == F.col("k") + 1, F.col("value"))).alias("lo"),
            F.min(F.when(F.col("rn") == F.col("n") - F.col("k"), F.col("value"))).alias("hi"),
        )
    )
    agg = (
        ranked.join(bounds.select("event_type", "k", "lo", "hi"), "event_type")
        .groupBy("event_type", "n", "k")
        .agg(
            F.sum(
                F.when(
                    (F.col("rn") > F.col("k")) & (F.col("rn") <= F.col("n") - F.col("k")),
                    F.col("value").cast("decimal(18,6)"),
                )
            ).alias("trim_sum"),
            F.sum(
                F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).cast(
                    "decimal(18,6)"
                )
            ).alias("wins_sum"),
        )
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k_trimmed"),
        (F.col("trim_sum").cast("double") / (F.col("n") - 2 * F.col("k"))).alias("trimmed_mean"),
        (F.col("wins_sum").cast("double") / F.col("n")).alias("winsorized_mean"),
    )
