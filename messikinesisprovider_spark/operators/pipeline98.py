"""Round 8 additions, part 8: survival curve, robust slope, trend test.

``survival_kaplan_meier`` — the Kaplan-Meier product-limit estimator
(Kaplan & Meier, JASA 1958) over order fulfilment: subject = order,
duration = days from order date to first shipment, event = the order
reached final status ('F'), censored otherwise, stratified by order
priority. This is the estimator a pipeline team runs on "time until a
document clears review" or "time until a shard finishes packing" — the
survival twin of ``survival_hazard_bins``'s binned hazard (that op bins;
this one is the exact step curve at every event time).

``robust_theil_sen_slope`` — the Theil-Sen estimator (Theil 1950, Sen
1968): the median over pairwise slopes, 29.3%-breakdown-robust where
``ols_per_group`` shatters on one outlier. Exact pairwise enumeration is
O(n^2), so the 100 TB shape is the standard sampled variant: a
deterministic h60-ranked sample of 64 points per group bounds the pair
count at C(64,2)=2016 per group regardless of corpus size.

``mann_kendall_trend`` — the Mann-Kendall monotonic-trend test (Mann
1945; Kendall 1975) with the tie-corrected normal approximation, per
event type over the daily count series. Shares Kendall's S statistic
with ``kendall_tau_exact`` (which reports tau as a CORRELATION between
two paired metrics); this op is the hypothesis TEST against time — S,
the tie-corrected Var(S) (kept exact as var_s_x18 = 18*Var), the
continuity-corrected z, and the 5% trend verdict. Everything up to the
final z is integer arithmetic.

Reference parity note: the reference engine (SURVEY.md §0) has no
analytics surface; these extend the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import events_tbl, tbl

# ---------------------------------------------------------------------------
# survival_kaplan_meier
# ---------------------------------------------------------------------------

_KM_ORACLE = """
WITH base AS (
  SELECT o.o_orderkey,
         ANY_VALUE(o.o_orderpriority) AS priority,
         date_diff('day', ANY_VALUE(o.o_orderdate), MIN(l.l_shipdate)) AS dur_days,
         CASE WHEN ANY_VALUE(o.o_orderstatus) = 'F' THEN 1 ELSE 0 END AS obs
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey
),
g AS (
  SELECT priority, dur_days,
         CAST(SUM(obs) AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM base GROUP BY 1, 2
),
r AS (
  SELECT priority, dur_days, d,
         CAST(SUM(c) OVER (PARTITION BY priority ORDER BY dur_days DESC) AS BIGINT) AS n_risk
  FROM g
),
ev AS (
  SELECT priority, dur_days, d, n_risk,
         1.0 - d / CAST(n_risk AS DOUBLE) AS f
  FROM r WHERE d >= 1
),
packed AS (
  SELECT priority,
         list(struct_pack(dur_days := dur_days, d := d, n_risk := n_risk, f := f)
              ORDER BY dur_days) AS arr
  FROM ev GROUP BY 1
)
SELECT priority, u.dur_days AS dur_days, u.d AS d_events, u.n_risk AS n_risk,
       CAST(ROUND(u.surv, 6) AS DOUBLE) AS survival
FROM packed,
     UNNEST(list_transform(arr, (x, i) -> struct_pack(
       dur_days := x.dur_days, d := x.d, n_risk := x.n_risk,
       surv := list_aggregate(list_transform(arr[1:i], z -> z.f), 'product')
     ))) AS t(u)
"""


@register(
    "survival_kaplan_meier",
    oracle=_KM_ORACLE,
    description="Kaplan-Meier product-limit survival curve (Kaplan & Meier "
    "1958) of order->first-shipment duration, event = final status, "
    "censored otherwise, stratified by order priority: per event time "
    "the at-risk count, event count and S(t) as the rank-ordered "
    "sequential product of (1 - d/n) factors — identical fold order in "
    "both engines",
    tags=("statistics", "survival", "extension"),
)
def survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scans reduce to a (priority, duration-day) table bounded by
    strata x calendar span, never by order count; the per-stratum fold is
    over that bounded array. The survival product is a sequential
    ascending-time fold — the one float reduction whose order both
    engines pin identically."""
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    # Aggregate lineitem to one MIN(l_shipdate) row per order BEFORE the
    # join (guide §2.3 "aggregate before you shuffle"): the old shape joined
    # every lineitem row to its order and only then grouped by o_orderkey,
    # shuffling the full fact table with order columns attached. All other
    # aggregated columns were order-side constants (any_value/max of a
    # per-order value), so the rewrite is exact.
    minship = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("_ms"))
    base = o.join(minship, o.o_orderkey == minship.l_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.col("_ms"), F.col("o_orderdate")).cast("long").alias("dur_days"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("obs"),
    )
    g = base.groupBy("priority", "dur_days").agg(
        F.sum("obs").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    w = Window.partitionBy("priority").orderBy(F.desc("dur_days"))
    ev = (
        g.withColumn("n_risk", F.sum("c").over(w).cast("long"))
        .filter(F.col("d") >= 1)
        .withColumn("f", F.lit(1.0) - F.col("d") / F.col("n_risk").cast("double"))
    )
    packed = ev.groupBy("priority").agg(
        F.array_sort(
            F.collect_list(F.struct("dur_days", "d", "n_risk", "f"))
        ).alias("arr")
    )
    return packed.select(
        "priority",
        F.expr(
            "inline(transform(arr, (x, i) -> struct("
            "  x.dur_days AS dur_days, x.d AS d_events, x.n_risk AS n_risk,"
            "  CAST(ROUND(aggregate(slice(arr, 1, i + 1), CAST(1.0 AS DOUBLE),"
            "                       (a, s) -> a * s.f), 6) AS DOUBLE) AS survival"
            ")))"
        ),
    )


# ---------------------------------------------------------------------------
# robust_theil_sen_slope
# ---------------------------------------------------------------------------

_TS_K = 64  # deterministic per-group sample size -> <= C(64,2) = 2016 pairs

_TS_ORACLE = f"""
WITH ev AS (
  SELECT event_id, event_type,
         epoch_us(ts) / 86400000000.0 AS x, value AS y
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY {h60_duck("'ts|' || CAST(event_id AS VARCHAR)")}, event_id
         ) AS rn
  FROM ev
),
s AS (SELECT * FROM ranked WHERE rn <= {_TS_K}),
pairs AS (
  SELECT a.event_type,
         (b.y - a.y) / (b.x - a.x) AS slope,
         a.event_id AS aid, b.event_id AS bid
  FROM s a JOIN s b
    ON b.event_type = a.event_type AND b.rn > a.rn AND b.x <> a.x
),
med AS (
  SELECT event_type, slope,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope, aid, bid) AS mrn,
         COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
  FROM pairs
),
pts AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_points FROM s GROUP BY 1)
SELECT m.event_type, p.n_points, CAST(m.n_pairs AS BIGINT) AS n_pairs,
       CAST(ROUND(m.slope, 6) AS DOUBLE) AS ts_slope
FROM med m JOIN pts p ON p.event_type = m.event_type
WHERE m.mrn = (m.n_pairs + 1) // 2
"""


@register(
    "robust_theil_sen_slope",
    oracle=_TS_ORACLE,
    description=f"Theil-Sen robust slope (Theil 1950, Sen 1968) of value "
    f"over time per event type: deterministic h60-ranked sample of "
    f"{_TS_K} points per group, exact lower-median over the <= 2016 "
    "pairwise slopes — the 29%-breakdown robust alternative to "
    "ols_per_group, pair count bounded per group regardless of scale",
    tags=("statistics", "robust", "timeseries", "extension"),
)
def robust_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The h60 rank bounds every group to 64 points BEFORE the pair join
    (one window over the filtered scan), so the quadratic stage is a
    constant 2016 pairs per group at any corpus size — the standard
    sampled Theil-Sen, deterministic instead of random."""
    e = events_tbl(spark, sf_dir).filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
    )
    ev = e.select(
        "event_id",
        "event_type",
        (F.unix_micros("ts") / F.lit(86400000000.0)).alias("x"),
        F.col("value").alias("y"),
        F.expr(h60_spark("'ts|' || CAST(event_id AS STRING)")).alias("hk"),
    )
    w = Window.partitionBy("event_type").orderBy("hk", "event_id")
    s = ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= _TS_K)
    a = s.alias("a")
    b = s.alias("b")
    pairs = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.col("b.rn") > F.col("a.rn"))
        & (F.col("b.x") != F.col("a.x")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((F.col("b.y") - F.col("a.y")) / (F.col("b.x") - F.col("a.x"))).alias(
            "slope"
        ),
        F.col("a.event_id").alias("aid"),
        F.col("b.event_id").alias("bid"),
    )
    mw = Window.partitionBy("event_type").orderBy("slope", "aid", "bid")
    cw = Window.partitionBy("event_type")
    med = (
        pairs.withColumn("mrn", F.row_number().over(mw))
        .withColumn("n_pairs", F.count(F.lit(1)).over(cw))
        .filter(F.col("mrn") == F.floor((F.col("n_pairs") + 1) / 2))
    )
    pts = s.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_points")
    )
    return med.join(pts, "event_type").select(
        "event_type",
        "n_points",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.round("slope", 6).cast("double").alias("ts_slope"),
    )


# ---------------------------------------------------------------------------
# mann_kendall_trend
# ---------------------------------------------------------------------------

_MK_Z = 1.959964  # two-sided 5% normal quantile

_MK_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
),
s AS (
  SELECT a.event_type,
         CAST(SUM(CASE WHEN b.n > a.n THEN 1 WHEN b.n < a.n THEN -1 ELSE 0 END)
              AS BIGINT) AS s_stat
  FROM daily a JOIN daily b
    ON b.event_type = a.event_type AND b.day > a.day
  GROUP BY 1
),
nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily GROUP BY 1),
ties AS (
  SELECT event_type,
         CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_term
  FROM (
    SELECT event_type, n, CAST(COUNT(*) AS BIGINT) AS t
    FROM daily GROUP BY 1, 2
  ) WHERE t > 1 GROUP BY 1
),
stats AS (
  SELECT nd.event_type, nd.n_days, COALESCE(s.s_stat, 0) AS s_stat,
         nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5)
           - COALESCE(ties.tie_term, 0) AS var_s_x18
  FROM nd
  LEFT JOIN s ON s.event_type = nd.event_type
  LEFT JOIN ties ON ties.event_type = nd.event_type
)
SELECT event_type, n_days, s_stat, var_s_x18,
       CAST(ROUND(CASE
         WHEN var_s_x18 <= 0 THEN 0.0
         WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s_x18 / 18.0)
         WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s_x18 / 18.0)
         ELSE 0.0 END, 6) AS DOUBLE) AS z_stat,
       CASE
         WHEN var_s_x18 > 0 AND s_stat > 0
              AND (s_stat - 1) / sqrt(var_s_x18 / 18.0) > {_MK_Z} THEN 'increasing'
         WHEN var_s_x18 > 0 AND s_stat < 0
              AND (s_stat + 1) / sqrt(var_s_x18 / 18.0) < -{_MK_Z} THEN 'decreasing'
         ELSE 'no_trend' END AS trend
FROM stats
"""


@register(
    "mann_kendall_trend",
    oracle=_MK_ORACLE,
    description="Mann-Kendall monotonic trend test (Mann 1945) per event "
    "type over the daily count series: Kendall S, tie-corrected variance "
    "kept exact as var_s_x18 = 18*Var(S), continuity-corrected z and the "
    "5% verdict — integer arithmetic until the single final division "
    "(the TEST-against-time sibling of kendall_tau_exact's correlation)",
    tags=("statistics", "timeseries", "extension"),
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw scan collapses to one (type, day) count row per group —
    the pair join runs on that bounded table (days^2 per type, calendar-
    bounded at any corpus size), never on raw events."""
    e = events_tbl(spark, sf_dir).filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = daily.alias("a")
    b = daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.day") > F.col("a.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.n") > F.col("a.n"), 1)
                .when(F.col("b.n") < F.col("a.n"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    nd = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    ties = (
        daily.groupBy("event_type", "n")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    stats = (
        nd.join(s, "event_type", "left")
        .join(ties, "event_type", "left")
        .select(
            "event_type",
            "n_days",
            F.coalesce("s_stat", F.lit(0)).alias("s_stat"),
            (
                F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
                - F.coalesce("tie_term", F.lit(0))
            ).alias("var_s_x18"),
        )
    )
    z = (
        F.when(F.col("var_s_x18") <= 0, F.lit(0.0))
        .when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1) / F.sqrt(F.col("var_s_x18") / F.lit(18.0)),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1) / F.sqrt(F.col("var_s_x18") / F.lit(18.0)),
        )
        .otherwise(F.lit(0.0))
    )
    return stats.select(
        "event_type",
        "n_days",
        "s_stat",
        "var_s_x18",
        F.round(z, 6).cast("double").alias("z_stat"),
        F.when(
            (F.col("var_s_x18") > 0)
            & (F.col("s_stat") > 0)
            & (
                (F.col("s_stat") - 1) / F.sqrt(F.col("var_s_x18") / F.lit(18.0))
                > _MK_Z
            ),
            F.lit("increasing"),
        )
        .when(
            (F.col("var_s_x18") > 0)
            & (F.col("s_stat") < 0)
            & (
                (F.col("s_stat") + 1) / F.sqrt(F.col("var_s_x18") / F.lit(18.0))
                < -_MK_Z
            ),
            F.lit("decreasing"),
        )
        .otherwise(F.lit("no_trend"))
        .alias("trend"),
    )
