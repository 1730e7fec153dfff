"""Sequence / survival / sketch-algebra operators, round 3 (appended).

``markov_transitions``: the first-order Markov transition matrix of user
event sequences — P(next event type | current) as per-mille floor-div
integers. The building block behind session simulation, anomalous-journey
scoring and sequence-model sanity checks. One shuffle on user_id for the
lag; transition counts are a map-side-combined groupBy; row totals come
from a window partitioned by source state over the |types|² micro-table.

``survival_hazard_bins``: a discrete-time survival life table for the
click→purchase conversion: per user, time from first click to first
purchase (censored at the corpus horizon when no purchase follows), binned
by day; each bin row carries events, censored, number-at-risk and the
discrete hazard ⌊1000·d/n_at_risk⌋. At-risk counts come from a theta-join
aggregation over the bin micro-table (the AUC concordant-pair shape), NOT
a global-ordered window — zero unpartitioned-window plans.

``sketch_countmin_merge``: verifies the LINEARITY of the Count-Min sketch
in-plan — the property that makes bounded sketch state mergeable across
partitions/days/sources at 100 TB. Per-source sketches (one groupBy keyed
by (source, row, bucket)) are merged by counter addition and compared,
bucket-for-bucket AND on point queries for the top tokens, against the
sketch built directly over the whole corpus. Both equalities ride in the
output and the oracle reproduces the full double build.

Reference parity note: the reference (SURVEY.md §0) has no relational
surface; these extend the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import events_tbl, tbl
from .retrieval3 import _TOKS_DUCK, _TOKS_SPARK

# ---------------------------------------------------------------------------
# markov_transitions
# ---------------------------------------------------------------------------

_MARKOV_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER w AS prev,
         ROW_NUMBER() OVER w AS rn
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
trans AS (
  SELECT prev AS src_type, event_type AS dst_type, COUNT(*) AS n
  FROM seq WHERE rn > 1 GROUP BY 1, 2
)
SELECT src_type, dst_type, CAST(n AS BIGINT) AS n,
       CAST(SUM(n) OVER (PARTITION BY src_type) AS BIGINT) AS n_src,
       CAST((1000 * n) // SUM(n) OVER (PARTITION BY src_type) AS BIGINT) AS p_pm
FROM trans
"""


@register(
    "markov_transitions",
    oracle=_MARKOV_ORACLE,
    description="First-order Markov transition matrix of per-user event "
    "sequences; per-mille probabilities in exact floor-div integers",
    tags=("sequence", "analytics", "extension"),
)
def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P(dst | src) over consecutive same-user events.

    The rn > 1 filter (not ``prev IS NOT NULL``) distinguishes "no previous
    event" from "previous type was NULL", so a nullable state column can't
    silently drop transitions. Scale: lag+rn share ONE window spec (one
    shuffle on user_id); counts are map-side combined; the row-total window
    partitions by src_type over a |types|² table."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        events_tbl(spark, sf_dir)
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "event_type",
            F.lag("event_type").over(w).alias("prev"),
            F.row_number().over(w).alias("rn"),
        )
    )
    trans = (
        seq.filter(F.col("rn") > 1)
        .groupBy(F.col("prev").alias("src_type"), F.col("event_type").alias("dst_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ws = W.partitionBy("src_type")
    return trans.select(
        "src_type",
        "dst_type",
        F.col("n").cast("long").alias("n"),
        F.sum("n").over(ws).cast("long").alias("n_src"),
        F.expr("CAST((1000 * n) div SUM(n) OVER (PARTITION BY src_type) AS BIGINT)").alias(
            "p_pm"
        ),
    )


# ---------------------------------------------------------------------------
# survival_hazard_bins
# ---------------------------------------------------------------------------

_DAY_US = 86400000000  # one day in microseconds

_SURVIVAL_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS e
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
horizon AS (SELECT MAX(e) AS hi FROM ev),
per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'click' THEN e END) AS t0,
         MIN(CASE WHEN event_type = 'purchase' THEN e END) AS t_any
  FROM ev GROUP BY user_id
),
-- first purchase AT OR AFTER the first click (not just any purchase)
tp AS (
  SELECT p.user_id, p.t0,
         MIN(CASE WHEN ev.event_type = 'purchase' AND ev.e >= p.t0
                  THEN ev.e END) AS t1
  FROM per_user p JOIN ev ON ev.user_id = p.user_id
  WHERE p.t0 IS NOT NULL
  GROUP BY p.user_id, p.t0
),
durations AS (
  SELECT CASE WHEN t1 IS NOT NULL THEN (t1 - t0) // {_DAY_US}
              ELSE (hi - t0) // {_DAY_US} END AS bin,
         CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS is_event
  FROM tp CROSS JOIN horizon
),
bins AS (
  SELECT bin, SUM(is_event) AS n_event, COUNT(*) - SUM(is_event) AS n_cens
  FROM durations GROUP BY bin
),
risk AS (
  SELECT b.bin, CAST(SUM(b2.n_event + b2.n_cens) AS BIGINT) AS n_at_risk
  FROM bins b JOIN bins b2 ON b2.bin >= b.bin
  GROUP BY b.bin
)
SELECT bins.bin AS bin, CAST(n_event AS BIGINT) AS n_event,
       CAST(n_cens AS BIGINT) AS n_cens, n_at_risk,
       CAST((1000 * n_event) // n_at_risk AS BIGINT) AS hazard_pm
FROM bins JOIN risk ON risk.bin = bins.bin
"""


@register(
    "survival_hazard_bins",
    oracle=_SURVIVAL_ORACLE,
    description="Discrete-time survival life table (click→purchase, censored "
    "at horizon): events / censored / at-risk / per-mille hazard per day bin",
    tags=("survival", "analytics", "extension"),
)
def survival_hazard_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier-style life table in exact integers.

    Two shuffles on user_id (per-user min-click, then the purchase-after-
    click aggregate); the day-bin table is |days| rows, and at-risk counts
    come from the bin-level theta join (Σ over bins ≥ d) — the same
    micro-table pattern as the AUC concordant count, so no global-ordered
    window ever appears. Hazard is ⌊1000·events/at_risk⌋ floor-div."""
    ev = (
        events_tbl(spark, sf_dir)
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", "event_type", F.unix_micros("ts").alias("e"))
    )
    horizon = ev.agg(F.max("e").alias("hi"))
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("e"))).alias("t0")
    ).filter(F.col("t0").isNotNull())
    tp = (
        per_user.join(ev, "user_id")
        .groupBy("user_id", "t0")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("e") >= F.col("t0")),
                    F.col("e"),
                )
            ).alias("t1")
        )
    )
    durations = tp.crossJoin(F.broadcast(horizon)).select(
        F.expr(
            f"CASE WHEN t1 IS NOT NULL THEN (t1 - t0) div {_DAY_US} "
            f"ELSE (hi - t0) div {_DAY_US} END"
        ).alias("bin"),
        F.when(F.col("t1").isNotNull(), 1).otherwise(0).alias("is_event"),
    )
    bins = durations.groupBy("bin").agg(
        F.sum("is_event").alias("n_event"),
        (F.count(F.lit(1)) - F.sum("is_event")).alias("n_cens"),
    )
    b2 = bins.select(
        F.col("bin").alias("bin2"), (F.col("n_event") + F.col("n_cens")).alias("m")
    )
    risk = (
        bins.select("bin")
        .join(b2, F.col("bin2") >= F.col("bin"))
        .groupBy("bin")
        .agg(F.sum("m").cast("long").alias("n_at_risk"))
    )
    return (
        bins.join(risk, "bin")
        .select(
            "bin",
            F.col("n_event").cast("long").alias("n_event"),
            F.col("n_cens").cast("long").alias("n_cens"),
            "n_at_risk",
            F.expr("CAST((1000 * n_event) div n_at_risk AS BIGINT)").alias("hazard_pm"),
        )
    )


# ---------------------------------------------------------------------------
# sketch_countmin_merge
# ---------------------------------------------------------------------------

CMM_ROWS = 4
CMM_WIDTH = 256
CMM_TOPK = 15


def _cmm_oracle() -> str:
    def hash_b(r: int) -> str:
        inner = h60_duck(f"concat('{r}', '|', t)")
        return f"({inner}) % {CMM_WIDTH}"
    fan_rows = " UNION ALL ".join(
        f"SELECT src, {r} AS r, {hash_b(r)} AS b, c FROM tok_counts" for r in range(CMM_ROWS)
    )
    est_cols = ", ".join(
        f"(SELECT counter FROM merged m WHERE m.r = {r} AND m.b = {hash_b(r)}) AS me{r}, "
        f"(SELECT counter FROM direct d WHERE d.r = {r} AND d.b = {hash_b(r)}) AS de{r}"
        for r in range(CMM_ROWS)
    )
    least_m = "LEAST(" + ", ".join(f"me{r}" for r in range(CMM_ROWS)) + ")"
    least_d = "LEAST(" + ", ".join(f"de{r}" for r in range(CMM_ROWS)) + ")"
    return f"""
WITH toks AS (
  SELECT COALESCE(source, '') AS src, UNNEST({_TOKS_DUCK}) AS t
  FROM documents WHERE text IS NOT NULL
),
tok_counts AS (SELECT src, t, COUNT(*) AS c FROM toks GROUP BY src, t),
fan AS ({fan_rows}),
per_source AS (
  SELECT src, r, b, SUM(c) AS counter FROM fan GROUP BY src, r, b
),
merged AS (SELECT r, b, CAST(SUM(counter) AS BIGINT) AS counter FROM per_source GROUP BY r, b),
direct AS (SELECT r, b, CAST(SUM(c) AS BIGINT) AS counter FROM fan GROUP BY r, b),
bucket_eq AS (
  SELECT COUNT(*) AS n_buckets,
         SUM(CASE WHEN m.counter = d.counter THEN 1 ELSE 0 END) AS n_equal
  FROM merged m JOIN direct d ON d.r = m.r AND d.b = m.b
),
gtok AS (SELECT t, CAST(SUM(c) AS BIGINT) AS c FROM tok_counts GROUP BY t),
topk AS (SELECT t, c FROM gtok ORDER BY c DESC, t LIMIT {CMM_TOPK}),
queried AS (SELECT t, c, {est_cols} FROM topk)
SELECT t AS token, c AS exact_c,
       CAST({least_m} AS BIGINT) AS est_merged,
       CAST({least_d} AS BIGINT) AS est_direct,
       {least_m} = {least_d} AS merged_equals_direct,
       {least_m} >= c AS no_underestimate,
       (SELECT n_buckets FROM bucket_eq) = (SELECT n_equal FROM bucket_eq)
         AS all_buckets_equal
FROM queried
"""


@register(
    "sketch_countmin_merge",
    oracle=_cmm_oracle(),
    description=f"Count-Min linearity verified in-plan: per-source {CMM_ROWS}x"
    f"{CMM_WIDTH} sketches merged by addition == sketch built directly; "
    "bucket-level and point-query equality both emitted",
    tags=("sketch", "countmin", "merge", "extension"),
)
def sketch_countmin_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeability story, executed rather than asserted.

    Per-source sketches are one groupBy keyed (source, row, bucket) —
    exactly what per-day/per-partition sketch state looks like at 100 TB —
    and the merge is counter addition. Because CMS is linear, the merged
    sketch must equal the directly-built one bucket-for-bucket; both that
    equality (over all {CMM_ROWS}×{CMM_WIDTH} buckets) and point-query
    equality for the exact top tokens are computed in-plan and emitted.
    """
    toks = (
        tbl(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(
            F.coalesce(F.col("source"), F.lit("")).alias("src"),
            F.explode(F.expr(_TOKS_SPARK)).alias("t"),
        )
    )
    tok_counts = toks.groupBy("src", "t").agg(F.count(F.lit(1)).alias("c"))
    fan = tok_counts.select(
        "src",
        "c",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (F.expr(h60_spark(f"concat('{r}', '|', t)")) % CMM_WIDTH).alias("b"),
                    )
                    for r in range(CMM_ROWS)
                ]
            )
        ).alias("rb"),
    ).select("src", "c", F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    per_source = fan.groupBy("src", "r", "b").agg(F.sum("c").alias("counter"))
    merged = per_source.groupBy("r", "b").agg(F.sum("counter").cast("long").alias("mc"))
    direct = fan.groupBy("r", "b").agg(F.sum("c").cast("long").alias("dc"))
    both = merged.join(direct, ["r", "b"])
    bucket_eq = both.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.when(F.col("mc") == F.col("dc"), 1).otherwise(0)).alias("n_equal"),
    ).select((F.col("n_buckets") == F.col("n_equal")).alias("all_buckets_equal"))
    glob = tok_counts.groupBy("t").agg(F.sum("c").cast("long").alias("c"))
    topk = glob.orderBy(F.desc("c"), "t").limit(CMM_TOPK)
    hashed = topk.select(
        "t",
        "c",
        *[
            (F.expr(h60_spark(f"concat('{r}', '|', t)")) % CMM_WIDTH).alias(f"b{r}")
            for r in range(CMM_ROWS)
        ],
    )
    est = hashed
    for r in range(CMM_ROWS):
        mr = both.filter(F.col("r") == r).select(
            F.col("b").alias(f"b{r}"), F.col("mc").alias(f"me{r}"), F.col("dc").alias(f"de{r}")
        )
        est = est.join(F.broadcast(mr), f"b{r}")
    least_m = F.least(*[F.col(f"me{r}") for r in range(CMM_ROWS)])
    least_d = F.least(*[F.col(f"de{r}") for r in range(CMM_ROWS)])
    return est.crossJoin(F.broadcast(bucket_eq)).select(
        F.col("t").alias("token"),
        F.col("c").alias("exact_c"),
        least_m.alias("est_merged"),
        least_d.alias("est_direct"),
        (least_m == least_d).alias("merged_equals_direct"),
        (least_m >= F.col("c")).alias("no_underestimate"),
        "all_buckets_equal",
    )
