"""Round 4 additions, part 2: join-size sketching, one-pass threshold
sweeps, incremental aggregate view maintenance.

- ``sketch_agms_join_size`` — AGMS ("tug-of-war", Alon-Gianella-Matias-
  Szegedy) sketches for EQUI-JOIN SIZE estimation: |A ⋈_k B| = Σ_v a_v·b_v
  is estimated by X_A·X_B where X = Σ_v s(v)·count(v) and s(v) ∈ {±1} is a
  4-wise-ish hash sign — the statistic a cost-based optimizer wants before
  committing to a join strategy. Each side's sketch is ``_AGMS_SEEDS``
  BIGINT counters (bounded state, mergeable by addition across
  partitions/days — the CMS property, for join sizes). Signs come from the
  portable hash, every counter is an exact integer sum, so the WHOLE
  pipeline — sketch state, per-seed estimates, the exact join size
  alongside — is oracle-exact.

- ``threshold_sweep_quality`` — filter-threshold tuning in ONE pass: a
  per-doc integer quality score is evaluated against 9 candidate keep
  thresholds simultaneously (explode the threshold axis, map-side-combined
  conditional aggregates). The alternative — one scan per candidate — is
  9x the cost at 100 TB; this is the standard hyperparameter-sweep reduce.

- ``ivm_agg_maintenance`` — incremental view maintenance for an aggregate:
  the per-user (count, decimal sum) view over the FIRST ~80% of the time
  range (the "materialized base") is updated with the remaining delta by
  MERGING partial aggregates (the additivity Spark's own partial/final
  aggregation relies on), and the maintained view is verified IN-PLAN
  against the from-scratch rebuild — update cost proportional to the
  delta, not the base. Output: per-state accounting + row-level verdict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import events_tbl, tbl

# ---------------------------------------------------------------------------
# sketch_agms_join_size
# ---------------------------------------------------------------------------

_AGMS_SEEDS = 16
_A_TYPE = "click"
_B_TYPE = "purchase"


def _sign_expr_duck(seed: str, key: str) -> str:
    h = h60_duck(f"'s' || {seed} || '|' || {key}")
    return f"(1 - 2 * ({h} % 2))"


def _sign_expr_spark(seed: str, key: str) -> str:
    h = h60_spark(f"concat('s', {seed}, '|', {key})")
    return f"(1 - 2 * ({h} % 2))"


_AGMS_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_type FROM events
  WHERE user_id IS NOT NULL AND event_type IN ('{_A_TYPE}', '{_B_TYPE}')
),
seeds AS (SELECT UNNEST(range(0, {_AGMS_SEEDS})) AS seed),
sk AS (
  SELECT seed,
         SUM(CASE WHEN event_type = '{_A_TYPE}'
             THEN {_sign_expr_duck('seed', 'CAST(user_id AS VARCHAR)')} ELSE 0 END) AS xa,
         SUM(CASE WHEN event_type = '{_B_TYPE}'
             THEN {_sign_expr_duck('seed', 'CAST(user_id AS VARCHAR)')} ELSE 0 END) AS xb
  FROM ev CROSS JOIN seeds
  GROUP BY seed
),
exact AS (
  SELECT COALESCE(SUM(a.n * b.n), 0) AS true_join_size FROM
    (SELECT user_id, COUNT(*) AS n FROM ev WHERE event_type = '{_A_TYPE}' GROUP BY 1) a
    JOIN
    (SELECT user_id, COUNT(*) AS n FROM ev WHERE event_type = '{_B_TYPE}' GROUP BY 1) b
    USING (user_id)
)
SELECT CAST(seed AS BIGINT) AS seed,
       CAST(xa AS BIGINT) AS xa, CAST(xb AS BIGINT) AS xb,
       CAST(xa * xb AS BIGINT) AS est_join_size,
       CAST(true_join_size AS BIGINT) AS true_join_size
FROM sk CROSS JOIN exact
"""


@register(
    "sketch_agms_join_size",
    oracle=_AGMS_ORACLE,
    description=f"AGMS tug-of-war join-size sketch ({_AGMS_SEEDS} signed "
    "counters per side): per-seed estimates of |clicks join purchases on "
    "user| with the exact join size alongside — bounded mergeable state, "
    "fully integer, oracle-exact",
    tags=("sketch", "join", "cardinality", "extension"),
)
def sketch_agms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AGMS join-size estimation (see module doc). One scan builds both
    sides' counters (seed explode + conditional sums, map-side combined);
    the exact ground truth is a join of two pre-aggregated per-user counts
    (orders of magnitude smaller than the raw tables)."""
    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("user_id").isNotNull() & F.col("event_type").isin(_A_TYPE, _B_TYPE))
        .select("user_id", "event_type")
    )
    seeded = ev.select(
        "user_id",
        "event_type",
        F.explode(F.expr(f"sequence(0, {_AGMS_SEEDS - 1})")).alias("seed"),
    )
    sgn = F.expr(_sign_expr_spark("seed", "CAST(user_id AS STRING)"))
    sk = seeded.groupBy("seed").agg(
        F.sum(F.when(F.col("event_type") == _A_TYPE, sgn).otherwise(F.lit(0))).alias("xa"),
        F.sum(F.when(F.col("event_type") == _B_TYPE, sgn).otherwise(F.lit(0))).alias("xb"),
    )
    a = ev.filter(F.col("event_type") == _A_TYPE).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("na")
    )
    b = ev.filter(F.col("event_type") == _B_TYPE).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("nb")
    )
    exact = (
        a.join(b, "user_id")
        .agg(F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0)).alias("true_join_size"))
    )
    return sk.crossJoin(F.broadcast(exact)).select(
        F.col("seed").cast("long").alias("seed"),
        F.col("xa").cast("long").alias("xa"),
        F.col("xb").cast("long").alias("xb"),
        (F.col("xa") * F.col("xb")).cast("long").alias("est_join_size"),
        F.col("true_join_size").cast("long").alias("true_join_size"),
    )


# ---------------------------------------------------------------------------
# threshold_sweep_quality
# ---------------------------------------------------------------------------

# integer per-doc score in [0, 1000]: length saturation + alpha-word ratio
_SCORE_SPARK = (
    "least(500, CAST(length(text) AS BIGINT) div 2) + "
    "(500 * size(filter(split(lower(text), ' '), w -> w rlike '^[a-z]+$'))) "
    "div greatest(1, size(filter(split(lower(text), ' '), w -> w <> '')))"
)
_SCORE_DUCK = (
    "least(500, CAST(length(text) AS BIGINT) // 2) + "
    "(500 * len(list_filter(string_split(lower(text), ' '), w -> regexp_full_match(w, '[a-z]+')))) "
    "// greatest(1, len(list_filter(string_split(lower(text), ' '), w -> w <> '')))"
)

_SWEEP_ORACLE = f"""
WITH scored AS (
  SELECT ({_SCORE_DUCK}) AS score, length(text) AS n_chars
  FROM documents WHERE text IS NOT NULL
),
th AS (SELECT UNNEST(range(1, 10)) * 100 AS threshold)
SELECT CAST(threshold AS BIGINT) AS threshold,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN score >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST((1000 * SUM(CASE WHEN score >= threshold THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT) AS keep_pm,
       CAST(COALESCE(SUM(CASE WHEN score >= threshold THEN n_chars ELSE 0 END), 0) AS BIGINT) AS kept_chars
FROM scored CROSS JOIN th
GROUP BY threshold
HAVING COUNT(*) > 0
"""


@register(
    "threshold_sweep_quality",
    oracle=_SWEEP_ORACLE,
    description="Quality-filter threshold sweep: 9 candidate keep thresholds "
    "evaluated from ONE corpus scan (threshold-axis explode + map-side "
    "conditional aggregates) — keep counts, per-mille rates, retained chars",
    tags=("curation", "eval", "sweep", "extension"),
)
def threshold_sweep_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = (
        tbl(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(
            F.expr(_SCORE_SPARK).alias("score"),
            F.length("text").cast("long").alias("n_chars"),
        )
    )
    sweep = scored.select(
        "score",
        "n_chars",
        F.explode(F.expr("transform(sequence(1, 9), i -> i * CAST(100 AS BIGINT))")).alias(
            "threshold"
        ),
    )
    kept = F.when(F.col("score") >= F.col("threshold"), 1).otherwise(0)
    return sweep.groupBy("threshold").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(kept).cast("long").alias("n_kept"),
        F.expr(
            "CAST((1000 * SUM(CASE WHEN score >= threshold THEN 1 ELSE 0 END)) div COUNT(*) AS BIGINT)"
        ).alias("keep_pm"),
        F.coalesce(
            F.sum(F.when(F.col("score") >= F.col("threshold"), F.col("n_chars")).otherwise(F.lit(0))),
            F.lit(0),
        )
        .cast("long")
        .alias("kept_chars"),
    )


# ---------------------------------------------------------------------------
# ivm_agg_maintenance
# ---------------------------------------------------------------------------

_IVM_ORACLE = """
WITH ev AS (
  SELECT user_id, ts, CAST(value AS DECIMAL(18,6)) AS v FROM events
  WHERE user_id IS NOT NULL
),
b AS (
  SELECT epoch_us(MIN(ts)) + (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) * 4 // 5
         AS split_us FROM ev
),
base AS (
  SELECT user_id, COUNT(*) AS n, SUM(v) AS s FROM ev CROSS JOIN b
  WHERE epoch_us(ts) < split_us OR ts IS NULL GROUP BY user_id
),
delta AS (
  SELECT user_id, COUNT(*) AS n, SUM(v) AS s FROM ev CROSS JOIN b
  WHERE epoch_us(ts) >= split_us GROUP BY user_id
),
merged AS (
  SELECT COALESCE(base.user_id, delta.user_id) AS user_id,
         COALESCE(base.n, 0) + COALESCE(delta.n, 0) AS n,
         COALESCE(base.s, 0) + COALESCE(delta.s, 0) AS s,
         CASE WHEN base.user_id IS NULL THEN 'new'
              WHEN delta.user_id IS NULL THEN 'carried'
              ELSE 'updated' END AS state
  FROM base FULL OUTER JOIN delta ON base.user_id = delta.user_id
),
rebuilt AS (
  SELECT user_id, COUNT(*) AS n, SUM(v) AS s FROM ev GROUP BY user_id
)
SELECT state,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(m.n) AS BIGINT) AS n_rows,
       CAST(SUM(m.s) AS DOUBLE) AS value_sum,
       CAST(SUM(CASE WHEN m.n = r.n AND m.s = r.s THEN 1 ELSE 0 END) AS BIGINT) AS n_verified
FROM merged m JOIN rebuilt r USING (user_id)
GROUP BY state
"""


@register(
    "ivm_agg_maintenance",
    oracle=_IVM_ORACLE,
    description="Incremental view maintenance for a per-user (count, sum) "
    "aggregate: base view + delta batch merged by partial-aggregate "
    "addition, verified row-for-row in-plan against the full rebuild; "
    "per-state (new/updated/carried) accounting",
    tags=("lakeops", "ivm", "incremental", "extension"),
)
def ivm_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate IVM (see module doc). Exact decimal sums make the merge
    equality bit-checkable: base+delta MUST equal the rebuild, and the
    verdict (n_verified == n_groups per state) rides in the output."""
    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .select("user_id", "ts", F.col("value").cast("decimal(18,6)").alias("v"))
    )
    b = ev.agg(
        F.expr(
            "unix_micros(MIN(ts)) + (unix_micros(MAX(ts)) - unix_micros(MIN(ts))) * 4 div 5"
        ).alias("split_us")
    )
    evb = ev.crossJoin(F.broadcast(b))
    agg = lambda df: df.groupBy("user_id").agg(  # noqa: E731
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    base = agg(
        evb.filter(
            (F.unix_micros("ts") < F.col("split_us")) | F.col("ts").isNull()
        )
    )
    delta = agg(evb.filter(F.unix_micros("ts") >= F.col("split_us")))
    merged = (
        base.withColumnRenamed("n", "bn")
        .withColumnRenamed("s", "bs")
        .join(
            delta.withColumnRenamed("n", "dn").withColumnRenamed("s", "ds"),
            "user_id",
            "full",
        )
        .select(
            "user_id",
            (F.coalesce("bn", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
            (
                F.coalesce(F.col("bs"), F.lit(0).cast("decimal(18,6)"))
                + F.coalesce(F.col("ds"), F.lit(0).cast("decimal(18,6)"))
            ).alias("s"),
            F.when(F.col("bn").isNull(), F.lit("new"))
            .when(F.col("dn").isNull(), F.lit("carried"))
            .otherwise(F.lit("updated"))
            .alias("state"),
        )
    )
    rebuilt = agg(ev).withColumnRenamed("n", "rn").withColumnRenamed("s", "rs")
    return (
        merged.join(rebuilt, "user_id")
        .groupBy("state")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("n").cast("long").alias("n_rows"),
            F.sum("s").cast("double").alias("value_sum"),
            F.sum(
                F.when((F.col("n") == F.col("rn")) & (F.col("s").eqNullSafe(F.col("rs"))), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_verified"),
        )
    )
