"""Clustering / modeling / monitoring operators, round 3 (appended).

``kmeans_lloyd_step``: one full Lloyd iteration of k-means over the
embedding corpus — assignment (argmin squared distance to 16 hash-seeded
centroids) followed by the centroid UPDATE (per-cell, per-dimension mean).
This verifies the half of the EM loop ``sim_ann_ivf_hashseed`` doesn't:
the reduce step. Coordinates are quantized to integers (×1e6, round) before
summation so the per-cell mean numerator is an exact BIGINT — aggregation
order cannot perturb it — and the mean itself is one double division.

``ols_per_group``: per-group closed-form simple linear regression (value
vs hour-of-day per event type) from one aggregate pass of exact moment
sums — the per-segment trend-fit every feature pipeline runs. Integer x
moments stay BIGINT; y moments use the registry's decimal-sum convention;
slope/intercept evaluate through one shared IEEE double tree.

``drift_chisquare_bins``: distribution-drift monitoring — events are split
into reference (first half of the time range) and current (second half)
windows, values are decade-binned, and each (event_type, bin) row carries
the chi-square contribution ((o·T_ref − e·T_cur)² / (e·T_cur·T_ref)) of
the current window against the reference. One groupBy produces both
windows' counts (conditional aggregation, no join); per-type totals come
from a partitioned window over the tiny post-aggregate table. This is the
"did yesterday's data look like today's" check run per-source at corpus
scale, where it stays one map-side-combined pass.

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

# ---------------------------------------------------------------------------
# kmeans_lloyd_step
# ---------------------------------------------------------------------------

N_KMEANS_CELLS = 16
_Q = "1000000.0"  # coordinate quantization: 1e-6 resolution

_KMEANS_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = 64
),
cent AS (
  SELECT vec_id AS cid, v AS cv FROM e
  ORDER BY {h60_duck("CAST(vec_id AS VARCHAR)")}, vec_id LIMIT {N_KMEANS_CELLS}
),
assign AS (
  SELECT e.vec_id, e.v, cent.cid, cent.cv,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_sum(list_transform(range(1, 65),
                    i -> (cent.cv[i] - e.v[i]) * (cent.cv[i] - e.v[i]))), cent.cid
         ) AS rn
  FROM e CROSS JOIN cent
),
member AS (SELECT vec_id, v, cid, cv FROM assign WHERE rn = 1),
expl AS (
  SELECT cid, b.dim AS dim, b.qval AS qval, b.oldq AS oldq FROM (
    SELECT cid, UNNEST(list_transform(range(1, 65), i -> {{
        'dim': i,
        'qval': CAST(round(v[i] * {_Q}) AS BIGINT),
        'oldq': CAST(round(cv[i] * {_Q}) AS BIGINT)}})) AS b
    FROM member)
),
agg AS (
  SELECT cid, CAST(dim AS BIGINT) AS dim, COUNT(*) AS n_members,
         SUM(qval) AS sum_q6, MIN(oldq) AS old_q6
  FROM expl GROUP BY cid, dim
)
SELECT cid, dim, CAST(n_members AS BIGINT) AS n_members,
       CAST(sum_q6 AS BIGINT) AS sum_q6, CAST(old_q6 AS BIGINT) AS old_q6,
       CAST(sum_q6 AS DOUBLE) / (CAST(n_members AS DOUBLE) * {_Q}) AS new_coord,
       CAST(sum_q6 AS DOUBLE) / (CAST(n_members AS DOUBLE) * {_Q})
         - CAST(old_q6 AS DOUBLE) / {_Q} AS delta
FROM agg
"""


@register(
    "kmeans_lloyd_step",
    oracle=_KMEANS_ORACLE,
    description=f"One Lloyd k-means iteration ({N_KMEANS_CELLS} hash-seeded "
    "centroids): argmin assignment + exact-integer centroid update",
    tags=("clustering", "ml", "iterative", "extension"),
)
def kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assignment + update, both distributed-deterministic.

    Assignment is the proven IVF shape: corpus × 16 broadcast centroids,
    squared distance as a sequential ascending fold (bit-identical in both
    engines), argmin via a per-vector partitioned window. The update
    quantizes coordinates to 1e-6 BIGINTs BEFORE summing, so the per-cell
    numerator is order-independent under Spark's partial/final aggregation
    — the iterative-EM twin of the portable-hash trick. At 100 TB the
    assignment is one codegen'd pass and the update is a map-side-combined
    groupBy on (cell, dim): 16×64 result rows regardless of corpus size.
    """
    e = tbl(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull() & (F.size("embedding") == 64)
    ).select("vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"))
    cent = (
        e.select("vec_id", "v", F.expr(h60_spark("CAST(vec_id AS STRING)")).alias("h"))
        .orderBy("h", "vec_id")
        .limit(N_KMEANS_CELLS)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    dist = F.expr(
        "aggregate(zip_with(cv, v, (w, x) -> (w - x) * (w - x)), 0D, (s, d) -> s + d)"
    )
    assign = (
        e.crossJoin(F.broadcast(cent))
        .withColumn("dist", dist)
        .withColumn(
            "rn", F.row_number().over(W.partitionBy("vec_id").orderBy("dist", "cid"))
        )
    )
    member = assign.filter(F.col("rn") == 1).select("vec_id", "v", "cid", "cv")
    expl = member.select(
        "cid",
        F.explode(
            F.expr(
                "transform(sequence(1, 64), i -> named_struct("
                "'dim', CAST(i AS BIGINT), "
                f"'qval', CAST(round(v[i - 1] * {_Q}) AS BIGINT), "
                f"'oldq', CAST(round(cv[i - 1] * {_Q}) AS BIGINT)))"
            )
        ).alias("b"),
    ).select("cid", "b.dim", "b.qval", "b.oldq")
    agg = expl.groupBy("cid", "dim").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("qval").cast("long").alias("sum_q6"),
        F.min("oldq").cast("long").alias("old_q6"),
    )
    new_coord = F.col("sum_q6").cast("double") / (
        F.col("n_members").cast("double") * F.lit(1000000.0)
    )
    return agg.select(
        "cid",
        "dim",
        "n_members",
        "sum_q6",
        "old_q6",
        new_coord.alias("new_coord"),
        (new_coord - F.col("old_q6").cast("double") / F.lit(1000000.0)).alias("delta"),
    )


# ---------------------------------------------------------------------------
# ols_per_group
# ---------------------------------------------------------------------------

# slope/intercept as ONE shared double tree — identical IEEE ops both engines
_SLOPE = "(nd * sxy - sx * sy) / (nd * sxx - sx * sx)"
_OLS_GUARD = "n >= 2 AND (nd * sxx - sx * sx) > 0"

_OLS_ORACLE = f"""
WITH src AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS x, value AS y
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
),
a AS (
  SELECT event_type, COUNT(*) AS n, CAST(COUNT(*) AS DOUBLE) AS nd,
         CAST(SUM(x) AS BIGINT) AS sx_i,
         CAST(SUM(x * x) AS BIGINT) AS sxx_i,
         CAST(SUM(CAST(y AS DECIMAL(27,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * y AS DECIMAL(27,6))) AS DOUBLE) AS sxy
  FROM src GROUP BY event_type
),
b AS (
  SELECT event_type, n, nd, sy, sxy,
         CAST(sx_i AS DOUBLE) AS sx, CAST(sxx_i AS DOUBLE) AS sxx
  FROM a
)
SELECT event_type, CAST(n AS BIGINT) AS n, sx AS sum_x, sy AS sum_y,
       CASE WHEN {_OLS_GUARD} THEN {_SLOPE} END AS slope,
       CASE WHEN {_OLS_GUARD} THEN (sy - ({_SLOPE}) * sx) / nd END AS intercept
FROM b
"""


@register(
    "ols_per_group",
    oracle=_OLS_ORACLE,
    description="Per-event-type closed-form OLS (value ~ hour-of-day) from one "
    "exact-moment aggregate pass; slope/intercept via a shared double tree",
    tags=("statistics", "ml", "aggregate", "extension"),
)
def ols_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level trend fitting without any ML stage: the x moments are
    exact BIGINTs (hour ∈ [0, 23]), the y moments are decimal-exact sums,
    and the closed-form slope/intercept is the same expression tree in both
    engines. One map-side-combined groupBy per 100 TB pass; group count =
    |event types|."""
    src = (
        events_tbl(spark, sf_dir)
        .where(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select(
            "event_type",
            F.hour("ts").cast("long").alias("x"),
            F.col("value").alias("y"),
        )
    )
    a = src.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(COUNT(*) AS DOUBLE)").alias("nd"),
        F.expr("CAST(SUM(x) AS DOUBLE)").alias("sx"),
        F.expr("CAST(SUM(x * x) AS DOUBLE)").alias("sxx"),
        F.expr("CAST(SUM(CAST(y AS DECIMAL(27,6))) AS DOUBLE)").alias("sy"),
        F.expr("CAST(SUM(CAST(x * y AS DECIMAL(27,6))) AS DOUBLE)").alias("sxy"),
    )
    return a.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("sx").alias("sum_x"),
        F.col("sy").alias("sum_y"),
        F.expr(f"CASE WHEN {_OLS_GUARD} THEN {_SLOPE} END").alias("slope"),
        F.expr(f"CASE WHEN {_OLS_GUARD} THEN (sy - ({_SLOPE}) * sx) / nd END").alias(
            "intercept"
        ),
    )


# ---------------------------------------------------------------------------
# drift_chisquare_bins
# ---------------------------------------------------------------------------

_N_BINS = 10
_BIN_WIDTH = 10.0

_DRIFT_ORACLE = f"""
WITH src AS (
  SELECT event_type, value, epoch_us(ts) AS e
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
),
bounds AS (SELECT MIN(e) AS lo, MAX(e) AS hi FROM src),
tagged AS (
  SELECT event_type,
         CAST(LEAST(GREATEST(floor(value / {_BIN_WIDTH}), 0.0),
                    {_N_BINS - 1}.0) AS BIGINT) AS bin,
         CASE WHEN e * 2 < lo + hi THEN 1 ELSE 0 END AS is_ref
  FROM src CROSS JOIN bounds
),
counts AS (
  SELECT event_type, bin, SUM(is_ref) AS n_ref, COUNT(*) - SUM(is_ref) AS n_cur
  FROM tagged GROUP BY event_type, bin
),
tot AS (
  SELECT event_type, bin, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
         CAST(SUM(n_ref) OVER (PARTITION BY event_type) AS BIGINT) AS t_ref,
         CAST(SUM(n_cur) OVER (PARTITION BY event_type) AS BIGINT) AS t_cur
  FROM counts
)
SELECT event_type, bin, n_ref, n_cur, t_ref, t_cur,
       CASE WHEN n_ref > 0 AND t_ref > 0 AND t_cur > 0 THEN
         (CAST(n_cur AS DOUBLE) * t_ref - CAST(n_ref AS DOUBLE) * t_cur)
         * (CAST(n_cur AS DOUBLE) * t_ref - CAST(n_ref AS DOUBLE) * t_cur)
         / (CAST(n_ref AS DOUBLE) * t_cur * t_ref)
       END AS chi2_contrib
FROM tot
"""


@register(
    "drift_chisquare_bins",
    oracle=_DRIFT_ORACLE,
    description="Distribution-drift monitor: per-(event_type, value-bin) "
    "chi-square contribution of the second half of the time range vs the first",
    tags=("monitoring", "statistics", "extension"),
)
def drift_chisquare_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The did-the-data-shift check, one pass + one micro-window.

    Both windows' counts come from ONE conditional aggregation (no join,
    no second scan); per-type totals are a partitioned window over the
    |types|×|bins| post-aggregate table (metadata-scale). The chi-square
    contribution is a single shared double tree. NULL event_type stays a
    real group (window partitioning, not an equi-join, so the NULL-key
    drop class from the edge sweep can't occur). NaN/Inf values clamp into
    the top bin identically in both engines (NaN and Inf order above all
    finite doubles in each)."""
    src = (
        events_tbl(spark, sf_dir)
        .where(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select("event_type", "value", F.unix_micros("ts").alias("e"))
    )
    bounds = src.agg(F.min("e").alias("lo"), F.max("e").alias("hi"))
    tagged = src.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.expr(
            f"CAST(LEAST(GREATEST(floor(value / {_BIN_WIDTH}), 0.0), "
            f"{_N_BINS - 1}.0) AS BIGINT)"
        ).alias("bin"),
        F.when(F.col("e") * 2 < F.col("lo") + F.col("hi"), 1).otherwise(0).alias("is_ref"),
    )
    counts = tagged.groupBy("event_type", "bin").agg(
        F.sum("is_ref").alias("n_ref"),
        (F.count(F.lit(1)) - F.sum("is_ref")).alias("n_cur"),
    )
    w = W.partitionBy("event_type")
    tot = counts.select(
        "event_type",
        "bin",
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.sum("n_ref").over(w).cast("long").alias("t_ref"),
        F.sum("n_cur").over(w).cast("long").alias("t_cur"),
    )
    num = F.col("n_cur").cast("double") * F.col("t_ref") - F.col("n_ref").cast(
        "double"
    ) * F.col("t_cur")
    return tot.select(
        "event_type",
        "bin",
        "n_ref",
        "n_cur",
        "t_ref",
        "t_cur",
        F.when(
            (F.col("n_ref") > 0) & (F.col("t_ref") > 0) & (F.col("t_cur") > 0),
            num * num / (F.col("n_ref").cast("double") * F.col("t_cur") * F.col("t_ref")),
        ).alias("chi2_contrib"),
    )
