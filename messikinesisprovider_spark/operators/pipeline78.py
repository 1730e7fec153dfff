"""Round 5 additions, part 10: decayed counters, log-free drift, null-skew
joins.

- ``decayed_popularity_halflife`` — exponentially time-decayed popularity
  (the recsys/trending counter): each event contributes 2^(-age_weeks)
  with a 1-week half-life. Restricting the decay to INTEGER week exponents
  makes every weight an exact power of two, so the score is exactly
  representable and order-independent in binary floating point — the
  whole computation is deterministic without the libm pow() the usual
  continuous-decay formula needs. One groupBy((type, age_weeks)) then a
  micro fold per type.
- ``drift_total_variation`` — distribution drift as TOTAL VARIATION
  distance between the first and second half of the event timeline (10
  equi-width value bins): TV = max_A |P(A)-Q(A)| = (1/2) sum_bins |p-q|,
  exact rational arithmetic end-to-end (the log-free complement of the
  chi-square drift test already registered — KL would need log()).
- ``null_skew_outer_join`` — the null-key skew pattern: in a LEFT OUTER
  join where a large fraction of fact keys are NULL, every NULL row
  hashes to ONE reducer (the classic cluster-killer) and can never match
  anyway. The scale plan splits the fact side: null-key rows bypass the
  join entirely and union back null-extended; only non-null keys shuffle.
  Results provably equal the plain left join (SQL NULL never equals) —
  the oracle runs the naive join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import events_tbl, spread, tbl

# ---------------------------------------------------------------------------
# decayed_popularity_halflife
# ---------------------------------------------------------------------------

# Weight = 1 / (1 << min(age_w, 60)): an exact power of two from an integer
# shift — no libm pow. Weights below 2^-60 are floored to 2^-60 as part of
# the SEMANTICS (identical in both engines; the mass there is ~1e-18 of an
# event). The per-type reduction mixes exponents spanning more than 53 bits,
# so it runs as a SEQUENTIAL fold over age-sorted buckets (the anova
# ordered-fold convention) — aggregation order can never perturb a bit.
_DECAY_ORACLE = """
WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS maxd FROM events WHERE ts IS NOT NULL),
ev AS (
  SELECT event_type,
         date_diff('day', CAST(ts AS DATE), mx.maxd) // 7 AS age_w
  FROM events CROSS JOIN mx
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
),
bucket AS (
  SELECT event_type, age_w, COUNT(*) AS n FROM ev GROUP BY event_type, age_w
)
SELECT event_type,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(list_sum(list_transform(
              list_sort(list(struct_pack(w := age_w, n := n))),
              e -> e.n / CAST(CAST(1 AS BIGINT) << LEAST(e.w, 60) AS DOUBLE)))
            AS DOUBLE) AS decayed_score
FROM bucket
GROUP BY event_type
"""


@register(
    "decayed_popularity_halflife",
    oracle=_DECAY_ORACLE,
    description="Time-decayed popularity with a 1-week half-life: integer "
    "week ages make every weight an exact power of two, so the decayed sum "
    "is bit-deterministic without libm pow; one groupBy((type, age_week)) "
    "then a per-type micro fold",
    tags=("timeseries", "analytics", "extension"),
)
def decayed_popularity_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each weight n/2^w is exact (integer shift, correctly-rounded
    division); the per-type reduction mixes exponents spanning more than 53
    bits, so it folds SEQUENTIALLY over age-sorted buckets (array_sort +
    aggregate == list_sort + list_sum) — never an order-dependent SUM of
    doubles. Weights floor at 2^-60 by definition (identical both engines)."""
    ev = events_tbl(spark, sf_dir).where(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    mx = ev.agg(F.max(F.col("ts").cast("date")).alias("maxd"))
    bucket = (
        ev.crossJoin(F.broadcast(mx))
        .select(
            "event_type",
            F.expr("datediff(maxd, CAST(ts AS DATE)) div 7").alias("age_w"),
        )
        .groupBy("event_type", "age_w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return bucket.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(age_w AS w, n AS n))), 0D, "
            "(acc, e) -> acc + e.n / CAST(shiftleft(1L, LEAST(e.w, 60)) AS DOUBLE))"
        ).alias("decayed_score"),
    )


# ---------------------------------------------------------------------------
# drift_total_variation
# ---------------------------------------------------------------------------

_N_TV_BINS = 10

_TV_ORACLE = f"""
WITH bounds AS (
  SELECT MIN(ts) AS t0, MAX(ts) AS t1, MIN(value) AS v0, MAX(value) AS v1
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
ev AS (
  SELECT CASE WHEN epoch(ts) * 2 <= epoch(b.t0) + epoch(b.t1) THEN 0 ELSE 1 END AS half,
         CASE WHEN b.v1 = b.v0 THEN 0
              ELSE LEAST({_N_TV_BINS - 1}, CAST(floor((value - b.v0) * {_N_TV_BINS}
                   / (b.v1 - b.v0)) AS INTEGER)) END AS bin
  FROM events CROSS JOIN bounds b
  WHERE ts IS NOT NULL AND value IS NOT NULL
),
counts AS (
  SELECT bin,
         COALESCE(SUM(CASE WHEN half = 0 THEN 1 END), 0) AS p_n,
         COALESCE(SUM(CASE WHEN half = 1 THEN 1 END), 0) AS q_n
  FROM ev GROUP BY bin
),
tot AS (SELECT SUM(p_n) AS np, SUM(q_n) AS nq FROM counts)
SELECT CAST(t.np AS BIGINT) AS n_first_half,
       CAST(t.nq AS BIGINT) AS n_second_half,
       CAST(SUM(ABS(c.p_n * t.nq - c.q_n * t.np)) AS BIGINT) AS tv_num,
       CAST(2 * t.np * t.nq AS BIGINT) AS tv_den,
       CASE WHEN t.np > 0 AND t.nq > 0
            THEN CAST(SUM(ABS(c.p_n * t.nq - c.q_n * t.np)) AS DOUBLE)
                 / (2.0 * t.np * t.nq)
       END AS total_variation
FROM counts c CROSS JOIN tot t
GROUP BY t.np, t.nq
"""


@register(
    "drift_total_variation",
    oracle=_TV_ORACLE,
    description=f"Distribution drift as exact total-variation distance "
    f"between the first/second half of the event timeline ({_N_TV_BINS} "
    "equi-width value bins): TV = (1/2) sum|p-q| as an integer fraction — "
    "the log-free complement of the chi-square drift test",
    tags=("statistics", "drift", "extension"),
)
def drift_total_variation(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = events_tbl(spark, sf_dir).where(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    bounds = base.agg(
        F.min("ts").alias("t0"),
        F.max("ts").alias("t1"),
        F.min("value").alias("v0"),
        F.max("value").alias("v1"),
    )
    ev = (
        spread(base)
        .crossJoin(F.broadcast(bounds))
        .select(
            F.expr(
                "CASE WHEN unix_micros(ts) * 2 <= unix_micros(t0) + unix_micros(t1) "
                "THEN 0 ELSE 1 END"
            ).alias("half"),
            F.expr(
                f"CASE WHEN v1 = v0 THEN 0 ELSE LEAST({_N_TV_BINS - 1}, "
                f"CAST(floor((value - v0) * {_N_TV_BINS} / (v1 - v0)) AS INT)) END"
            ).alias("bin"),
        )
    )
    counts = ev.groupBy("bin").agg(
        F.coalesce(F.sum(F.when(F.col("half") == 0, 1)), F.lit(0)).alias("p_n"),
        F.coalesce(F.sum(F.when(F.col("half") == 1, 1)), F.lit(0)).alias("q_n"),
    )
    tot = counts.agg(F.sum("p_n").alias("np"), F.sum("q_n").alias("nq"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .groupBy("np", "nq")
        .agg(
            F.sum(F.abs(F.col("p_n") * F.col("nq") - F.col("q_n") * F.col("np"))).alias(
                "tv_num_raw"
            )
        )
        .select(
            F.col("np").cast("long").alias("n_first_half"),
            F.col("nq").cast("long").alias("n_second_half"),
            F.col("tv_num_raw").cast("long").alias("tv_num"),
            (2 * F.col("np") * F.col("nq")).cast("long").alias("tv_den"),
            F.when(
                (F.col("np") > 0) & (F.col("nq") > 0),
                F.col("tv_num_raw").cast("double") / (2.0 * F.col("np") * F.col("nq")),
            ).alias("total_variation"),
        )
    )


# ---------------------------------------------------------------------------
# null_skew_outer_join
# ---------------------------------------------------------------------------

_NULLSKEW_ORACLE = """
WITH fact AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_custkey END AS join_key,
         o_totalprice
  FROM orders
),
j AS (
  SELECT f.o_orderkey, f.o_totalprice, c.c_mktsegment
  FROM fact f LEFT JOIN customer c ON c.c_custkey = f.join_key
)
SELECT COALESCE(c_mktsegment, '<no-key>') AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM j GROUP BY 1
"""


@register(
    "null_skew_outer_join",
    oracle=_NULLSKEW_ORACLE,
    description="Null-key skew pattern: a LEFT OUTER join where a third of "
    "fact keys are NULL — null rows BYPASS the join (they can never match; "
    "naively they all hash to one reducer) and union back null-extended; "
    "provably equal to the plain left join the oracle runs",
    tags=("join", "skew", "scale", "extension"),
)
def null_skew_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At 100 TB a NULL-heavy foreign key is the most common skew incident:
    hashpartitioning sends every NULL to partition hash(NULL), one reducer
    drags the stage. Splitting the scan into a null leg (no shuffle at all)
    and a keyed leg keeps the join's shuffle uniform. Spark does NOT do
    this rewrite itself — outer-join null keys still shuffle."""
    fact = tbl(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("join_key"),
        "o_totalprice",
    )
    dim = tbl(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("join_key"), "c_mktsegment"
    )
    keyed = fact.where(F.col("join_key").isNotNull()).join(dim, "join_key", "left")
    nulls = fact.where(F.col("join_key").isNull()).withColumn(
        "c_mktsegment", F.lit(None).cast("string")
    )
    j = keyed.select("o_orderkey", "o_totalprice", "c_mktsegment").unionAll(
        nulls.select("o_orderkey", "o_totalprice", "c_mktsegment")
    )
    return j.groupBy(
        F.coalesce(F.col("c_mktsegment"), F.lit("<no-key>")).alias("segment")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)").alias(
            "revenue"
        ),
    )
