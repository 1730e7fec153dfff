"""Round 4 additions, part 30: gains/lift table, LISTAGG report, HLL union
rollup, hash-deterministic permutation test.

- ``cumulative_gains_lift`` — the marketing/model-eval decile table: users
  ranked by a predictor (click count), NTILE(10) from the two-pass global
  ranking (no single-partition window), per-decile positives (purchasers),
  and CUMULATIVE gains/lift via the |deciles|^2 micro-table theta join
  (the user_growth_curve shape).  Lift = (cum_pos * total_users) /
  (cum_users * total_pos): exact BIGINT cross-products, one IEEE division.

- ``listagg_order_report`` — the Spark 4 LISTAGG ... WITHIN GROUP surface:
  per-nation roster of its top-5 customers by account balance.  The
  window top-k BOUNDS the aggregated string before LISTAGG runs — an
  unbounded LISTAGG over a 100 TB group is a driver-killer, the top-k
  cap is the deployable shape.  Deterministic WITHIN GROUP ordering with
  a name tiebreak; DuckDB twin is string_agg(... ORDER BY).

- ``hll_union_rollup`` — the Apache DataSketches HLL surface
  (hll_sketch_agg / hll_union_agg / hll_sketch_estimate): per-event-type
  user sketches UNIONED into the all-types row — the mergeable-sketch
  rollup (the approximate twin of bitmap_distinct_rollup; union happens
  on sketch state, not raw data).  Oracle-exactness follows the
  approx_count_distinct convention: the plan computes the exact distinct
  alongside and emits (exact, estimate-within-5%%), so the sketch's
  correctness contract is verified without hashing the estimate itself.

- ``permutation_test_hash`` — the randomization twin of
  bootstrap_mean_ci_hash: 32 deterministic label-flip resamples (row
  joins the other group iff the portable 60-bit hash of (id, b) is even —
  exchangeability under H0), each resample's mean difference from exact
  integer-cents sums with a fixed two-division IEEE order; the observed
  statistic rides along as resample -1, so the consumer reads the
  p-value straight off the emitted rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .dedup import h60_duck, h60_spark
from .ranking import global_row_number, ntile_of
from .relational import events_tbl, tbl

# ---------------------------------------------------------------------------
# cumulative_gains_lift
# ---------------------------------------------------------------------------

_GAINS_ORACLE = """
WITH users AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS score,
         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS pos
  FROM events WHERE user_id IS NOT NULL
  GROUP BY user_id
),
ranked AS (
  SELECT *, NTILE(10) OVER (ORDER BY score DESC, user_id) AS decile FROM users
),
per AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users, CAST(SUM(pos) AS BIGINT) AS n_pos
  FROM ranked GROUP BY decile
),
tot AS (SELECT SUM(n_users) AS tu, SUM(n_pos) AS tp FROM per),
cum AS (
  SELECT a.decile, a.n_users, a.n_pos,
         CAST(SUM(b.n_users) AS BIGINT) AS cum_users,
         CAST(SUM(b.n_pos) AS BIGINT) AS cum_pos
  FROM per a JOIN per b ON b.decile <= a.decile
  GROUP BY a.decile, a.n_users, a.n_pos
)
SELECT c.decile, c.n_users, c.n_pos, c.cum_users, c.cum_pos,
       CASE WHEN t.tp = 0 THEN 0.0
            ELSE CAST(c.cum_pos * t.tu AS DOUBLE) / CAST(c.cum_users * t.tp AS DOUBLE)
       END AS lift
FROM cum c CROSS JOIN tot t
"""


@register(
    "cumulative_gains_lift",
    oracle=_GAINS_ORACLE,
    description="Model-eval decile gains/lift table: NTILE(10) from the "
    "two-pass global ranking, per-decile positives, cumulative gains via "
    "the 10x10 micro-table theta join (no global window); lift = exact "
    "BIGINT cross-products with one IEEE division",
    tags=("analytics", "evaluation", "ranking", "extension"),
)
def cumulative_gains_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = (
        events_tbl(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("score"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("pos"),
        )
    )
    ranked, n = global_row_number(users, order_by=[F.col("score").desc(), F.col("user_id")])
    per = (
        ranked.withColumn("decile", ntile_of(F.col("rn"), n, 10))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("pos").cast("long").alias("n_pos"),
        )
    )
    tot = per.agg(F.sum("n_users").alias("tu"), F.sum("n_pos").alias("tp"))
    a = per.alias("a")
    b = per.alias("b")
    cum = (
        a.join(F.broadcast(b), F.col("b.decile") <= F.col("a.decile"))
        .groupBy(F.col("a.decile"), F.col("a.n_users"), F.col("a.n_pos"))
        .agg(
            F.sum("b.n_users").cast("long").alias("cum_users"),
            F.sum("b.n_pos").cast("long").alias("cum_pos"),
        )
        .select(
            F.col("a.decile").alias("decile"),
            F.col("a.n_users").alias("n_users"),
            F.col("a.n_pos").alias("n_pos"),
            "cum_users",
            "cum_pos",
        )
    )
    return cum.crossJoin(F.broadcast(tot)).select(
        "decile",
        "n_users",
        "n_pos",
        "cum_users",
        "cum_pos",
        F.when(F.col("tp") == 0, F.lit(0.0))
        .otherwise(
            (F.col("cum_pos") * F.col("tu")).cast("double")
            / (F.col("cum_users") * F.col("tp")).cast("double")
        )
        .alias("lift"),
    )


# ---------------------------------------------------------------------------
# listagg_order_report
# ---------------------------------------------------------------------------

_LISTAGG_ORACLE = """
WITH ranked AS (
  SELECT c.c_nationkey, c.c_name, c.c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c.c_nationkey
                            ORDER BY c.c_acctbal DESC, c.c_name) AS rk
  FROM customer c
),
top5 AS (SELECT * FROM ranked WHERE rk <= 5)
SELECT n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_listed,
       string_agg(t.c_name, ',' ORDER BY t.rk) AS roster
FROM top5 t JOIN nation n ON n.n_nationkey = t.c_nationkey
GROUP BY n.n_name
"""


@register(
    "listagg_order_report",
    oracle=_LISTAGG_ORACLE,
    description="LISTAGG ... WITHIN GROUP (Spark 4 surface): per-nation "
    "roster of the top-5 customers by balance — the window top-k BOUNDS "
    "the string before aggregation (unbounded LISTAGG over a 100 TB group "
    "is a driver-killer); deterministic order with a name tiebreak",
    tags=("agg", "string", "window", "extension"),
)
def listagg_order_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = tbl(spark, sf_dir, "customer")
    nation = tbl(spark, sf_dir, "nation")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_name"))
    top5 = (
        customer.select("c_nationkey", "c_name", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 5)
    )
    return (
        top5.join(F.broadcast(nation), top5.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_listed"),
            F.expr("listagg(c_name, ',') WITHIN GROUP (ORDER BY rk)").alias("roster"),
        )
    )


# ---------------------------------------------------------------------------
# hll_union_rollup
# ---------------------------------------------------------------------------

_HLL_ORACLE = """
WITH ev AS (SELECT event_type, user_id FROM events WHERE user_id IS NOT NULL),
per AS (
  SELECT event_type AS key, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM ev GROUP BY event_type
)
SELECT key, n_exact, TRUE AS hll_within_tol FROM per
UNION ALL
SELECT 'ALL' AS key, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS hll_within_tol
FROM ev
"""


@register(
    "hll_union_rollup",
    oracle=_HLL_ORACLE,
    description="Apache DataSketches HLL rollup: per-event-type user "
    "sketches (hll_sketch_agg) merged into the ALL row via hll_union_agg "
    "— the rollup happens on SKETCH STATE, not raw data (the approximate "
    "twin of bitmap_distinct_rollup); verified by the "
    "approx_count_distinct convention (exact distinct computed in-plan, "
    "estimate asserted within 5%)",
    tags=("sketch", "rollup", "agg", "extension"),
)
def hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
    )
    per = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact"),
        F.expr("hll_sketch_agg(user_id)").alias("sk"),
    )
    typed = per.select(
        F.col("event_type").alias("key"),
        "n_exact",
        (
            F.abs(F.expr("hll_sketch_estimate(sk)") - F.col("n_exact"))
            <= F.col("n_exact") * F.lit(0.05)
        ).alias("hll_within_tol"),
    )
    # the ALL row merges the per-type sketches — raw data is NOT rescanned
    # for the estimate; the exact side is one more distinct for the contract
    total_exact = ev.agg(F.countDistinct("user_id").cast("long").alias("n_exact"))
    merged = per.agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
    all_row = total_exact.crossJoin(F.broadcast(merged)).select(
        F.lit("ALL").alias("key"),
        "n_exact",
        (F.abs(F.col("est") - F.col("n_exact")) <= F.col("n_exact") * F.lit(0.05)).alias(
            "hll_within_tol"
        ),
    )
    return typed.unionAll(all_row)


# ---------------------------------------------------------------------------
# permutation_test_hash
# ---------------------------------------------------------------------------

_PERM_B = 32


def _perm_oracle() -> str:
    h = h60_duck("'pm|' || CAST(event_id AS VARCHAR) || '|' || CAST(b.b AS VARCHAR)")
    return f"""
WITH ev AS (
  SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g
  FROM events WHERE value IS NOT NULL AND event_type IN ('purchase', 'click')
),
obs AS (
  SELECT CAST(-1 AS BIGINT) AS resample,
         CAST(SUM(g) AS BIGINT) AS n1, CAST(SUM(1 - g) AS BIGINT) AS n2,
         CAST(SUM(g * cents) AS DOUBLE) / SUM(g)
           - CAST(SUM((1 - g) * cents) AS DOUBLE) / SUM(1 - g) AS mean_diff
  FROM ev
),
flipped AS (
  SELECT b.b, cents,
         CASE WHEN ({h}) % 2 = 0 THEN 1 ELSE 0 END AS g
  FROM ev CROSS JOIN (SELECT UNNEST(range(0, {_PERM_B})) AS b) b
),
res AS (
  SELECT CAST(b AS BIGINT) AS resample,
         CAST(SUM(g) AS BIGINT) AS n1, CAST(SUM(1 - g) AS BIGINT) AS n2,
         CAST(SUM(g * cents) AS DOUBLE) / SUM(g)
           - CAST(SUM((1 - g) * cents) AS DOUBLE) / SUM(1 - g) AS mean_diff
  FROM flipped GROUP BY b
  HAVING SUM(g) > 0 AND SUM(1 - g) > 0
)
SELECT * FROM obs WHERE n1 > 0 AND n2 > 0
UNION ALL
SELECT * FROM res
"""


@register(
    "permutation_test_hash",
    oracle=_perm_oracle(),
    description=f"Hash-deterministic randomization test: {_PERM_B} "
    "label-flip resamples (row joins group 1 iff the portable 60-bit hash "
    "of (id, b) is even — exchangeable under H0, no RNG state), each "
    "mean difference from exact integer-cents sums in a fixed "
    "two-division IEEE order; the observed statistic rides along as "
    "resample -1 so the p-value reads straight off the rows",
    tags=("analytics", "statistics", "sampling", "extension"),
)
def permutation_test_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = h60_spark("'pm|' || CAST(event_id AS STRING) || '|' || CAST(b AS STRING)")
    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("value").isNotNull() & F.col("event_type").isin("purchase", "click"))
        .select(
            "event_id",
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("g"),
        )
    )

    def stat(df: DataFrame, keys: list[str]) -> DataFrame:
        agg = df.groupBy(*keys).agg(
            F.sum("g").cast("long").alias("n1"),
            F.sum(1 - F.col("g")).cast("long").alias("n2"),
            F.sum(F.col("g") * F.col("cents")).alias("s1"),
            F.sum((1 - F.col("g")) * F.col("cents")).alias("s2"),
        )
        return agg.filter((F.col("n1") > 0) & (F.col("n2") > 0)).select(
            *keys,
            "n1",
            "n2",
            (
                F.col("s1").cast("double") / F.col("n1")
                - F.col("s2").cast("double") / F.col("n2")
            ).alias("mean_diff"),
        )

    obs = stat(ev.withColumn("resample", F.lit(-1).cast("long")), ["resample"])
    flipped = ev.select(
        "cents",
        "event_id",
        F.explode(F.array(*[F.lit(b) for b in range(_PERM_B)])).alias("b"),
    ).select(
        F.col("b").cast("long").alias("resample"),
        "cents",
        F.expr(f"CASE WHEN ({h}) % 2 = 0 THEN 1 ELSE 0 END").alias("g"),
    )
    res = stat(flipped, ["resample"])
    return obs.unionAll(res)
