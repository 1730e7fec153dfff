"""Round 6 additions, part 2: SQL-surface + classical-statistics batch.

Nine oracle-exact queries extending the relational surface (running
DISTINCT-count windows, inline VALUES dimensions, bitwise aggregates,
equi-width histograms, deterministic per-group reservoirs, referential
audits) and the nonparametric/association statistics family started in
pipeline72 (Kruskal-Wallis H completes the Mann-Whitney/ANOVA trio;
Welch's t and Cramér's V complete the two-sample and contingency pair).

Determinism conventions (registry.py): integer/decimal arithmetic end to
end, value-domain contingency tables with DOUBLED average ranks (2*avg_rank
= 2*cnt_less + cnt_eq + 1 is always integral), the sequential group-sorted
fold (array_sort + aggregate == list_sort + list_sum) for the rare
reduction that must mix doubles before the final division, and single IEEE
divisions/sqrt only at the very end.

Reference parity note: the reference engine (a Kinesis-protocol streaming
provider, SURVEY.md §0) has no analytics surface; these extend the batch
side per the round brief's training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .dedup import h60_duck, h60_spark
from .ranking import global_row_number
from .relational import events_tbl, spread, tbl

# ---------------------------------------------------------------------------
# window_count_distinct
# ---------------------------------------------------------------------------

_WCD_ORACLE = """
WITH base AS (
  SELECT event_id, user_id, ts, event_type,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
)
SELECT event_id, user_id, event_type,
       CAST(SUM(first_seen) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS BIGINT)
         AS distinct_types_so_far
FROM base
"""


@register(
    "window_count_distinct",
    oracle=_WCD_ORACLE,
    description="Running COUNT(DISTINCT) over a window — neither engine "
    "allows DISTINCT aggregates in window frames, so it is rewritten as a "
    "first-occurrence flag (row_number = 1 per (user, type)) + running sum",
    tags=("relational", "window", "distinct", "extension"),
)
def window_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard rewrite for windowed distinct counts: two window passes
    that shuffle on the SAME key (user_id), so the second pass reuses the
    first's partitioning (one exchange in the plan). No state beyond the
    window frames; linear at any scale."""
    base = (
        events_tbl(spark, sf_dir)
        .where(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .select("event_id", "user_id", "ts", "event_type")
    )
    w_first = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        base.withColumn(
            "first_seen",
            F.when(F.row_number().over(w_first) == 1, F.lit(1)).otherwise(F.lit(0)),
        )
        .withColumn("distinct_types_so_far", F.sum("first_seen").over(w_run).cast("long"))
        .select("event_id", "user_id", "event_type", "distinct_types_so_far")
    )


# ---------------------------------------------------------------------------
# histogram_equiwidth
# ---------------------------------------------------------------------------

_EW_BUCKETS = 20
_EW_LO_CENTS = 0
_EW_HI_CENTS = 60_000_000  # 600k in cents — covers the o_totalprice domain

_EW_ORACLE = f"""
WITH base AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_totalprice IS NOT NULL
),
b AS (
  SELECT LEAST({_EW_BUCKETS - 1},
               GREATEST(0, (cents - {_EW_LO_CENTS}) * {_EW_BUCKETS}
                           // ({_EW_HI_CENTS} - {_EW_LO_CENTS}))) AS bucket,
         cents
  FROM base
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST({_EW_LO_CENTS} + bucket * ({_EW_HI_CENTS} - {_EW_LO_CENTS}) / {_EW_BUCKETS} AS BIGINT)
         AS lo_cents,
       COUNT(*) AS n,
       CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) / 100.0 AS total
FROM b GROUP BY bucket
"""


@register(
    "histogram_equiwidth",
    oracle=_EW_ORACLE,
    description=f"Equi-width histogram ({_EW_BUCKETS} buckets over the order-"
    "total domain) with exact integer bucketing on cents — the WIDTH_BUCKET "
    "shape without float boundary hazards; complements histogram_equidepth",
    tags=("statistics", "histogram", "extension"),
)
def histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket assignment is pure integer arithmetic (cents * k // range), so
    Spark and DuckDB can never disagree at a boundary the way float
    WIDTH_BUCKET implementations can. One map-side-combined aggregation on a
    20-value key; linear, no shuffle pressure at any scale."""
    width = _EW_HI_CENTS - _EW_LO_CENTS
    b = (
        spread(tbl(spark, sf_dir, "orders"))
        .where(F.col("o_totalprice").isNotNull())
        .select(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"))
        .select(
            "cents",
            F.expr(
                f"LEAST({_EW_BUCKETS - 1}, GREATEST(0, "
                f"(cents - {_EW_LO_CENTS}) * {_EW_BUCKETS} DIV {width}))"
            ).alias("bucket"),
        )
    )
    return b.groupBy("bucket").agg(
        F.expr(f"CAST({_EW_LO_CENTS} + bucket * {width} / {_EW_BUCKETS} AS BIGINT)").alias(
            "lo_cents"
        ),
        F.count(F.lit(1)).alias("n"),
        (F.expr("CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE)") / F.lit(100.0)).alias(
            "total"
        ),
    ).select("bucket", "lo_cents", "n", "total")


# ---------------------------------------------------------------------------
# values_inline_dim_join
# ---------------------------------------------------------------------------

_PRIORITY_WEIGHTS = [
    ("1-URGENT", 5),
    ("2-HIGH", 4),
    ("3-MEDIUM", 3),
    ("4-NOT SPECIFIED", 2),
    ("5-LOW", 1),
]

_VALUES_SQL = ", ".join(f"('{p}', {w})" for p, w in _PRIORITY_WEIGHTS)

_VALUES_ORACLE = f"""
WITH dim(priority, weight) AS (VALUES {_VALUES_SQL})
SELECT d.priority, d.weight,
       COUNT(o.o_orderkey) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS DECIMAL(38,0)) * d.weight)
            AS DOUBLE) / 100.0 AS weighted_total
FROM dim d LEFT JOIN orders o ON o.o_orderpriority = d.priority
GROUP BY d.priority, d.weight
"""


@register(
    "values_inline_dim_join",
    oracle=_VALUES_ORACLE,
    description="Inline VALUES dimension (priority → weight) LEFT-joined to "
    "the fact table with an exact weighted-cents rollup — the literal-dim "
    "pattern (broadcast hash join, dim side O(1))",
    tags=("relational", "join", "values", "extension"),
)
def values_inline_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-below-the-join: the fact side collapses to one
    map-side-combined row per priority FIRST, so the dim-preserving outer
    join is micro × micro (broadcast hash join, no fact shuffle at all —
    Spark cannot broadcast the preserved side of an outer join, so joining
    the raw fact table dim-first would force a sort-merge shuffle on a
    5-value skewed key). Weighted cents distribute over the group, so the
    result is identical to weighting per row; sums stay DECIMAL until the
    single final cast."""
    dim = spark.createDataFrame(_PRIORITY_WEIGHTS, "priority string, weight int")
    agg = (
        tbl(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.expr("SUM(CAST(ROUND(o_totalprice * 100) AS DECIMAL(38,0)))").alias(
                "cents"
            ),
        )
    )
    return dim.join(F.broadcast(agg), "priority", "left").select(
        "priority",
        "weight",
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        (
            F.expr("CAST(cents * weight AS DOUBLE)") / F.lit(100.0)
        ).alias("weighted_total"),
    )


# ---------------------------------------------------------------------------
# bit_agg_flags
# ---------------------------------------------------------------------------

# event_type -> power-of-two flag bit (deterministic CASE, same in both
# engines; unknown/null types contribute 0)
_TYPE_BITS = [("view", 1), ("click", 2), ("cart", 4), ("purchase", 8)]
_BITS_CASE = (
    "CASE "
    + " ".join(f"WHEN event_type = '{t}' THEN {b}" for t, b in _TYPE_BITS)
    + " ELSE 0 END"
)

_BITAGG_ORACLE = f"""
WITH base AS (
  SELECT user_id, {_BITS_CASE} AS flag
  FROM events WHERE user_id IS NOT NULL
)
SELECT user_id,
       CAST(BIT_OR(flag) AS BIGINT) AS types_any,
       CAST(BIT_AND(flag) AS BIGINT) AS types_all,
       CAST(BIT_XOR(flag) AS BIGINT) AS types_parity,
       COUNT(*) AS n_events
FROM base GROUP BY user_id
"""


@register(
    "bit_agg_flags",
    oracle=_BITAGG_ORACLE,
    description="Bitwise aggregate surface: per-user BIT_OR / BIT_AND / "
    "BIT_XOR over event-type flag bits — the bitmap-rollup shape (set "
    "membership in one integer per user)",
    tags=("relational", "aggregate", "bitwise", "extension"),
)
def bit_agg_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates are associative-commutative integer folds: exact
    under any shuffle order, map-side combined, one narrow shuffle on
    user_id. The bitmap-per-entity output is the compact form feature
    stores use for set-membership flags."""
    base = (
        events_tbl(spark, sf_dir)
        .where(F.col("user_id").isNotNull())
        .select("user_id", F.expr(_BITS_CASE).alias("flag"))
    )
    return base.groupBy("user_id").agg(
        F.expr("CAST(BIT_OR(flag) AS BIGINT)").alias("types_any"),
        F.expr("CAST(BIT_AND(flag) AS BIGINT)").alias("types_all"),
        F.expr("CAST(BIT_XOR(flag) AS BIGINT)").alias("types_parity"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# kruskal_wallis_h
# ---------------------------------------------------------------------------

# Tie-corrected Kruskal-Wallis H across the 5 order priorities, on integer
# cents, with DOUBLED average ranks r2 (always integral): the rank-sum
# identity gives
#   H = 3 * sum_g(R2_g^2 / n_g) / (N (N+1)) - 3 (N + 1)
# (R2_g = sum of doubled ranks in group g = 2 * R_g), corrected for ties by
#   H' = H / (1 - sum_v(t_v^3 - t_v) / (N^3 - N)).
# Unlike spearman/kendall (pipeline72), o_totalprice's value domain is NOT
# bounded — ~N distinct cents values — so the doubled ranks come from the
# TWO-PASS GLOBAL RANKING (running sum over the value marginal, the
# mann_whitney machinery: r2 = 2*cum_incl - nv + 1), never from a
# cumulative theta join (measured 570 s at sf0.1 on ~150k marginal rows —
# the quadratic that bounded-domain contingency tables never hit).
# Every moment is exact (decimal-widened integer products); the one
# order-sensitive double reduction — sum over the 5 groups of R2_g^2/n_g —
# runs as the sequential group-sorted fold.
_KW_ORACLE = f"""
WITH base AS (
  SELECT o_orderpriority AS grp, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS xc
  FROM orders WHERE o_totalprice IS NOT NULL
),
cells AS (SELECT grp, xc, COUNT(*) AS n FROM base GROUP BY grp, xc),
margv AS (SELECT xc, SUM(n) AS nv FROM cells GROUP BY xc),
rv AS (
  SELECT xc, 2 * SUM(nv) OVER (ORDER BY xc
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - nv + 1 AS r2
  FROM margv
),
g AS (
  SELECT c.grp, SUM(c.n) AS n_g,
         SUM(CAST(c.n AS DECIMAL(10,0)) * CAST(rv.r2 AS DECIMAL(12,0))) AS r2_g
  FROM cells c JOIN rv ON rv.xc = c.xc
  GROUP BY c.grp
),
ties AS (
  SELECT SUM(CAST(nv AS DECIMAL(12,0)) * nv * nv - nv) AS t
  FROM margv
),
tot AS (
  SELECT COUNT(*) AS k, SUM(n_g) AS n,
         list_sum(list_transform(
           list_sort(list(struct_pack(grp := grp,
                                      rd := CAST(r2_g AS DOUBLE),
                                      ng := n_g))),
           e -> e.rd * e.rd / e.ng)) AS s_raw
  FROM g
)
SELECT CAST(tot.k AS BIGINT) AS n_groups,
       CAST(tot.n AS BIGINT) AS n_rows,
       CASE WHEN tot.n >= 2 AND CAST(ties.t AS DOUBLE)
                 < CAST(tot.n AS DOUBLE) * tot.n * tot.n - tot.n
            THEN CAST(ROUND(
              (3.0 * tot.s_raw / (CAST(tot.n AS DOUBLE) * (tot.n + 1))
               - 3.0 * (tot.n + 1))
              / (1.0 - CAST(ties.t AS DOUBLE)
                       / (CAST(tot.n AS DOUBLE) * tot.n * tot.n - tot.n)), 6)
              AS DOUBLE)
       END AS h_stat
FROM tot CROSS JOIN ties
"""


@register(
    "kruskal_wallis_h",
    oracle=_KW_ORACLE,
    description="Tie-corrected Kruskal-Wallis H (rank one-way test across "
    "the 5 priorities) from a value-domain contingency table with doubled "
    "average ranks — completes the nonparametric trio with Mann-Whitney U "
    "and the parametric anova_f_oneway",
    tags=("statistics", "extension"),
)
def kruskal_wallis_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank computation never sorts the fact table: doubled average ranks
    come from a two-pass global RUNNING SUM over the value marginal
    (range-partitioned, no single-partition window, no cumulative theta
    join — o_totalprice's domain is ~N distinct values, so the pipeline72
    contingency-join trick would be quadratic here), and group rank-sums
    are decimal-exact products folded back over the contingency cells. The
    only doubles are the final 5-term group fold (sequential, group-sorted)
    and the closing H formula."""
    # No spread() here (round 9, measured): the pre-exchange map work is a
    # ROUND + cast — trivial — so the keyless repartition's SPARK-23207
    # pre-shuffle sort cost more than the parallelism bought (A/B min-of-2:
    # spread 2.35 s vs scan-direct 1.88 s for the cells+rank core). The
    # decimal-exact rank-sum products run AFTER the cells exchange, already
    # parallel.
    base = (
        tbl(spark, sf_dir, "orders")
        .where(F.col("o_totalprice").isNotNull())
        .select(
            F.col("o_orderpriority").alias("grp"),
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("xc"),
        )
    )
    cells = base.groupBy("grp", "xc").agg(F.count(F.lit(1)).alias("n")).persist()
    margv = cells.groupBy("xc").agg(F.sum("n").alias("nv"))
    # two-pass global running sum over the (unbounded) value marginal —
    # r2 = 2*cum_incl - nv + 1; never a cumulative theta join here
    ranked, _n = global_row_number(
        margv, order_by=["xc"], rn_col="_rn", running_sums={"nv": "cumv"}
    )
    rv = ranked.select(
        "xc", (2 * F.col("cumv") - F.col("nv") + 1).alias("r2")
    )
    g = (
        cells.join(rv, "xc")
        .groupBy("grp")
        .agg(
            F.sum("n").alias("n_g"),
            F.sum(
                F.col("n").cast("decimal(10,0)") * F.col("r2").cast("decimal(12,0)")
            ).alias("r2_g"),
        )
    )
    ties = margv.agg(
        F.sum(
            F.col("nv").cast("decimal(12,0)") * F.col("nv") * F.col("nv") - F.col("nv")
        ).alias("t")
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(grp, "
            "CAST(r2_g AS DOUBLE) AS rd, n_g AS ng))), 0D, "
            "(acc, e) -> acc + e.rd * e.rd / e.ng)"
        ).alias("s_raw"),
    )
    return (
        tot.crossJoin(F.broadcast(ties))
        .select(
            F.col("k").cast("long").alias("n_groups"),
            F.col("n").cast("long").alias("n_rows"),
            F.when(
                (F.col("n") >= 2)
                & (
                    F.expr("CAST(t AS DOUBLE)")
                    < F.expr("CAST(n AS DOUBLE) * n * n - n")
                ),
                F.round(
                    F.expr(
                        "(3.0 * s_raw / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1)) "
                        "/ (1.0 - CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * n * n - n))"
                    ),
                    6,
                ),
            )
            .cast("double")
            .alias("h_stat"),
        )
    )


# ---------------------------------------------------------------------------
# welch_t_test
# ---------------------------------------------------------------------------

_WELCH_ORACLE = """
WITH base AS (
  SELECT o_orderstatus AS grp, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS xc
  FROM orders
  WHERE o_totalprice IS NOT NULL AND o_orderstatus IN ('F', 'O')
),
g AS (
  SELECT grp, COUNT(*) AS n,
         CAST(SUM(CAST(xc AS DECIMAL(38,0))) AS DOUBLE) AS s,
         CAST(SUM(CAST(xc AS DECIMAL(19,0)) * xc) AS DOUBLE) AS q
  FROM base GROUP BY grp
),
w AS (
  SELECT MAX(CASE WHEN grp = 'F' THEN n END) AS n1,
         MAX(CASE WHEN grp = 'F' THEN s END) AS s1,
         MAX(CASE WHEN grp = 'F' THEN q END) AS q1,
         MAX(CASE WHEN grp = 'O' THEN n END) AS n2,
         MAX(CASE WHEN grp = 'O' THEN s END) AS s2,
         MAX(CASE WHEN grp = 'O' THEN q END) AS q2
  FROM g
)
SELECT CAST(n1 AS BIGINT) AS n_f, CAST(n2 AS BIGINT) AS n_o,
       CAST(ROUND((s1 / n1 - s2 / n2) / 100.0, 4) AS DOUBLE) AS mean_diff,
       CASE WHEN n1 >= 2 AND n2 >= 2
                 AND ((q1 - s1 * s1 / n1) / (n1 - 1) / n1
                      + (q2 - s2 * s2 / n2) / (n2 - 1) / n2) > 0
            THEN CAST(ROUND((s1 / n1 - s2 / n2)
                   / sqrt((q1 - s1 * s1 / n1) / (n1 - 1) / n1
                          + (q2 - s2 * s2 / n2) / (n2 - 1) / n2), 6) AS DOUBLE)
       END AS t_stat,
       CASE WHEN n1 >= 2 AND n2 >= 2
                 AND ((q1 - s1 * s1 / n1) / (n1 - 1) / n1
                      + (q2 - s2 * s2 / n2) / (n2 - 1) / n2) > 0
            THEN CAST(ROUND(
              ((q1 - s1 * s1 / n1) / (n1 - 1) / n1
               + (q2 - s2 * s2 / n2) / (n2 - 1) / n2)
              * ((q1 - s1 * s1 / n1) / (n1 - 1) / n1
                 + (q2 - s2 * s2 / n2) / (n2 - 1) / n2)
              / (((q1 - s1 * s1 / n1) / (n1 - 1) / n1)
                 * ((q1 - s1 * s1 / n1) / (n1 - 1) / n1) / (n1 - 1)
                 + ((q2 - s2 * s2 / n2) / (n2 - 1) / n2)
                   * ((q2 - s2 * s2 / n2) / (n2 - 1) / n2) / (n2 - 1)), 2)
              AS DOUBLE)
       END AS welch_df
FROM w
"""


@register(
    "welch_t_test",
    oracle=_WELCH_ORACLE,
    description="Welch's unequal-variance t test (finished vs open orders) "
    "from decimal-exact per-group moments — t statistic and Welch-"
    "Satterthwaite df in closed form, IEEE ops only at the end",
    tags=("statistics", "extension"),
)
def welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two map-side-combined moment aggregations (count / decimal sum /
    decimal sum of squares) pivoted to one row; every downstream expression
    is a fixed-order scalar formula over the six moments, so engine
    agreement is exact. The same two scans any two-sample test needs at
    100 TB — no row-level work beyond the moments."""
    g = (
        spread(tbl(spark, sf_dir, "orders"))
        .where(F.col("o_totalprice").isNotNull() & F.col("o_orderstatus").isin("F", "O"))
        .select(
            F.col("o_orderstatus").alias("grp"),
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("xc"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("CAST(SUM(CAST(xc AS DECIMAL(38,0))) AS DOUBLE)").alias("s"),
            F.expr("CAST(SUM(CAST(xc AS DECIMAL(19,0)) * xc) AS DOUBLE)").alias("q"),
        )
    )
    w = g.agg(
        F.expr("MAX(CASE WHEN grp = 'F' THEN n END)").alias("n1"),
        F.expr("MAX(CASE WHEN grp = 'F' THEN s END)").alias("s1"),
        F.expr("MAX(CASE WHEN grp = 'F' THEN q END)").alias("q1"),
        F.expr("MAX(CASE WHEN grp = 'O' THEN n END)").alias("n2"),
        F.expr("MAX(CASE WHEN grp = 'O' THEN s END)").alias("s2"),
        F.expr("MAX(CASE WHEN grp = 'O' THEN q END)").alias("q2"),
    )
    se2_1 = "(q1 - s1 * s1 / n1) / (n1 - 1) / n1"
    se2_2 = "(q2 - s2 * s2 / n2) / (n2 - 1) / n2"
    se2 = f"({se2_1} + {se2_2})"
    guard = (F.col("n1") >= 2) & (F.col("n2") >= 2) & (F.expr(se2) > 0)
    return w.select(
        F.col("n1").cast("long").alias("n_f"),
        F.col("n2").cast("long").alias("n_o"),
        F.round(F.expr("(s1 / n1 - s2 / n2) / 100.0"), 4).cast("double").alias("mean_diff"),
        F.when(guard, F.round(F.expr(f"(s1 / n1 - s2 / n2) / sqrt{se2}"), 6))
        .cast("double")
        .alias("t_stat"),
        F.when(
            guard,
            F.round(
                F.expr(
                    f"{se2} * {se2} / (({se2_1}) * ({se2_1}) / (n1 - 1) "
                    f"+ ({se2_2}) * ({se2_2}) / (n2 - 1))"
                ),
                2,
            ),
        )
        .cast("double")
        .alias("welch_df"),
    )


# ---------------------------------------------------------------------------
# cramers_v_association
# ---------------------------------------------------------------------------

_CRAMER_ORACLE = """
WITH cells AS (
  SELECT o_orderpriority AS r, o_orderstatus AS c, COUNT(*) AS n
  FROM orders
  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
  GROUP BY o_orderpriority, o_orderstatus
),
marg_r AS (SELECT r, SUM(n) AS nr FROM cells GROUP BY r),
marg_c AS (SELECT c, SUM(n) AS nc FROM cells GROUP BY c),
tot AS (SELECT SUM(n) AS nn FROM cells),
chi AS (
  SELECT list_sum(list_transform(
           list_sort(list(struct_pack(r := cells.r, c := cells.c,
                                      o := CAST(cells.n AS DOUBLE),
                                      e := CAST(marg_r.nr AS DOUBLE) * marg_c.nc / tot.nn))),
           x -> (x.o - x.e) * (x.o - x.e) / x.e)) AS chi2,
         MAX(tot.nn) AS nn,
         COUNT(DISTINCT cells.r) AS nrv,
         COUNT(DISTINCT cells.c) AS ncv
  FROM cells JOIN marg_r ON marg_r.r = cells.r
             JOIN marg_c ON marg_c.c = cells.c
             CROSS JOIN tot
)
SELECT CAST(nn AS BIGINT) AS n_rows,
       CAST(ROUND(chi2, 6) AS DOUBLE) AS chi2,
       CASE WHEN nn > 0 AND LEAST(nrv, ncv) >= 2
            THEN CAST(ROUND(sqrt(chi2 / (nn * (LEAST(nrv, ncv) - 1))), 6) AS DOUBLE)
       END AS cramers_v
FROM chi
"""


@register(
    "cramers_v_association",
    oracle=_CRAMER_ORACLE,
    description="Cramér's V association strength for the priority × status "
    "contingency table — chi-square over a domain-bounded micro-table with "
    "the sequential cell-sorted fold, one sqrt at the end",
    tags=("statistics", "association", "extension"),
)
def cramers_v_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The contingency table is bounded by the VALUE DOMAIN (5 priorities x
    3 statuses), so everything after the one fact-table aggregation is
    micro-table algebra. Expected counts mix doubles, so the chi-square sum
    runs as the sequential cell-sorted fold (the anova/KW convention)."""
    cells = (
        spread(tbl(spark, sf_dir, "orders"))
        .where(F.col("o_orderpriority").isNotNull() & F.col("o_orderstatus").isNotNull())
        .groupBy(F.col("o_orderpriority").alias("r"), F.col("o_orderstatus").alias("c"))
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    marg_r = cells.groupBy("r").agg(F.sum("n").alias("nr"))
    marg_c = cells.groupBy("c").agg(F.sum("n").alias("nc"))
    tot = cells.agg(F.sum("n").alias("nn"))
    chi = (
        cells.join(marg_r, "r")
        .join(marg_c, "c")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(r, c, "
                "CAST(n AS DOUBLE) AS o, "
                "CAST(nr AS DOUBLE) * nc / nn AS e))), 0D, "
                "(acc, x) -> acc + (x.o - x.e) * (x.o - x.e) / x.e)"
            ).alias("chi2"),
            F.max("nn").alias("nn"),
            F.countDistinct("r").alias("nrv"),
            F.countDistinct("c").alias("ncv"),
        )
    )
    return chi.select(
        F.col("nn").cast("long").alias("n_rows"),
        F.round(F.col("chi2"), 6).cast("double").alias("chi2"),
        F.when(
            (F.col("nn") > 0) & (F.least("nrv", "ncv") >= 2),
            F.round(
                F.sqrt(F.col("chi2") / (F.col("nn") * (F.least("nrv", "ncv") - 1))), 6
            ),
        )
        .cast("double")
        .alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# sample_reservoir_hash
# ---------------------------------------------------------------------------

_RESERVOIR_K = 7

_RESERVOIR_ORACLE = f"""
SELECT source, doc_id, lang
FROM (
  SELECT source, doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY {h60_duck("CAST(doc_id AS VARCHAR) || '|rsv'")},
                                     doc_id) AS rn
  FROM documents
  WHERE source IS NOT NULL
) WHERE rn <= {_RESERVOIR_K}
"""


@register(
    "sample_reservoir_hash",
    oracle=_RESERVOIR_ORACLE,
    description=f"Deterministic per-group reservoir: exactly min(k={_RESERVOIR_K}, n) "
    "docs per source, selected by portable-hash order — the fixed-size "
    "counterpart of the fraction-based sample_stratified_hash",
    tags=("sampling", "reservoir", "extension"),
)
def sample_reservoir_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-rank top-k per group is the distributed, re-runnable reservoir:
    every executor ranks its partition's rows by the same hash, so the
    result is independent of partitioning and replayable (unlike
    TABLESAMPLE, which is neither). One window shuffle on the group key;
    with a heavy-hitter group, pre-aggregate per-partition top-k feeds the
    window (Spark's TakeOrderedAndProject does this for global top-k)."""
    w = W.partitionBy("source").orderBy(
        F.expr(h60_spark("CAST(doc_id AS STRING) || '|rsv'")), F.col("doc_id")
    )
    return (
        tbl(spark, sf_dir, "documents")
        .where(F.col("source").isNotNull())
        .select("source", "doc_id", "lang")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _RESERVOIR_K)
        .select("source", "doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# dq_referential_orphans
# ---------------------------------------------------------------------------

_ORPHAN_ORACLE = """
WITH rels AS (
  SELECT 'orders.o_custkey->customer' AS rel,
         COUNT(*) AS n_child,
         COALESCE(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 END), 0) AS n_orphans
  FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
  UNION ALL
  SELECT 'lineitem.l_partkey->part',
         COUNT(*),
         COALESCE(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 END), 0)
  FROM lineitem l LEFT JOIN part p ON p.p_partkey = l.l_partkey
  UNION ALL
  SELECT 'lineitem.l_suppkey->supplier',
         COUNT(*),
         COALESCE(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 END), 0)
  FROM lineitem l LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey
)
SELECT rel, CAST(n_child AS BIGINT) AS n_child,
       CAST(n_orphans AS BIGINT) AS n_orphans,
       n_orphans = 0 AS fk_intact
FROM rels
"""


@register(
    "dq_referential_orphans",
    oracle=_ORPHAN_ORACLE,
    description="Referential-integrity audit: orphan counts for the three "
    "core FK relationships (orders→customer, lineitem→part/supplier) via "
    "broadcast left joins — the data-contract check every warehouse load runs",
    tags=("quality", "audit", "join", "extension"),
)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each relationship is one broadcast (dim-side) left join + counting
    aggregate — at 100 TB the dim keys fit executor memory long before the
    facts do, so no fact shuffle happens at all. Three independent legs
    union into the audit report."""

    def leg(rel, child, ckey, dim, dkey):
        c = tbl(spark, sf_dir, child)
        d = tbl(spark, sf_dir, dim).select(dkey)
        joined = c.join(F.broadcast(d), c[ckey] == d[dkey], "left")
        return joined.agg(
            F.lit(rel).alias("rel"),
            F.count(F.lit(1)).alias("n_child"),
            F.coalesce(
                F.sum(F.when(F.col(dkey).isNull(), F.lit(1))), F.lit(0)
            ).alias("n_orphans"),
        )

    out = (
        leg("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey")
        .unionAll(leg("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"))
        .unionAll(
            leg("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey")
        )
    )
    return out.select(
        "rel",
        F.col("n_child").cast("long").alias("n_child"),
        F.col("n_orphans").cast("long").alias("n_orphans"),
        (F.col("n_orphans") == 0).alias("fk_intact"),
    )
