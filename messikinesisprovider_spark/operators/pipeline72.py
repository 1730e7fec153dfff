"""Round 5 additions, part 4: classical statistics on contingency
micro-tables — rank correlation, one-way ANOVA, MCC, autocorrelation, and a
functional-dependency profiler. Determinism rules as everywhere in this
repo: counts and scaled ranks stay in exact int64, decimal sums for double
terms, ONE double division (or an IEEE sqrt, which is correctly rounded by
definition) at the end.

- ``kendall_tau_exact`` — tie-corrected Kendall tau-b between lineitem
  quantity and discount. The corpus reduces to a (quantity, discount-pm)
  contingency table (bounded by the VALUE DOMAIN, 50x11, never by n);
  concordant/discordant pair counts are cell-pair theta joins over that
  micro-table (the eval_auc_exact shape), tie terms come from the marginals.
- ``spearman_rho_exact`` — tie-aware Spearman rho on the same pair:
  average ranks per distinct value are DOUBLED into exact integers
  (2*avg_rank is always integral), so every Pearson-on-ranks moment is an
  exact int64 sum; rho is scale-invariant, one double expression at the end.
- ``anova_f_oneway`` — one-way ANOVA F over order priorities on prices
  quantized to exact integer cents: per-group (n, sum, sum-of-squares)
  moments are exact integers/decimals end-to-end (no double->decimal cast
  anywhere — the wide-decimal rounding trap); the one order-sensitive double
  reduction (sum over groups of s_g^2/n_g) runs as a sequential fold over
  the groups sorted by name (array_sort+aggregate == list_sort+list_sum).
- ``eval_mcc_binary`` — Matthews correlation over the ECE/Brier
  hash-forecast construction (pred = per-mille score >= 500): four exact
  confusion counts, MCC with factor-wise double casts (products can pass
  2^53 at corpus scale; per-factor casts keep both engines on the identical
  IEEE sequence).
- ``acf_daily_lags`` — autocorrelation of the daily event-value series at
  lags 1..7: the series is a |days| micro-table from one scan-and-aggregate;
  lag pairing is an equi-join on day+k; deviation products summed
  decimal-exact against the lag-0 denominator.
- ``functional_dependency_audit`` — data-profiling staple: for five
  candidate FDs (one that must hold, four that must not), the number of
  LHS groups, violating groups (>1 distinct RHS), and the worst group's
  RHS variant count — each FD one map-side-combined groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import events_tbl, spread, tbl

# ---------------------------------------------------------------------------
# kendall_tau_exact
# ---------------------------------------------------------------------------

_KENDALL_ORACLE = """
WITH base AS (
  SELECT CAST(l_quantity AS BIGINT) AS x,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS y
  FROM lineitem WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
),
cells AS (SELECT x, y, COUNT(*) AS n FROM base GROUP BY x, y),
cd AS (
  SELECT COALESCE(SUM(CASE WHEN a.y < b.y THEN a.n * b.n END), 0) AS conc,
         COALESCE(SUM(CASE WHEN a.y > b.y THEN a.n * b.n END), 0) AS disc
  FROM cells a JOIN cells b ON a.x < b.x
),
mx AS (
  SELECT COALESCE(SUM(nx * (nx - 1) / 2), 0) AS n1 FROM (
    SELECT SUM(n) AS nx FROM cells GROUP BY x)
),
my AS (
  SELECT COALESCE(SUM(ny * (ny - 1) / 2), 0) AS n2 FROM (
    SELECT SUM(n) AS ny FROM cells GROUP BY y)
),
tot AS (SELECT COALESCE(SUM(n), 0) AS nn FROM cells)
SELECT CAST(nn AS BIGINT) AS n,
       CAST(conc AS BIGINT) AS concordant,
       CAST(disc AS BIGINT) AS discordant,
       CAST(n1 AS BIGINT) AS ties_x,
       CAST(n2 AS BIGINT) AS ties_y,
       CASE WHEN nn >= 2 AND (nn * (nn - 1) / 2 - n1) > 0
                 AND (nn * (nn - 1) / 2 - n2) > 0
            THEN CAST(ROUND((conc - disc) /
                 sqrt(CAST(nn * (nn - 1) / 2 - n1 AS DOUBLE)
                      * CAST(nn * (nn - 1) / 2 - n2 AS DOUBLE)), 6) AS DOUBLE)
       END AS tau_b
FROM cd, mx, my, tot
"""


@register(
    "kendall_tau_exact",
    oracle=_KENDALL_ORACLE,
    description="Tie-corrected Kendall tau-b (quantity vs discount) from a "
    "domain-bounded contingency table: exact concordant/discordant pair "
    "counts via cell-pair theta joins, marginal tie terms, one sqrt",
    tags=("statistics", "extension"),
)
def kendall_tau_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        tbl(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity").isNotNull() & F.col("l_discount").isNotNull())
        .select(
            F.col("l_quantity").cast("long").alias("x"),
            F.round(F.col("l_discount") * 100).cast("long").alias("y"),
        )
    )
    cells = base.groupBy("x", "y").agg(F.count(F.lit(1)).alias("n")).persist()
    a = cells.select(F.col("x").alias("xa"), F.col("y").alias("ya"), F.col("n").alias("na"))
    b = cells.select(F.col("x").alias("xb"), F.col("y").alias("yb"), F.col("n").alias("nb"))
    cd = a.join(b, F.col("xa") < F.col("xb")).agg(
        F.coalesce(
            F.sum(F.when(F.col("ya") < F.col("yb"), F.col("na") * F.col("nb"))), F.lit(0)
        ).alias("conc"),
        F.coalesce(
            F.sum(F.when(F.col("ya") > F.col("yb"), F.col("na") * F.col("nb"))), F.lit(0)
        ).alias("disc"),
    )
    mx = (
        cells.groupBy("x")
        .agg(F.sum("n").alias("nx"))
        .agg(F.coalesce(F.sum(F.expr("nx * (nx - 1) / 2")), F.lit(0)).alias("n1"))
    )
    my = (
        cells.groupBy("y")
        .agg(F.sum("n").alias("ny"))
        .agg(F.coalesce(F.sum(F.expr("ny * (ny - 1) / 2")), F.lit(0)).alias("n2"))
    )
    tot = cells.agg(F.coalesce(F.sum("n"), F.lit(0)).alias("nn"))
    return (
        cd.crossJoin(mx)
        .crossJoin(my)
        .crossJoin(tot)
        .select(
            F.col("nn").cast("long").alias("n"),
            F.col("conc").cast("long").alias("concordant"),
            F.col("disc").cast("long").alias("discordant"),
            F.col("n1").cast("long").alias("ties_x"),
            F.col("n2").cast("long").alias("ties_y"),
            F.when(
                (F.col("nn") >= 2)
                & (F.expr("nn * (nn - 1) / 2 - n1") > 0)
                & (F.expr("nn * (nn - 1) / 2 - n2") > 0),
                F.round(
                    (F.col("conc") - F.col("disc"))
                    / F.sqrt(
                        F.expr("CAST(nn * (nn - 1) / 2 - n1 AS DOUBLE)")
                        * F.expr("CAST(nn * (nn - 1) / 2 - n2 AS DOUBLE)")
                    ),
                    6,
                ),
            ).alias("tau_b"),
        )
    )


# ---------------------------------------------------------------------------
# spearman_rho_exact
# ---------------------------------------------------------------------------

# Doubled average ranks: for value v, 2*avg_rank = 2*cnt_less + cnt_eq + 1 —
# always an integer, so Pearson-on-ranks moments stay exact int64.
_SPEARMAN_ORACLE = """
WITH base AS (
  SELECT CAST(l_quantity AS BIGINT) AS x,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS y
  FROM lineitem WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
),
cells AS (SELECT x, y, COUNT(*) AS n FROM base GROUP BY x, y),
margx AS (SELECT x, SUM(n) AS nx FROM cells GROUP BY x),
rx AS (
  SELECT a.x, 2 * COALESCE(SUM(b.nx), 0) + a.nx + 1 AS r2
  FROM margx a LEFT JOIN margx b ON b.x < a.x
  GROUP BY a.x, a.nx
),
margy AS (SELECT y, SUM(n) AS ny FROM cells GROUP BY y),
ry AS (
  SELECT a.y, 2 * COALESCE(SUM(b.ny), 0) + a.ny + 1 AS r2
  FROM margy a LEFT JOIN margy b ON b.y < a.y
  GROUP BY a.y, a.ny
),
mom AS (
  -- Cubic moments (n * r2 * r2) exceed int64 beyond ~1.3M rows (4n^3);
  -- widen to DECIMAL before multiplying — 10+12+12 digit factors stay
  -- inside DECIMAL(38,0) on both engines (same widening on the Spark side).
  SELECT SUM(c.n) AS nn,
         SUM(CAST(c.n AS DECIMAL(10,0)) * CAST(rx.r2 AS DECIMAL(12,0))) AS sx,
         SUM(CAST(c.n AS DECIMAL(10,0)) * CAST(ry.r2 AS DECIMAL(12,0))) AS sy,
         SUM(CAST(c.n AS DECIMAL(10,0)) * CAST(rx.r2 AS DECIMAL(12,0))
             * CAST(rx.r2 AS DECIMAL(12,0))) AS sxx,
         SUM(CAST(c.n AS DECIMAL(10,0)) * CAST(ry.r2 AS DECIMAL(12,0))
             * CAST(ry.r2 AS DECIMAL(12,0))) AS syy,
         SUM(CAST(c.n AS DECIMAL(10,0)) * CAST(rx.r2 AS DECIMAL(12,0))
             * CAST(ry.r2 AS DECIMAL(12,0))) AS sxy
  FROM cells c JOIN rx ON rx.x = c.x JOIN ry ON ry.y = c.y
)
SELECT CAST(nn AS BIGINT) AS n,
       CASE WHEN nn >= 2
                 AND (CAST(nn AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                 AND (CAST(nn AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
            THEN CAST(ROUND(
              (CAST(nn AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
              sqrt((CAST(nn AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * (CAST(nn AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
              AS DOUBLE)
       END AS rho
FROM mom
"""


@register(
    "spearman_rho_exact",
    oracle=_SPEARMAN_ORACLE,
    description="Tie-aware Spearman rho (Pearson on doubled average ranks — "
    "2*avg_rank is always integral, so every moment is an exact int64 sum); "
    "rank tables are domain-bounded marginal micro-tables",
    tags=("statistics", "extension"),
)
def spearman_rho_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        tbl(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity").isNotNull() & F.col("l_discount").isNotNull())
        .select(
            F.col("l_quantity").cast("long").alias("x"),
            F.round(F.col("l_discount") * 100).cast("long").alias("y"),
        )
    )
    cells = base.groupBy("x", "y").agg(F.count(F.lit(1)).alias("n")).persist()
    margx = cells.groupBy("x").agg(F.sum("n").alias("nx"))
    ma = margx.select(F.col("x").alias("xa"), F.col("nx").alias("nxa"))
    mb = margx.select(F.col("x").alias("xb"), F.col("nx").alias("nxb"))
    rx = (
        ma.join(mb, F.col("xb") < F.col("xa"), "left")
        .groupBy("xa", "nxa")
        .agg((2 * F.coalesce(F.sum("nxb"), F.lit(0)) + F.col("nxa") + 1).alias("r2"))
        .select(F.col("xa").alias("x"), "r2")
    )
    margy = cells.groupBy("y").agg(F.sum("n").alias("ny"))
    na = margy.select(F.col("y").alias("ya"), F.col("ny").alias("nya"))
    nb = margy.select(F.col("y").alias("yb"), F.col("ny").alias("nyb"))
    ry = (
        na.join(nb, F.col("yb") < F.col("ya"), "left")
        .groupBy("ya", "nya")
        .agg((2 * F.coalesce(F.sum("nyb"), F.lit(0)) + F.col("nya") + 1).alias("r2"))
        .select(F.col("ya").alias("y"), F.col("r2").alias("r2y"))
    )
    # Decimal-widened moments (mirror of the oracle's CAST ladder): the cubic
    # products overflow int64 past ~1.3M rows; 10+12+12-digit decimal factors
    # keep every term inside DECIMAL(38,0) with bit-identical values.
    nd = F.col("n").cast("decimal(10,0)")
    r2d = F.col("r2").cast("decimal(12,0)")
    r2yd = F.col("r2y").cast("decimal(12,0)")
    mom = (
        cells.join(rx, "x")
        .join(ry, "y")
        .agg(
            F.sum("n").alias("nn"),
            F.sum(nd * r2d).alias("sx"),
            F.sum(nd * r2yd).alias("sy"),
            F.sum(nd * r2d * r2d).alias("sxx"),
            F.sum(nd * r2yd * r2yd).alias("syy"),
            F.sum(nd * r2d * r2yd).alias("sxy"),
        )
    )
    varx = F.expr(
        "CAST(nn AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
    )
    vary = F.expr(
        "CAST(nn AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
    )
    return mom.select(
        F.col("nn").cast("long").alias("n"),
        F.when(
            (F.col("nn") >= 2) & (varx > 0) & (vary > 0),
            F.round(
                F.expr(
                    "CAST(nn AS DOUBLE) * CAST(sxy AS DOUBLE) "
                    "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
                )
                / F.sqrt(varx * vary),
                6,
            ),
        )
        .cast("double")
        .alias("rho"),
    )


# ---------------------------------------------------------------------------
# anova_f_oneway
# ---------------------------------------------------------------------------

# Determinism: group moments are decimal-exact sums cast to double (the
# proven dsum primitive); the one order-sensitive double reduction —
# sum over groups of s_g^2/n_g — runs as a SEQUENTIAL fold over the groups
# sorted by name (array_sort+aggregate in Spark == list_sort+list_sum in
# DuckDB, the _DOT vector convention lifted to group level). Never cast a
# COMPUTED double back to decimal (the wide-decimal rounding trap the edge
# fixture caught in the first version of this query).
_ANOVA_ORACLE = """
WITH base AS (
  SELECT o_orderpriority AS grp,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS xc
  FROM orders
  WHERE o_totalprice IS NOT NULL AND abs(o_totalprice) < 1e12
),
g AS (
  SELECT grp, COUNT(*) AS n_g,
         SUM(CAST(xc AS DECIMAL(38,0))) AS s_dec,
         SUM(CAST(xc AS DECIMAL(19,0)) * xc) AS q_dec
  FROM base
  GROUP BY grp
),
tot AS (
  SELECT COUNT(*) AS k, SUM(n_g) AS n,
         CAST(SUM(s_dec) AS DOUBLE) AS s,
         CAST(SUM(q_dec) AS DOUBLE) AS q,
         list_sum(list_transform(
           list_sort(list(struct_pack(grp := grp,
                                      sd := CAST(s_dec AS DOUBLE),
                                      ng := n_g))),
           e -> e.sd * e.sd / e.ng)) AS sb_raw
  FROM g
)
SELECT CAST(k AS BIGINT) AS n_groups,
       CAST(n AS BIGINT) AS n_rows,
       CAST((sb_raw - s * s / n) / 10000.0 AS DOUBLE) AS ss_between,
       CAST((q - sb_raw) / 10000.0 AS DOUBLE) AS ss_within,
       CASE WHEN k >= 2 AND n > k AND (q - sb_raw) > 0
            THEN CAST(ROUND(((sb_raw - s * s / n) / (k - 1))
                            / ((q - sb_raw) / (n - k)), 6) AS DOUBLE)
       END AS f_stat
FROM tot
"""


@register(
    "anova_f_oneway",
    oracle=_ANOVA_ORACLE,
    description="One-way ANOVA F statistic (order totals across the 5 "
    "priorities) from decimal-exact per-group moments; between/within sums "
    "of squares in closed form, divisions only at the end",
    tags=("statistics", "extension"),
)
def anova_f_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        spread(tbl(spark, sf_dir, "orders"))
        .where(
            F.col("o_totalprice").isNotNull() & (F.abs("o_totalprice") < F.lit(1e12))
        )
        .select(
            F.col("o_orderpriority").alias("grp"),
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("xc"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_g"),
            F.expr("SUM(CAST(xc AS DECIMAL(38,0)))").alias("s_dec"),
            F.expr("SUM(CAST(xc AS DECIMAL(19,0)) * xc)").alias("q_dec"),
        )
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_g").alias("n"),
        F.expr("CAST(SUM(s_dec) AS DOUBLE)").alias("s"),
        F.expr("CAST(SUM(q_dec) AS DOUBLE)").alias("q"),
        # sequential fold over groups sorted by name — the one
        # order-sensitive double reduction, made order-deterministic
        F.expr(
            "aggregate(array_sort(collect_list(struct(grp, "
            "CAST(s_dec AS DOUBLE) AS sd, n_g AS ng))), 0D, "
            "(acc, e) -> acc + e.sd * e.sd / e.ng)"
        ).alias("sb_raw"),
    )
    return tot.select(
        F.col("k").cast("long").alias("n_groups"),
        F.col("n").cast("long").alias("n_rows"),
        F.expr("(sb_raw - s * s / n) / 10000.0").cast("double").alias("ss_between"),
        F.expr("(q - sb_raw) / 10000.0").cast("double").alias("ss_within"),
        F.when(
            (F.col("k") >= 2) & (F.col("n") > F.col("k")) & (F.expr("q - sb_raw") > 0),
            F.round(
                F.expr("((sb_raw - s * s / n) / (k - 1)) / ((q - sb_raw) / (n - k))"),
                6,
            ),
        )
        .cast("double")
        .alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# eval_mcc_binary
# ---------------------------------------------------------------------------

_MCC_ORACLE = f"""
WITH preds AS (
  SELECT CASE WHEN {h60_duck("CAST(doc_id AS VARCHAR) || '|s'")} % 1000 >= 500
              THEN 1 ELSE 0 END AS pred,
         CASE WHEN {h60_duck("CAST(doc_id AS VARCHAR) || '|l'")} % 3 = 0
              THEN 1 ELSE 0 END AS y
  FROM documents
),
cm AS (
  SELECT COALESCE(SUM(CASE WHEN pred = 1 AND y = 1 THEN 1 END), 0) AS tp,
         COALESCE(SUM(CASE WHEN pred = 1 AND y = 0 THEN 1 END), 0) AS fp,
         COALESCE(SUM(CASE WHEN pred = 0 AND y = 1 THEN 1 END), 0) AS fn,
         COALESCE(SUM(CASE WHEN pred = 0 AND y = 0 THEN 1 END), 0) AS tn
  FROM preds
)
SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       CASE WHEN (tp + fp) > 0 AND (tp + fn) > 0 AND (tn + fp) > 0 AND (tn + fn) > 0
            THEN CAST(ROUND(
              (CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn) /
              sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
                   * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)), 6) AS DOUBLE)
       END AS mcc
FROM cm
"""


@register(
    "eval_mcc_binary",
    oracle=_MCC_ORACLE,
    description="Matthews correlation coefficient over the hash-forecast "
    "construction (pred = per-mille score >= 500): four exact confusion "
    "counts, factor-wise double casts, one sqrt",
    tags=("eval", "statistics", "extension"),
)
def eval_mcc_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    preds = spread(tbl(spark, sf_dir, "documents")).select(
        F.expr(
            "CASE WHEN "
            + h60_spark("CAST(doc_id AS STRING) || '|s'")
            + " % 1000 >= 500 THEN 1 ELSE 0 END"
        ).alias("pred"),
        F.expr(
            "CASE WHEN "
            + h60_spark("CAST(doc_id AS STRING) || '|l'")
            + " % 3 = 0 THEN 1 ELSE 0 END"
        ).alias("y"),
    )
    cm = preds.agg(
        F.coalesce(F.sum(F.when((F.col("pred") == 1) & (F.col("y") == 1), 1)), F.lit(0)).alias("tp"),
        F.coalesce(F.sum(F.when((F.col("pred") == 1) & (F.col("y") == 0), 1)), F.lit(0)).alias("fp"),
        F.coalesce(F.sum(F.when((F.col("pred") == 0) & (F.col("y") == 1), 1)), F.lit(0)).alias("fn"),
        F.coalesce(F.sum(F.when((F.col("pred") == 0) & (F.col("y") == 0), 1)), F.lit(0)).alias("tn"),
    )
    ok = (
        (F.col("tp") + F.col("fp") > 0)
        & (F.col("tp") + F.col("fn") > 0)
        & (F.col("tn") + F.col("fp") > 0)
        & (F.col("tn") + F.col("fn") > 0)
    )
    return cm.select(
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.col("tn").cast("long").alias("tn"),
        F.when(
            ok,
            F.round(
                (F.col("tp").cast("double") * F.col("tn") - F.col("fp").cast("double") * F.col("fn"))
                / F.sqrt(
                    (F.col("tp") + F.col("fp")).cast("double")
                    * (F.col("tp") + F.col("fn")).cast("double")
                    * (F.col("tn") + F.col("fp")).cast("double")
                    * (F.col("tn") + F.col("fn")).cast("double")
                ),
                6,
            ),
        )
        .cast("double")
        .alias("mcc"),
    )


# ---------------------------------------------------------------------------
# acf_daily_lags
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 7

_ACF_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CAST(COALESCE(value, 0) AS DECIMAL(18,6))) AS DOUBLE) AS x
  FROM events GROUP BY 1
),
m AS (
  SELECT COUNT(*) AS nd,
         CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS mu,
         CAST(SUM(CAST((x - (SELECT CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE)
                              / COUNT(*) FROM daily))
                        * (x - (SELECT CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE)
                              / COUNT(*) FROM daily)) AS DECIMAL(38,12))) AS DOUBLE) AS den
  FROM daily
),
lags AS (SELECT UNNEST(range(1, {_ACF_MAX_LAG + 1})) AS lag),
num AS (
  SELECT l.lag, COUNT(*) AS n_pairs,
         CAST(SUM(CAST((a.x - m.mu) * (b.x - m.mu) AS DECIMAL(38,12))) AS DOUBLE) AS num
  FROM lags l
  JOIN daily a ON TRUE
  JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)
  CROSS JOIN m
  GROUP BY l.lag
)
SELECT CAST(l.lag AS BIGINT) AS lag,
       CAST(COALESCE(n.n_pairs, 0) AS BIGINT) AS n_pairs,
       CASE WHEN m.den > 0 AND n.num IS NOT NULL
            THEN CAST(ROUND(n.num / m.den, 6) AS DOUBLE) END AS acf
FROM lags l LEFT JOIN num n ON n.lag = l.lag CROSS JOIN m
ORDER BY lag
"""


@register(
    "acf_daily_lags",
    oracle=_ACF_ORACLE,
    description=f"Autocorrelation of the daily event-value series at lags "
    f"1..{_ACF_MAX_LAG}: |days| micro-series from one scan, equi-join lag "
    "pairing, deviation products summed decimal-exact over the lag-0 "
    "denominator",
    tags=("timeseries", "statistics", "extension"),
)
def acf_daily_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        events_tbl(spark, sf_dir)
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(COALESCE(value, 0) AS DECIMAL(18,6))) AS DOUBLE)"
            ).alias("x")
        )
        .persist()
    )
    mu = daily.agg(
        F.count(F.lit(1)).alias("nd"),
        (
            F.expr("CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE)") / F.count(F.lit(1))
        ).alias("mu"),
    )
    dev = daily.crossJoin(F.broadcast(mu)).select(
        "day", "x", "mu", "nd", ((F.col("x") - F.col("mu"))).alias("d")
    )
    den = dev.agg(
        F.expr("CAST(SUM(CAST(d * d AS DECIMAL(38,12))) AS DOUBLE)").alias("den")
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    a = dev.select(F.col("day").alias("day_a"), F.col("d").alias("da"))
    b = dev.select(F.col("day").alias("day_b"), F.col("d").alias("db"))
    pairs = (
        lags.crossJoin(a)
        .join(
            b,
            F.col("day_b") == F.expr("date_add(day_a, CAST(lag AS INT))"),
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.expr("CAST(SUM(CAST(da * db AS DECIMAL(38,12))) AS DOUBLE)").alias("num"),
        )
    )
    return (
        lags.join(pairs, "lag", "left")
        .crossJoin(F.broadcast(den))
        .select(
            F.col("lag").cast("long").alias("lag"),
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias("n_pairs"),
            F.when(
                (F.col("den") > 0) & F.col("num").isNotNull(),
                F.round(F.col("num") / F.col("den"), 6),
            )
            .cast("double")
            .alias("acf"),
        )
        .orderBy("lag")
    )


# ---------------------------------------------------------------------------
# functional_dependency_audit
# ---------------------------------------------------------------------------

_FD_ORACLE = """
WITH fd1 AS (
  SELECT 'customer: c_custkey -> c_mktsegment' AS fd,
         COUNT(*) AS n_lhs, COALESCE(SUM(CASE WHEN v > 1 THEN 1 END), 0) AS n_violating,
         COALESCE(MAX(v), 0) AS max_rhs_variants
  FROM (SELECT c_custkey, COUNT(DISTINCT c_mktsegment) AS v FROM customer GROUP BY 1)
),
fd2 AS (
  SELECT 'orders: o_custkey -> o_orderpriority' AS fd,
         COUNT(*) AS n_lhs, COALESCE(SUM(CASE WHEN v > 1 THEN 1 END), 0) AS n_violating,
         COALESCE(MAX(v), 0) AS max_rhs_variants
  FROM (SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS v FROM orders GROUP BY 1)
),
fd3 AS (
  SELECT 'lineitem: l_orderkey -> l_returnflag' AS fd,
         COUNT(*) AS n_lhs, COALESCE(SUM(CASE WHEN v > 1 THEN 1 END), 0) AS n_violating,
         COALESCE(MAX(v), 0) AS max_rhs_variants
  FROM (SELECT l_orderkey, COUNT(DISTINCT l_returnflag) AS v FROM lineitem GROUP BY 1)
),
fd4 AS (
  SELECT 'events: user_id -> event_type' AS fd,
         COUNT(*) AS n_lhs, COALESCE(SUM(CASE WHEN v > 1 THEN 1 END), 0) AS n_violating,
         COALESCE(MAX(v), 0) AS max_rhs_variants
  FROM (SELECT user_id, COUNT(DISTINCT event_type) AS v FROM events GROUP BY 1)
),
fd5 AS (
  SELECT 'documents: lang -> source' AS fd,
         COUNT(*) AS n_lhs, COALESCE(SUM(CASE WHEN v > 1 THEN 1 END), 0) AS n_violating,
         COALESCE(MAX(v), 0) AS max_rhs_variants
  FROM (SELECT lang, COUNT(DISTINCT source) AS v FROM documents GROUP BY 1)
)
SELECT fd, CAST(n_lhs AS BIGINT) AS n_lhs,
       CAST(n_violating AS BIGINT) AS n_violating,
       CAST(max_rhs_variants AS BIGINT) AS max_rhs_variants
FROM (SELECT * FROM fd1 UNION ALL SELECT * FROM fd2 UNION ALL SELECT * FROM fd3
      UNION ALL SELECT * FROM fd4 UNION ALL SELECT * FROM fd5)
"""


@register(
    "functional_dependency_audit",
    oracle=_FD_ORACLE,
    description="Data-profiling FD check: for five candidate functional "
    "dependencies (the key-derived one must hold, the behavioral ones must "
    "not), LHS group counts, violating groups (>1 distinct RHS) and the "
    "worst group's variant count — one map-side groupBy per FD",
    tags=("profiling", "quality", "extension"),
)
def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def fd(df: DataFrame, name: str, lhs: str, rhs: str) -> DataFrame:
        per = df.groupBy(lhs).agg(F.countDistinct(rhs).alias("v"))
        return per.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).cast("long").alias("n_lhs"),
            F.coalesce(F.sum(F.when(F.col("v") > 1, 1)), F.lit(0))
            .cast("long")
            .alias("n_violating"),
            F.coalesce(F.max("v"), F.lit(0)).cast("long").alias("max_rhs_variants"),
        )
    parts = [
        fd(tbl(spark, sf_dir, "customer"), "customer: c_custkey -> c_mktsegment", "c_custkey", "c_mktsegment"),
        fd(tbl(spark, sf_dir, "orders"), "orders: o_custkey -> o_orderpriority", "o_custkey", "o_orderpriority"),
        fd(tbl(spark, sf_dir, "lineitem"), "lineitem: l_orderkey -> l_returnflag", "l_orderkey", "l_returnflag"),
        fd(events_tbl(spark, sf_dir), "events: user_id -> event_type", "user_id", "event_type"),
        fd(tbl(spark, sf_dir, "documents"), "documents: lang -> source", "lang", "source"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
