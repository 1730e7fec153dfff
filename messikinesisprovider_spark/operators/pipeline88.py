"""Round 7 additions, part 1: FILTER-clause aggregates, Hilbert-curve
layout audit, a two-half-step HITS ranking, and Holt linear-trend
smoothing.

- ``filtered_aggregates_report``: the SQL:2003 ``agg FILTER (WHERE ...)``
  surface — conditional aggregation without CASE rewriting (the
  ``conditional_agg`` family's standard-syntax twin). All four aggregate
  flavors (plain count, filtered count, filtered decimal sum, filtered
  distinct count) in ONE map-side-combined pass over orders.
- ``hilbert_curve_layout``: the Hilbert-curve twin of
  ``zorder_morton_layout`` (lakeops.py): d = xy2d(x, y) computed by the
  standard bottom-up bit algorithm (8 rounds, state packed into one BIGINT
  so the fold is a single integer-typed ``aggregate``/``list_reduce`` in
  both engines). Hilbert preserves locality strictly better than Morton
  (no quadrant jumps), which is why lakehouse OPTIMIZE implementations
  offer it next to Z-order; the audit reports per-bucket key envelopes.
- ``graph_hits_step``: hubs-and-authorities (Kleinberg, J.ACM 1999) —
  two half-iterations from the uniform start on the shared co-purchase
  edge table, kept in exact integers (no normalization inside the loop:
  score RATIOS are what HITS ranks by, and integer weighted sums are
  oracle-exact). Output: top-50 vertices by the round-2 authority score.
- ``forecast_holt_linear``: Holt's linear-trend double exponential
  smoothing per event_type over the daily value series, alpha=1/2 and
  beta=1/4 (dyadic coefficients: every smoothing step is one IEEE add
  chain + exact power-of-two scalings, evaluated by an identical
  sequential fold in both engines). Completes the forecasting family
  next to snaive backtest and EWMA.

Reference parity note: the reference engine (SURVEY.md §0) has no
analytics surface; these extend the batch side per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .graphshared import copurchase_edges
from .relational import events_tbl, spread, tbl

# ---------------------------------------------------------------------------
# filtered_aggregates_report
# ---------------------------------------------------------------------------

_FILTERED_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_all,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_revenue,
       CAST(COUNT(DISTINCT o_custkey)
            FILTER (WHERE o_totalprice > 150000) AS BIGINT) AS n_big_spenders
FROM orders
GROUP BY o_orderpriority
"""


@register(
    "filtered_aggregates_report",
    oracle=_FILTERED_ORACLE,
    description="SQL:2003 FILTER-clause aggregates (count / decimal sum / "
    "distinct count, each with its own predicate) in one pass over orders "
    "— the standard-syntax twin of the CASE-based conditional_agg family",
    tags=("aggregation", "sql-surface", "extension"),
)
def filtered_aggregates_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One map-side-combined aggregate; each FILTER predicate becomes a
    per-row mask inside the same partial-aggregation pass (no extra scan,
    no self-join — the plan a 100 TB conditional report needs)."""
    o = spread(tbl(spark, sf_dir, "orders"))
    return o.groupBy("o_orderpriority").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_all"),
        F.expr("CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)").alias(
            "n_finished"
        ),
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) "
            "FILTER (WHERE o_orderstatus = 'O') AS DOUBLE)"
        ).alias("open_revenue"),
        F.expr(
            "CAST(COUNT(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 150000) AS BIGINT)"
        ).alias("n_big_spenders"),
    )


# ---------------------------------------------------------------------------
# hilbert_curve_layout
# ---------------------------------------------------------------------------
#
# xy2d for an order-8 curve (256x256 grid), the standard bottom-up loop:
#   for s in (128, 64, ..., 1):
#       rx = (x div s) mod 2; ry = (y div s) mod 2
#       d += s*s * ((3*rx) XOR ry)
#       if ry == 0: { if rx == 1: x, y = N-1-x, N-1-y }; swap(x, y)
# State (x, y, d) packed into one BIGINT (x + 256*y + 65536*d) so the fold
# is integer-typed end to end; the XOR on the two flag bits is spelled as a
# CASE so no engine-specific bit operator enters the expression.

_HILBERT_N = 256
_HB = 14  # bucket = d div 2^14 -> 4 buckets per full curve


def _hilbert_step(idiv: str) -> str:
    """One fold step: `acc` is the packed state, `s` the block size.
    `idiv` is the engine's integer-division spelling."""

    def dv(a: str, b: str) -> str:
        return idiv.format(a=a, b=b)

    x = f"({dv('acc', '1')} % 256)"  # dv('acc','1') keeps acc integer-typed
    y = f"({dv('acc', '256')} % 256)"
    d = dv("acc", "65536")
    rx = f"({dv(x, 's')} % 2)"
    ry = f"({dv(y, 's')} % 2)"
    quad = (
        f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
        f"WHEN {rx} = 0 THEN 1 WHEN {ry} = 1 THEN 2 ELSE 3 END)"
    )
    xr = f"(CASE WHEN {rx} = 1 THEN {_HILBERT_N - 1} - {x} ELSE {x} END)"
    yr = f"(CASE WHEN {rx} = 1 THEN {_HILBERT_N - 1} - {y} ELSE {y} END)"
    # ry = 0: reflect (when rx = 1) then swap; ry = 1: pass through
    nx = f"(CASE WHEN {ry} = 0 THEN {yr} ELSE {x} END)"
    ny = f"(CASE WHEN {ry} = 0 THEN {xr} ELSE {y} END)"
    return f"{nx} + 256 * {ny} + 65536 * ({d} + s * s * {quad})"


def hilbert_d_spark(xcol: str, ycol: str) -> str:
    steps = _hilbert_step("({a} DIV {b})")
    init = f"CAST({xcol} + 256 * {ycol} AS BIGINT)"
    return (
        f"(aggregate(array(128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L), {init}, "
        f"(acc, s) -> {steps}) DIV 65536)"
    )


def hilbert_d_duck(xcol: str, ycol: str) -> str:
    steps = _hilbert_step("({a} // {b})")
    init = f"CAST({xcol} + 256 * {ycol} AS BIGINT)"
    return (
        f"(list_reduce(list_prepend({init}, "
        f"[128, 64, 32, 16, 8, 4, 2, 1]::BIGINT[]), "
        f"(acc, s) -> {steps}) // 65536)"
    )


_HILBERT_ORACLE = f"""
WITH coded AS (
  SELECT l_partkey % 256 AS hx, l_suppkey % 256 AS hy,
         {hilbert_d_duck('(l_partkey % 256)', '(l_suppkey % 256)')} AS hd
  FROM lineitem
)
SELECT hd // {1 << _HB} AS h_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(hx) AS BIGINT) AS min_x, CAST(MAX(hx) AS BIGINT) AS max_x,
       CAST(MIN(hy) AS BIGINT) AS min_y, CAST(MAX(hy) AS BIGINT) AS max_y
FROM coded GROUP BY 1
"""


@register(
    "hilbert_curve_layout",
    oracle=_HILBERT_ORACLE,
    description="Hilbert-curve locality audit (order-8 xy2d as one packed "
    "integer fold, whole-stage codegen): per-curve-bucket key envelopes — "
    "the strictly-better-locality twin of zorder_morton_layout",
    tags=("lakeops", "layout", "extension"),
)
def hilbert_curve_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same audit contract as the Morton version: tight per-bucket envelopes
    on BOTH keys mean parquet min/max pruning works for range predicates on
    either key after a Hilbert-ordered rewrite. The curve index itself is
    pure integer arithmetic in one codegen'd fold — no shuffle, no UDF.

    The fold's domain is the 256x256 grid, so the fact table is first
    collapsed to per-(hx, hy) counts (map-side combinable — at most 65,536
    rows survive any task) and the 8-step fold runs once per DISTINCT cell,
    not once per lineitem row. min/max/count over the cells equal the
    row-level aggregates exactly; only the fold count changes (at 100 TB:
    65,536 folds instead of trillions)."""
    li = tbl(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        (F.col("l_partkey") % 256).alias("hx"),
        (F.col("l_suppkey") % 256).alias("hy"),
    ).agg(F.count(F.lit(1)).alias("n"))
    coded = cells.select(
        "hx", "hy", "n", F.expr(hilbert_d_spark("hx", "hy")).alias("hd")
    )
    return coded.groupBy(F.expr(f"hd DIV {1 << _HB}").alias("h_bucket")).agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.min("hx").cast("long").alias("min_x"),
        F.max("hx").cast("long").alias("max_x"),
        F.min("hy").cast("long").alias("min_y"),
        F.max("hy").cast("long").alias("max_y"),
    )


# ---------------------------------------------------------------------------
# graph_hits_step
# ---------------------------------------------------------------------------

_HITS_TOPK = 50

_HITS_ORACLE = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
freq AS (SELECT l_partkey FROM op GROUP BY 1 HAVING COUNT(*) >= 2),
fop AS (SELECT op.* FROM op JOIN freq USING (l_partkey)),
e AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM fop a JOIN fop b ON a.l_orderkey = b.l_orderkey
   AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS degree FROM sym GROUP BY u),
hub1 AS (
  SELECT s.u, CAST(SUM(d.degree) AS BIGINT) AS hub_score
  FROM sym s JOIN deg d ON d.u = s.v GROUP BY s.u
),
auth2 AS (
  SELECT s.u, CAST(SUM(h.hub_score) AS BIGINT) AS auth_score
  FROM sym s JOIN hub1 h ON h.u = s.v GROUP BY s.u
)
SELECT a.u AS vertex, d.degree, h.hub_score, a.auth_score
FROM auth2 a JOIN deg d ON d.u = a.u JOIN hub1 h ON h.u = a.u
ORDER BY a.auth_score DESC, a.u LIMIT {_HITS_TOPK}
"""


@register(
    "graph_hits_step",
    oracle=_HITS_ORACLE,
    description=f"HITS hubs-and-authorities (Kleinberg 1999): two exact-integer "
    f"half-iterations from the uniform start over the shared co-purchase edge "
    f"table; top-{_HITS_TOPK} vertices by round-2 authority",
    tags=("graph", "ranking", "iterative", "extension"),
)
def graph_hits_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """auth_1 = degree (sum of unit hubs), hub_1 = sum of neighbor degrees,
    auth_2 = sum of neighbor hub_1 — each half-step is one shuffle on the
    vertex id over the symmetrized edge list (the pagerank plan shape), and
    the scores stay exact integers because HITS ranks by score RATIOS, so
    normalization can be deferred past the comparison. Top-k is
    TakeOrderedAndProject (no global sort)."""
    e = copurchase_edges(spark, sf_dir)
    sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("degree"))
    hub1 = (
        sym.join(deg.select(F.col("u").alias("v"), "degree"), "v")
        .groupBy("u")
        .agg(F.sum("degree").cast("long").alias("hub_score"))
    )
    auth2 = (
        sym.join(hub1.select(F.col("u").alias("v"), "hub_score"), "v")
        .groupBy("u")
        .agg(F.sum("hub_score").cast("long").alias("auth_score"))
    )
    return (
        auth2.join(deg, "u")
        .join(hub1, "u")
        .select(F.col("u").alias("vertex"), "degree", "hub_score", "auth_score")
        .orderBy(F.col("auth_score").desc(), "vertex")
        .limit(_HITS_TOPK)
    )


# ---------------------------------------------------------------------------
# forecast_holt_linear
# ---------------------------------------------------------------------------
#
# l_t = (x_t + l_{t-1} + b_{t-1}) / 2          (alpha = 1/2)
# b_t = (l_t - l_{t-1}) / 4 + (3*b_{t-1}) / 4  (beta  = 1/4)
# State [level, trend, seen] as a DOUBLE array; power-of-two divisions never
# round, the remaining adds/multiplies are single correctly-rounded IEEE ops
# in an identical evaluation order, so the fold is bit-exact cross-engine.

_HOLT_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS x
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
),
folded AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
         list_reduce(
           list_prepend([0.0, 0.0, 0.0], list([x, 0.0, 0.0] ORDER BY day)),
           (acc, e) -> CASE WHEN acc[3] = 0.0 THEN [e[1], 0.0, 1.0]
             ELSE [(e[1] + acc[1] + acc[2]) / 2.0,
                   ((e[1] + acc[1] + acc[2]) / 2.0 - acc[1]) / 4.0
                     + (3.0 * acc[2]) / 4.0,
                   1.0] END
         ) AS st
  FROM daily GROUP BY event_type
)
SELECT event_type, n_days,
       ROUND(st[1], 6) AS level, ROUND(st[2], 6) AS trend,
       ROUND(st[1] + st[2], 6) AS forecast_next
FROM folded
"""

_HOLT_FOLD_SPARK = """
aggregate(
  transform(array_sort(sx), s -> s.x),
  array(0D, 0D, 0D),
  (acc, x) -> IF(acc[2] = 0D, array(x, 0D, 1D),
    array((x + acc[0] + acc[1]) / 2D,
          ((x + acc[0] + acc[1]) / 2D - acc[0]) / 4D + (3D * acc[1]) / 4D,
          1D))
)
"""


@register(
    "forecast_holt_linear",
    oracle=_HOLT_ORACLE,
    description="Holt's linear-trend double exponential smoothing per "
    "event_type (alpha=1/2, beta=1/4 — dyadic coefficients, sequential "
    "day-ordered fold, bit-exact cross-engine); emits final level/trend and "
    "the one-step forecast",
    tags=("timeseries", "forecast", "extension"),
)
def forecast_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily decimal-exact totals -> one sequential fold per event_type.
    The fold state is tiny and per-key, so at 100 TB this is a map-side
    combined daily aggregate plus one skinny per-key reduce — the same
    plan EWMA uses; only the recurrence differs (level AND trend)."""
    from .dedup import bind1

    daily = (
        spread(events_tbl(spark, sf_dir))
        .filter(
            F.col("ts").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("value").isNotNull()
        )
        .groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).cast("timestamp").alias("day")
        )
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("x"))
    )
    folded = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.collect_list(F.struct("day", "x")).alias("sx"),
    )
    # bind the fold result once (CollapseProject would re-run the whole
    # fold for each of the three references below)
    body = (
        "struct(round(st[0], 6) AS level, round(st[1], 6) AS trend, "
        "round(st[0] + st[1], 6) AS forecast_next)"
    )
    out = folded.select(
        "event_type",
        "n_days",
        F.expr(bind1(_HOLT_FOLD_SPARK, "st", body)).alias("o"),
    )
    return out.select(
        "event_type", "n_days", "o.level", "o.trend", "o.forecast_next"
    )
