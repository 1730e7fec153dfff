"""Round 4 additions, part 26: FIFO lot matching and DBSCAN core points.

- ``fifo_lot_matching`` — first-in-first-out lot allocation (cost-basis
  matching, inventory consumption, payment application): every sell is
  matched against the oldest unconsumed buys.  The iterative-sounding
  rule is EXACTLY an interval intersection on the cumulative-quantity
  axis: buy i occupies [cumbuy_{i-1}, cumbuy_i), sell j occupies
  [cumsell_{j-1}, cumsell_j), and FIFO matches them on their overlap —
  two partitioned cumulative windows + one per-user pair join with a
  range residual (the per-user buy x sell fan-out is bounded by per-user
  activity, not corpus size).  All quantities are exact integers; the
  matched total provably equals min(total buys, total sells) — pinned in
  tests.

- ``dbscan_core_points`` — the density-clustering core-point step: a
  point is core iff >= minPts neighbors lie within eps.  eps doubles as
  the grid cell width and adapts to density in-plan (the geo_grid_knn
  width rule), so the 3x3 candidate set stays O(n) while the neighbor
  predicate (integer d2 <= eps^2) is exact.  Output is the neighbor-count
  histogram with the core threshold applied — the statistic the full
  DBSCAN expansion consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .dedup import h60_duck, h60_spark
from .pipeline43 import _GRID_DOMAIN, _W_DUCK, _W_SPARK
from .relational import events_tbl, tbl

# ---------------------------------------------------------------------------
# fifo_lot_matching
# ---------------------------------------------------------------------------

_CK_MOD = 1000003

_FIFO_ORACLE = f"""
WITH ev AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type IN ('purchase', 'signup') THEN 'buy'
              WHEN event_type = 'click' THEN 'sell' END AS side,
         GREATEST(1, CAST(ROUND(value) AS BIGINT)) AS qty
  FROM events
  WHERE value IS NOT NULL AND user_id IS NOT NULL
    AND event_type IN ('purchase', 'signup', 'click')
),
buys AS (
  SELECT user_id, event_id, qty,
         SUM(qty) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
  FROM ev WHERE side = 'buy'
),
sells AS (
  SELECT user_id, event_id, qty,
         SUM(qty) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
  FROM ev WHERE side = 'sell'
),
matched AS (
  SELECT b.user_id,
         b.event_id AS buy_id, s.event_id AS sell_id,
         LEAST(b.hi, s.hi) - GREATEST(b.hi - b.qty, s.hi - s.qty) AS m
  FROM buys b JOIN sells s
    ON s.user_id = b.user_id
   AND b.hi > s.hi - s.qty AND s.hi > b.hi - b.qty
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_matched_pairs,
       CAST(SUM(m) AS BIGINT) AS matched_qty,
       CAST(SUM((buy_id * 31 + sell_id) % {_CK_MOD}) AS BIGINT) AS pair_checksum
FROM matched
GROUP BY user_id
"""


@register(
    "fifo_lot_matching",
    oracle=_FIFO_ORACLE,
    description="FIFO lot allocation (cost-basis / inventory consumption) "
    "as cumulative-quantity interval intersection: two partitioned "
    "cumulative windows + one per-user pair join with a range residual "
    "(fan-out bounded by per-user activity); exact integer quantities; "
    "matched total provably = min(buys, sells)",
    tags=("analytics", "finance", "window", "join", "extension"),
)
def fifo_lot_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        events_tbl(spark, sf_dir)
        .filter(
            F.col("value").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("event_type").isin("purchase", "signup", "click")
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(F.col("event_type") == "click", F.lit("sell"))
            .otherwise(F.lit("buy"))
            .alias("side"),
            F.greatest(F.lit(1), F.expr("CAST(ROUND(value) AS BIGINT)")).alias("qty"),
        )
    )
    wcum = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )

    def side(name: str) -> DataFrame:
        return (
            ev.filter(F.col("side") == name)
            .select("user_id", "event_id", "qty", F.sum("qty").over(wcum).alias("hi"))
        )

    b = side("buy").select(
        F.col("user_id"), F.col("event_id").alias("buy_id"),
        F.col("qty").alias("bq"), F.col("hi").alias("bhi"),
    )
    s = side("sell").select(
        F.col("user_id").alias("s_user"), F.col("event_id").alias("sell_id"),
        F.col("qty").alias("sq"), F.col("hi").alias("shi"),
    )
    matched = b.join(
        s,
        (F.col("user_id") == F.col("s_user"))
        & (F.col("bhi") > F.col("shi") - F.col("sq"))
        & (F.col("shi") > F.col("bhi") - F.col("bq")),
    ).select(
        "user_id",
        "buy_id",
        "sell_id",
        (
            F.least(F.col("bhi"), F.col("shi"))
            - F.greatest(F.col("bhi") - F.col("bq"), F.col("shi") - F.col("sq"))
        ).alias("m"),
    )
    return matched.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matched_pairs"),
        F.sum("m").cast("long").alias("matched_qty"),
        F.sum((F.col("buy_id") * 31 + F.col("sell_id")) % _CK_MOD)
        .cast("long")
        .alias("pair_checksum"),
    )


# ---------------------------------------------------------------------------
# dbscan_core_points
# ---------------------------------------------------------------------------

_DBSCAN_MINPTS = 4


def _dbscan_oracle() -> str:
    hx = h60_duck("'x|' || CAST(c_custkey AS VARCHAR)")
    hy = h60_duck("'y|' || CAST(c_custkey AS VARCHAR)")
    return f"""
WITH pts0 AS (
  SELECT c_custkey AS id,
         {hx} % {_GRID_DOMAIN} AS x,
         {hy} % {_GRID_DOMAIN} AS y
  FROM customer
),
wid AS (SELECT {_W_DUCK} AS w FROM (SELECT COUNT(*) AS n FROM pts0)),
pts AS (SELECT p.*, wid.w FROM pts0 p CROSS JOIN wid),
probe AS (
  SELECT p.id, p.x, p.y, p.w,
         (p.x // p.w) + dx.d AS cx, (p.y // p.w) + dy.d AS cy
  FROM pts p
  CROSS JOIN (SELECT UNNEST([-1, 0, 1]) AS d) dx
  CROSS JOIN (SELECT UNNEST([-1, 0, 1]) AS d) dy
),
neigh AS (
  SELECT pr.id, COUNT(*) AS n_neighbors
  FROM probe pr
  JOIN pts b ON b.x // b.w = pr.cx AND b.y // b.w = pr.cy AND b.id <> pr.id
  WHERE (pr.x - b.x) * (pr.x - b.x) + (pr.y - b.y) * (pr.y - b.y) <= pr.w * pr.w
  GROUP BY pr.id
),
counts AS (
  SELECT p.id, COALESCE(n.n_neighbors, 0) AS n_neighbors
  FROM pts p LEFT JOIN neigh n ON n.id = p.id
)
SELECT CAST(n_neighbors AS BIGINT) AS n_neighbors,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       n_neighbors >= {_DBSCAN_MINPTS} AS is_core,
       CAST(SUM(id) AS BIGINT) AS id_checksum
FROM counts
GROUP BY n_neighbors
"""


@register(
    "dbscan_core_points",
    oracle=_dbscan_oracle(),
    description=f"DBSCAN core-point detection: eps = the density-adaptive "
    f"grid cell width (in-plan COUNT rule shared with geo_grid_knn), 3x3 "
    f"candidate probe, exact integer d2 <= eps^2 neighbor predicate, core "
    f"iff >= {_DBSCAN_MINPTS} neighbors; output is the neighbor-count "
    "histogram the full expansion consumes",
    tags=("ml", "clustering", "spatial", "extension"),
)
def dbscan_core_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts0 = tbl(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.expr(h60_spark("'x|' || CAST(c_custkey AS STRING)") + f" % {_GRID_DOMAIN}").alias("x"),
        F.expr(h60_spark("'y|' || CAST(c_custkey AS STRING)") + f" % {_GRID_DOMAIN}").alias("y"),
    )
    wid = pts0.agg(F.count(F.lit(1)).alias("n")).select(F.expr(_W_SPARK).alias("w"))
    pts = pts0.crossJoin(F.broadcast(wid))
    off = F.array(F.lit(-1), F.lit(0), F.lit(1))
    probe = (
        pts.select("id", "x", "y", "w", F.explode(off).alias("dx"))
        .select("id", "x", "y", "w", "dx", F.explode(off).alias("dy"))
        .select(
            "id", "x", "y", "w",
            (F.expr("x DIV w") + F.col("dx")).alias("cx"),
            (F.expr("y DIV w") + F.col("dy")).alias("cy"),
        )
    )
    build = pts.select(
        F.col("id").alias("nid"), F.col("x").alias("bx"), F.col("y").alias("by"),
        F.expr("x DIV w").alias("cx"), F.expr("y DIV w").alias("cy"),
    )
    neigh = (
        probe.join(build, ["cx", "cy"])
        .filter(F.col("id") != F.col("nid"))
        .filter(
            (F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx"))
            + (F.col("y") - F.col("by")) * (F.col("y") - F.col("by"))
            <= F.col("w") * F.col("w")
        )
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_neighbors"))
    )
    counts = (
        pts.select("id")
        .join(neigh, "id", "left")
        .select("id", F.coalesce(F.col("n_neighbors"), F.lit(0)).alias("n_neighbors"))
    )
    return counts.groupBy("n_neighbors").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum("id").cast("long").alias("id_checksum"),
    ).select(
        F.col("n_neighbors").cast("long").alias("n_neighbors"),
        "n_points",
        (F.col("n_neighbors") >= _DBSCAN_MINPTS).alias("is_core"),
        "id_checksum",
    )