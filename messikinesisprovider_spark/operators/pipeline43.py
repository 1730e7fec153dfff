"""Round 4 additions, part 18: spatial grid join, exact isotonic
calibration, and weighted shortest paths.

- ``geo_grid_knn`` — the distributed SPATIAL nearest-neighbor join: points
  on an integer grid (deterministic coordinates from the portable hash),
  bucketed into cells, each point probing its 3x3 cell neighborhood for
  its nearest neighbor by squared Euclidean distance.  This is the
  standard spatial-join decomposition (grid/partition -> local refine):
  the probe side is replicated x9 map-side, the join is EQUI on cell id
  (shuffle-partitionable, no theta join), and the reduce is a
  per-point-partitioned window.  Semantics are defined as grid-local kNN
  (nearest within the 3x3 neighborhood) so the oracle replicates the
  candidate set exactly — no recall assumption; a production variant
  expands the ring until a neighbor is found, same plan shape per ring.
  All-integer geometry -> bit-exact across engines.

- ``isotonic_calibration_pav`` — exact isotonic regression (pool-adjacent-
  violators) over 32 calibration bins via the minimax identity
  iso(i) = max_{j<=i} min_{k>=i} avg(y[j..k]): the post-hoc calibration
  step every scored ranker/classifier pipeline runs.  The corpus scan
  reduces to 32 (pos, tot) BIGINT rows map-side; the minimax is evaluated
  on that micro-table with bounded theta joins (32^2 segments x 32
  anchors — the user_growth_curve shape, cardinality fixed by the BIN
  DOMAIN, not the data).  Every segment average is one IEEE division of
  two exact integers — correctly rounded, hence bit-identical in both
  engines; min/max over those doubles is then exact.

- ``graph_sssp_bounded`` — multi-source weighted shortest paths over the
  shared co-purchase edge table: 3 Bellman-Ford relaxation rounds from
  the 5 highest-degree seeds, edge weights 1..9 from the portable hash of
  the undirected endpoint pair.  Per round: one equi-join frontier
  expansion + a min-aggregated union (exactly the khop shape with MIN
  fold instead of DISTINCT), reading the materialized ``graph.edges_*``
  table — no re-mining.  Distances are exact integers; the per-distance
  histogram + node checksum proves the full relaxation state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .dedup import h60_duck, h60_spark
from .graphshared import copurchase_edges
from .relational import events_tbl, tbl

# ---------------------------------------------------------------------------
# geo_grid_knn
# ---------------------------------------------------------------------------

_GRID_DOMAIN = 10_000  # coordinates in [0, 10000)
_GRID_OCCUPANCY = 2  # target points per cell — keeps candidates O(n)

# Density-adaptive cell width, derived IN-PLAN from COUNT(*) with the
# identical arithmetic in both engines (sqrt of an exact integer ratio is
# one correctly-rounded IEEE op; FLOOR/GREATEST/integer-DIV are exact):
# a FIXED grid makes occupancy — and the 3x3 candidate set — grow
# linearly with n, which the sf0.01->sf0.1 probe measured as a 7x
# runtime ratio; adaptive width pins occupancy ~constant so candidates
# stay O(n).
_W_DUCK = (
    f"GREATEST(1, {_GRID_DOMAIN} // GREATEST(1, "
    f"CAST(FLOOR(SQRT(CAST(n AS DOUBLE) / {_GRID_OCCUPANCY})) AS BIGINT)))"
)
_W_SPARK = (
    f"GREATEST(1, {_GRID_DOMAIN} DIV GREATEST(1, "
    f"CAST(FLOOR(SQRT(CAST(n AS DOUBLE) / {_GRID_OCCUPANCY})) AS BIGINT)))"
)


def _geo_oracle() -> str:
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
         (p.x // p.w) + dx.d AS cx,
         (p.y // p.w) + dy.d AS cy
  FROM pts p
  CROSS JOIN (SELECT UNNEST([-1, 0, 1]) AS d) dx
  CROSS JOIN (SELECT UNNEST([-1, 0, 1]) AS d) dy
),
cand AS (
  SELECT pr.id, b.id AS nid,
         (pr.x - b.x) * (pr.x - b.x) + (pr.y - b.y) * (pr.y - b.y) AS d2
  FROM probe pr
  JOIN pts b ON b.x // b.w = pr.cx AND b.y // b.w = pr.cy
            AND b.id <> pr.id
)
SELECT id AS point_id, nid AS neighbor_id, CAST(d2 AS BIGINT) AS dist2
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, nid) AS rn
      FROM cand)
WHERE rn = 1
"""


@register(
    "geo_grid_knn",
    oracle=_geo_oracle(),
    description="Spatial grid nearest-neighbor join: integer coordinates "
    "from the portable hash, density-ADAPTIVE cell width derived in-plan "
    "from COUNT (occupancy pinned ~2 so candidates stay O(n)), 3x3 "
    "cell-neighborhood probe (x9 map-side replication, equi-join on cell "
    "id), per-point nearest by exact squared distance; grid-local "
    "semantics so the oracle replicates the candidate set",
    tags=("spatial", "join", "similarity", "extension"),
)
def geo_grid_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-partitioned spatial NN (see module doc). Scale: replication is
    a constant x9 on the probe side only; cell width adapts to point
    density in-plan (1-row COUNT broadcast), so candidates stay
    O(points x target occupancy); the refine window partitions on id."""
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
            "id",
            "x",
            "y",
            (F.expr("x DIV w") + F.col("dx")).alias("cx"),
            (F.expr("y DIV w") + F.col("dy")).alias("cy"),
        )
    )
    build = pts.select(
        F.col("id").alias("nid"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.expr("x DIV w").alias("cx"),
        F.expr("y DIV w").alias("cy"),
    )
    cand = (
        probe.join(build, ["cx", "cy"])
        .filter(F.col("id") != F.col("nid"))
        .select(
            "id",
            "nid",
            (
                (F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx"))
                + (F.col("y") - F.col("by")) * (F.col("y") - F.col("by"))
            ).alias("d2"),
        )
    )
    w = W.partitionBy("id").orderBy(F.col("d2").asc(), F.col("nid").asc())
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("id").alias("point_id"),
            F.col("nid").alias("neighbor_id"),
            F.col("d2").cast("long").alias("dist2"),
        )
    )


# ---------------------------------------------------------------------------
# isotonic_calibration_pav
# ---------------------------------------------------------------------------

_PAV_BINS = 32
_PAV_SCALE = 1000


def _pav_oracle() -> str:
    hs = h60_duck("'cal|' || CAST(event_id AS VARCHAR)")
    hl = h60_duck("'lab|' || CAST(event_id AS VARCHAR)")
    return f"""
WITH scored AS (
  SELECT {hs} % {_PAV_SCALE} AS s,
         CASE WHEN {hl} % {_PAV_SCALE} < {hs} % {_PAV_SCALE} THEN 1 ELSE 0 END AS y
  FROM events
),
bins AS (
  SELECT s // {(_PAV_SCALE + _PAV_BINS - 1) // _PAV_BINS} AS bin,
         CAST(COUNT(*) AS BIGINT) AS tot, CAST(SUM(y) AS BIGINT) AS pos
  FROM scored GROUP BY 1
),
seg AS (
  SELECT j.bin AS j, k.bin AS k,
         SUM(m.pos) AS num, SUM(m.tot) AS den
  FROM bins j JOIN bins k ON k.bin >= j.bin
  JOIN bins m ON m.bin BETWEEN j.bin AND k.bin
  GROUP BY j.bin, k.bin
),
segavg AS (SELECT j, k, CAST(num AS DOUBLE) / den AS a FROM seg),
lo AS (
  SELECT i.bin AS bin, s.j, MIN(s.a) AS min_a
  FROM bins i JOIN segavg s ON s.j <= i.bin AND s.k >= i.bin
  GROUP BY i.bin, s.j
),
iso AS (SELECT bin, MAX(min_a) AS iso_rate FROM lo GROUP BY bin)
SELECT b.bin, b.tot AS n_events, b.pos AS n_pos,
       CAST(b.pos AS DOUBLE) / b.tot AS rate,
       i.iso_rate
FROM bins b JOIN iso i USING (bin)
"""


@register(
    "isotonic_calibration_pav",
    oracle=_pav_oracle(),
    description=f"Exact isotonic regression (PAV) over {_PAV_BINS} "
    "calibration bins via the minimax identity max_j<=i min_k>=i "
    "avg(j..k): corpus reduces to 32 BIGINT rows map-side, minimax runs "
    "on the micro-table with domain-bounded theta joins; every segment "
    "average is one correctly-rounded IEEE division so both engines "
    "agree bit-for-bit",
    tags=("ml", "calibration", "analytics", "extension"),
)
def isotonic_calibration_pav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PAV (see module doc). The expensive part — scoring and
    binning the corpus — is one map-side aggregate; the minimax is
    evaluated on the 32-row bin table (theta joins bounded by the bin
    domain squared, the sanctioned micro-table class)."""
    bw = (_PAV_SCALE + _PAV_BINS - 1) // _PAV_BINS
    hs = h60_spark("'cal|' || CAST(event_id AS STRING)")
    hl = h60_spark("'lab|' || CAST(event_id AS STRING)")
    scored = events_tbl(spark, sf_dir).select(
        F.expr(f"{hs} % {_PAV_SCALE}").alias("s"),
        F.expr(
            f"CASE WHEN {hl} % {_PAV_SCALE} < {hs} % {_PAV_SCALE} THEN 1 ELSE 0 END"
        ).alias("y"),
    )
    bins = (
        scored.groupBy(F.expr(f"s DIV {bw}").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("tot"),
            F.sum("y").cast("long").alias("pos"),
        )
    )
    j = bins.select(F.col("bin").alias("j"))
    k = bins.select(F.col("bin").alias("k"))
    m = bins.select(F.col("bin").alias("mb"), "pos", "tot")
    seg = (
        j.join(k, F.col("k") >= F.col("j"))
        .join(m, (F.col("mb") >= F.col("j")) & (F.col("mb") <= F.col("k")))
        .groupBy("j", "k")
        .agg(F.sum("pos").alias("num"), F.sum("tot").alias("den"))
        .select("j", "k", (F.col("num").cast("double") / F.col("den")).alias("a"))
    )
    anchors = bins.select(F.col("bin"))
    lo = (
        anchors.join(seg, (F.col("j") <= F.col("bin")) & (F.col("k") >= F.col("bin")))
        .groupBy("bin", "j")
        .agg(F.min("a").alias("min_a"))
    )
    iso = lo.groupBy("bin").agg(F.max("min_a").alias("iso_rate"))
    return (
        bins.join(iso, "bin")
        .select(
            "bin",
            F.col("tot").alias("n_events"),
            F.col("pos").alias("n_pos"),
            (F.col("pos").cast("double") / F.col("tot")).alias("rate"),
            "iso_rate",
        )
    )


# ---------------------------------------------------------------------------
# graph_sssp_bounded
# ---------------------------------------------------------------------------

_SSSP_ROUNDS = 3
_SSSP_SEEDS = 5


def _sssp_oracle() -> str:
    w_expr = h60_duck("'w|' || CAST(pa AS VARCHAR) || '|' || CAST(pb AS VARCHAR)") + " % 9 + 1"
    rounds = []
    prev = "d0"
    for r in range(1, _SSSP_ROUNDS + 1):
        rounds.append(
            f"d{r} AS (SELECT node, MIN(dist) AS dist FROM ("
            f"SELECT node, dist FROM {prev} "
            f"UNION ALL "
            f"SELECT e.dst AS node, p.dist + e.w AS dist FROM {prev} p "
            f"JOIN edges e ON e.src = p.node) GROUP BY node)"
        )
        prev = f"d{r}"
    return f"""
WITH e1 AS (SELECT pa, pb, {w_expr} AS w FROM (
       SELECT pa, pb FROM (
         SELECT l_orderkey, l_partkey FROM lineitem GROUP BY ALL
       ) a(l_orderkey, pa)
       JOIN (SELECT l_orderkey, l_partkey FROM lineitem GROUP BY ALL
       ) b(l_orderkey, pb) USING (l_orderkey)
       WHERE pa < pb
       GROUP BY pa, pb HAVING COUNT(*) >= 2)),
edges AS (SELECT pa AS src, pb AS dst, w FROM e1
          UNION ALL SELECT pb, pa, w FROM e1),
deg AS (SELECT src AS p, COUNT(*) AS d FROM edges GROUP BY src),
seeds AS (SELECT p FROM deg ORDER BY d DESC, p LIMIT {_SSSP_SEEDS}),
d0 AS (SELECT p AS node, CAST(0 AS BIGINT) AS dist FROM seeds),
{','.join(rounds)}
SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(node) AS BIGINT) AS node_checksum
FROM d{_SSSP_ROUNDS}
GROUP BY dist
"""


@register(
    "graph_sssp_bounded",
    oracle=_sssp_oracle(),
    description=f"Multi-source weighted shortest paths: {_SSSP_ROUNDS} "
    f"Bellman-Ford relaxation rounds from the {_SSSP_SEEDS} highest-degree "
    "seeds over the SHARED materialized co-purchase edge table (no "
    "re-mining), hash-deterministic integer weights 1..9; per round one "
    "equi-join expansion + MIN-fold union — the khop shape with a MIN "
    "lattice instead of set union; exact integer distances",
    tags=("graph", "iterative", "extension"),
)
def graph_sssp_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round Bellman-Ford (see module doc). Rounds are a
    compile-time constant (fixed join chain, no driver loop); for
    variable-round convergence at scale, iterate with localCheckpoint
    probes exactly as dedup_clusters does."""
    und = copurchase_edges(spark, sf_dir).select(
        "a",
        "b",
        F.expr(
            h60_spark("'w|' || CAST(a AS STRING) || '|' || CAST(b AS STRING)") + " % 9 + 1"
        ).alias("w"),
    )
    edges = (
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w")
        .unionAll(und.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w"))
        .persist()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    seeds = (
        deg.orderBy(F.col("d").desc(), F.col("src"))
        .limit(_SSSP_SEEDS)
        .select(F.col("src").alias("node"))
    )
    dist = seeds.select("node", F.lit(0).cast("long").alias("dist"))
    for _ in range(_SSSP_ROUNDS):
        relaxed = (
            dist.join(edges, dist.node == edges.src)
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = dist.unionAll(relaxed).groupBy("node").agg(F.min("dist").alias("dist"))
    return dist.groupBy("dist").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("node").cast("long").alias("node_checksum"),
    )
