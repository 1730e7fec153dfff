"""Relational surface, part 5 (round 3c): scale patterns for the three join
shapes that melt down first at 100 TB.

- ``range_join_binned``: interval/range join WITHOUT an equi key. Spark's
  default plan for a pure range predicate is BroadcastNestedLoopJoin —
  O(|L|·|R|) comparisons. The scale pattern is interval binning: quantize
  time into fixed-width bins (width tuned BELOW the window — see
  `_BIN_WIDTH`), explode each interval onto the bins it covers, equi-join
  on the bin, re-check the exact predicate as a residual. Comparisons drop
  from |L|·|R| to sum-per-bin products, and the join becomes a plain
  shuffled equi-join Catalyst can size with AQE.
  (Same trick Databricks' range-join bin hints apply; here it is explicit
  and engine-independent.)
- ``asof_join_nearest``: pandas ``merge_asof(direction='nearest',
  tolerance=...)`` semantics — for each error event the nearest click of the
  same user within ±5 minutes, either direction, ties to the earlier click.
  One shuffle on user_id via the union-and-carry pattern (both directions),
  no inequality join.
- ``graph_pagerank``: 5 fixed iterations of PageRank (d = 0.85) over the
  bipartite customer↔supplier graph, in scaled-integer fixed point
  (rank × 10^12, integer division everywhere) so partial aggregation order
  cannot perturb a single bit and the DuckDB oracle — the same five
  iterations unrolled as CTEs — matches exactly. The iterative-join shape
  (persisted edge/degree tables, per-iteration shuffle on node, periodic
  lazy checkpoint to cut lineage) is the same discipline as
  operators/clusters.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import events_tbl, tbl

# ---------------------------------------------------------------------------
# Binned range join (no equi key)
# ---------------------------------------------------------------------------

_BIN_DAYS = 7  # the query's range window (semantic — mirrored in the oracle)
# Bin width DECOUPLED from the window (round 4): with width == window the
# candidate set carries (window+width)/window = 2x the true pairs; and since
# the date DOMAIN is fixed while row density grows with SF, candidate pairs
# grow quadratically — so the overhead factor directly scales the 0.01->0.1
# ratio. Measured sweep (min-of-3 per point): width 7 -> 4.87x ratio
# (1.42 s at sf0.1), width 2 -> 2.63x (1.06 s), width 1 -> 2.12x (1.16 s).
# Width 2 is the knee: candidates 9/7 = 1.29x of true pairs at ~4 bins per
# left interval. tests/test_scaling_pins.py pins the ratio.
_BIN_WIDTH = 2
_EPOCH = "DATE '1992-01-01'"


@register(
    "range_join_binned",
    oracle=f"""
    WITH a AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
      FROM orders WHERE o_orderpriority = '1-URGENT'
    ),
    b AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders)
    SELECT a.o_orderkey, COUNT(b.o_orderkey) AS n_prior_week
    FROM a LEFT JOIN b ON b.d >= a.d - {_BIN_DAYS} AND b.d < a.d
    GROUP BY a.o_orderkey
    """,
    description="Pure range join (no equi key) via interval binning: orders placed "
    "in the 7 days before each urgent order",
    tags=("join", "range", "binned", "scale"),
)
def range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each URGENT order, how many orders (any priority) were placed in
    the preceding 7 days. No shared key — the naive Spark plan is a
    BroadcastNestedLoopJoin over |urgent|·|orders| pairs. Binning by
    `_BIN_WIDTH`-day buckets turns it into an equi-join on the bin id: each
    left interval [d-7, d) explodes onto the ~window/width+1 bins it covers,
    each right point lands in exactly one, so a (left, right) match is
    produced exactly once and the residual predicate re-checks the exact
    range. test_plans pins the absence of BroadcastNestedLoopJoin and
    equality with the naive theta join; the candidate-pair overhead factor
    ((window + width) / window) is pinned by test_relational5's
    candidate-accounting test.
    """
    o = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("d"), "o_orderpriority"
    )
    bin_of = lambda c: F.expr(f"datediff({c}, {_EPOCH}) div {_BIN_WIDTH}")  # noqa: E731
    left = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "d")
        .withColumn(
            "bin",
            F.explode(
                F.sequence(
                    bin_of(f"d - INTERVAL {_BIN_DAYS} DAYS"),
                    bin_of("d - INTERVAL 1 DAYS"),
                )
            ),
        )
        .alias("a")
    )
    right = o.select(
        F.col("o_orderkey").alias("r_orderkey"), F.col("d").alias("r_d")
    ).withColumn("bin", bin_of("r_d")).alias("b")
    return (
        left.join(
            right,
            (F.col("a.bin") == F.col("b.bin"))
            & (F.col("b.r_d") >= F.expr(f"a.d - INTERVAL {_BIN_DAYS} DAYS"))
            & (F.col("b.r_d") < F.col("a.d")),
            "left",
        )
        .groupBy(F.col("a.o_orderkey").alias("o_orderkey"))
        .agg(F.count("b.r_orderkey").alias("n_prior_week"))
    )


# ---------------------------------------------------------------------------
# Nearest as-of join with tolerance
# ---------------------------------------------------------------------------

_ASOF_TOL_US = 300_000_000  # ±5 minutes


@register(
    "asof_join_nearest",
    oracle=f"""
    WITH u AS (
      SELECT event_id, user_id, ts, CAST(NULL AS TIMESTAMP) AS c_ts, 1 AS is_err
      FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT event_id, user_id, ts, ts AS c_ts, 0 AS is_err
      FROM events WHERE event_type = 'click'
    ),
    w AS (
      SELECT *,
        last_value(c_ts IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY ts, is_err, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_c,
        first_value(c_ts IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY ts, is_err, event_id
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_c
      FROM u
    ),
    d AS (
      SELECT event_id, user_id, ts, prev_c, next_c,
             epoch_us(ts) - epoch_us(prev_c) AS dp,
             epoch_us(next_c) - epoch_us(ts) AS dn
      FROM w WHERE is_err = 1
    )
    SELECT event_id, user_id, ts::TIMESTAMP AS error_ts,
           CASE WHEN dp <= {_ASOF_TOL_US} AND (dn IS NULL OR dn > {_ASOF_TOL_US} OR dp <= dn)
                THEN prev_c
                WHEN dn <= {_ASOF_TOL_US} THEN next_c
                ELSE NULL END::TIMESTAMP AS click_ts,
           CASE WHEN dp <= {_ASOF_TOL_US} AND (dn IS NULL OR dn > {_ASOF_TOL_US} OR dp <= dn)
                THEN dp
                WHEN dn <= {_ASOF_TOL_US} THEN dn
                ELSE NULL END AS delta_us
    FROM d
    """,
    description="Nearest-direction as-of join with ±5 min tolerance "
    "(merge_asof 'nearest' semantics), one shuffle on user_id",
    tags=("asof", "join", "temporal", "scale"),
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional as-of: union both streams, one sort per user, carry the
    last click forward AND the next click backward, pick the nearer within
    tolerance (ties to the earlier click — pandas merge_asof's documented
    nearest-tie rule). Generalizes asof_join_last_click (backward-only);
    same single-shuffle cost.
    """
    ev = events_tbl(spark, sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts",
        F.lit(None).cast("timestamp").alias("c_ts"), F.lit(1).alias("is_err"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("ts").alias("c_ts"), F.lit(0).alias("is_err"),
    )
    from pyspark.sql.window import Window as W

    order = ["ts", "is_err", "event_id"]
    w_prev = (
        W.partitionBy("user_id").orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_next = (
        W.partitionBy("user_id").orderBy(*order)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    merged = (
        errors.unionByName(clicks)
        .withColumn("prev_c", F.last("c_ts", ignorenulls=True).over(w_prev))
        .withColumn("next_c", F.first("c_ts", ignorenulls=True).over(w_next))
        .filter(F.col("is_err") == 1)
        .withColumn("dp", F.unix_micros("ts") - F.unix_micros("prev_c"))
        .withColumn("dn", F.unix_micros("next_c") - F.unix_micros("ts"))
    )
    take_prev = (F.col("dp") <= _ASOF_TOL_US) & (
        F.col("dn").isNull() | (F.col("dn") > _ASOF_TOL_US) | (F.col("dp") <= F.col("dn"))
    )
    take_next = F.col("dn") <= _ASOF_TOL_US
    return merged.select(
        "event_id",
        "user_id",
        F.col("ts").alias("error_ts"),
        F.when(take_prev, F.col("prev_c"))
        .when(take_next, F.col("next_c"))
        .otherwise(F.lit(None).cast("timestamp"))
        .alias("click_ts"),
        F.when(take_prev, F.col("dp"))
        .when(take_next, F.col("dn"))
        .otherwise(F.lit(None).cast("bigint"))
        .alias("delta_us"),
    )


# ---------------------------------------------------------------------------
# Fixed-point integer PageRank
# ---------------------------------------------------------------------------

_PR_SCALE = 10**12
_PR_ITERS = 5
_PR_TELEPORT = 15 * _PR_SCALE // 100  # 0.15 exactly
_PR_TOPK = 100


def _pagerank_oracle() -> str:
    ctes = [
        f"""eraw AS (
  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
e2 AS (SELECT src, dst FROM eraw UNION ALL SELECT dst AS src, src AS dst FROM eraw),
deg AS (SELECT src AS node, COUNT(*) AS deg FROM e2 GROUP BY src),
pr0 AS (SELECT node, deg, CAST({_PR_SCALE} AS BIGINT) AS pr FROM deg)"""
    ]
    for i in range(1, _PR_ITERS + 1):
        ctes.append(
            f"""pr{i} AS (
  SELECT d.node, d.deg,
         CAST({_PR_TELEPORT} + (17 * s.insum) // 20 AS BIGINT) AS pr
  FROM deg d JOIN (
    SELECT e2.dst AS node, SUM(p.pr // p.deg) AS insum
    FROM pr{i - 1} p JOIN e2 ON e2.src = p.node
    GROUP BY e2.dst
  ) s ON s.node = d.node
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT node AS node_id, pr AS rank_scaled FROM pr{_PR_ITERS}
ORDER BY rank_scaled DESC, node_id LIMIT {_PR_TOPK}"""
    )


@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(),
    description=f"PageRank (d=0.85, {_PR_ITERS} iterations) over the bipartite "
    "customer<->supplier graph in scaled-integer fixed point; top "
    f"{_PR_TOPK} nodes, bit-exact oracle (iterations unrolled as CTEs)",
    tags=("graph", "pagerank", "iterative", "extension"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every arithmetic step is integer (rank x 10^12, `div`, x17/20 for the
    0.85 damping), so the result is independent of aggregation order and
    partitioning — the property that makes an iterative distributed
    algorithm testable bit-for-bit against a single-node oracle. Undirected
    bipartite edges mean no dangling nodes (no leaked mass, no teleport
    redistribution term). Edge and degree tables are computed once and
    persisted across iterations; a lazy localCheckpoint mid-way caps plan
    depth exactly as in operators/clusters.py.
    """
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    eraw = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    e2 = eraw.unionByName(
        eraw.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    deg = (
        e2.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        .withColumnRenamed("src", "node")
        .persist()
    )
    ranks = deg.select("node", "deg", F.lit(_PR_SCALE).cast("bigint").alias("pr"))
    for i in range(_PR_ITERS):
        contrib = e2.join(ranks, e2.src == ranks.node).select(
            F.col("dst").alias("node"), F.expr("pr div deg").alias("c")
        )
        insum = contrib.groupBy("node").agg(F.sum("c").alias("insum"))
        ranks = deg.join(insum, "node").select(
            "node",
            "deg",
            F.expr(f"CAST({_PR_TELEPORT} + (17 * insum) div 20 AS BIGINT)").alias("pr"),
        )
        if i == _PR_ITERS // 2:
            ranks = ranks.localCheckpoint(eager=False)
    return (
        ranks.select(F.col("node").alias("node_id"), F.col("pr").alias("rank_scaled"))
        .orderBy(F.col("rank_scaled").desc(), "node_id")
        .limit(_PR_TOPK)
    )
