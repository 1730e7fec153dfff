"""Lake-operations / scale-pattern operators, round 3f.

Three operators, all with bit-exact DuckDB oracles:

- ``dq_expectations``: a data-quality rule engine (Deequ/Great-Expectations
  shape): uniqueness, referential integrity, range, null-fraction and
  domain-membership checks evaluated in ONE aggregate pass per table, then
  stacked into a (rule, n_checked, n_violations, passed) report. The thing
  every production lake runs before a training job is allowed to read a
  drop.
- ``skew_salted_join``: the hot-key-safe shuffle join: the fact side's join
  key is salted with a deterministic hash-derived salt, the dimension side
  is replicated once per salt value, and the join runs on (key, salt) so a
  single hot key spreads over SALT_BUCKETS reducers instead of melting one.
  Result is provably identical to the plain join (the oracle IS the plain
  join; a test additionally pins DataFrame-equality to the unsalted plan).
- ``graph_khop_reach``: bounded-hop reachability (BFS frontier expansion)
  over the co-purchase graph: per seed part, how many distinct parts are
  reachable in <= K hops. Each round is one equi-join frontier expansion +
  a distinct (the iterative shuffle-dedup shape that generalizes to any
  k-hop graph feature at scale); the oracle unrolls the same K rounds as
  CTEs.

Reference parity note: the reference (SURVEY.md §0) is a streaming provider
with no relational surface; these extend the batch side per the round brief
(training-data-pipeline operations as first-class components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .graph2 import _copurchase_edges
from .relational import events_tbl, tbl

# ---------------------------------------------------------------------------
# dq_expectations
# ---------------------------------------------------------------------------

# Null-fraction tolerance for documents.text: violations are rows over the
# budget — computed as max(0, nulls - floor(rows * MAX_FRAC)) so the check
# stays integer-exact in both engines.
DQ_TEXT_NULL_MAX_FRAC = "0.05"
DQ_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@register(
    "dq_expectations",
    oracle=f"""
    WITH li AS (
      SELECT COUNT(*) AS n,
             COUNT(*) FILTER (WHERE l_quantity <= 0 OR l_quantity > 100) AS bad_qty,
             COUNT(*) FILTER (WHERE l_extendedprice < 0) AS bad_price,
             COUNT(*) FILTER (WHERE l_orderkey IS NULL) AS null_ok
      FROM lineitem
    ),
    ords AS (
      SELECT COUNT(*) AS n, COUNT(*) - COUNT(DISTINCT o_orderkey) AS dup_keys
      FROM orders
    ),
    orphans AS (
      SELECT COUNT(*) AS n FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    ),
    docs AS (
      SELECT COUNT(*) AS n,
             GREATEST(CAST(0 AS BIGINT),
                      COUNT(*) FILTER (WHERE text IS NULL)
                      - CAST(FLOOR(COUNT(*) * {DQ_TEXT_NULL_MAX_FRAC}) AS BIGINT)) AS excess_null_text
      FROM documents
    ),
    ev AS (
      SELECT COUNT(*) AS n,
             COUNT(*) FILTER (WHERE event_type NOT IN
               ('click','view','purchase','signup','error')) AS bad_type
      FROM events
    )
    SELECT rule, n_checked, n_violations, n_violations = 0 AS passed
    FROM (
      SELECT 'lineitem_quantity_in_(0,100]' AS rule, n AS n_checked, bad_qty AS n_violations FROM li
      UNION ALL
      SELECT 'lineitem_price_nonnegative', n, bad_price FROM li
      UNION ALL
      SELECT 'lineitem_orderkey_not_null', n, null_ok FROM li
      UNION ALL
      SELECT 'orders_orderkey_unique', n, dup_keys FROM ords
      UNION ALL
      SELECT 'lineitem_orderkey_in_orders', (SELECT n FROM li), n FROM orphans
      UNION ALL
      SELECT 'documents_text_null_frac_le_5pct', n, excess_null_text FROM docs
      UNION ALL
      SELECT 'events_type_in_domain', n, bad_type FROM ev
    ) r
    """,
    description="Data-quality expectation suite: uniqueness / referential "
    "integrity / range / null-budget / domain checks as one report",
    tags=("lakeops", "quality", "extension"),
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One aggregate pass per table; rules on the same table are fused.

    Scale plan: every per-table rule set is a single scan with map-side
    partial aggregation (conditional counts fuse into one Aggregate node —
    no per-rule scans); the referential-integrity rule is the only join, a
    left-anti on the join key both sides shuffle on once. The report is a
    handful of rows regardless of input size, so the final union is
    metadata-cheap. New rules cost one conditional count, not one pass.
    """
    li = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders")
    d = tbl(spark, sf_dir, "documents")
    e = events_tbl(spark, sf_dir)

    def cnt(cond):  # conditional count, BIGINT in both engines
        return F.count(F.when(cond, F.lit(1)))

    def stack(agg: DataFrame, *rules: tuple[str, str, str]) -> DataFrame:
        """One-row aggregate → one row per rule. `stack` keeps the single
        Aggregate node shared — union'ing per-rule selects of the same
        DataFrame would re-plan (and re-scan) the aggregate per branch."""
        args = ", ".join(f"'{name}', {n}, {v}" for name, n, v in rules)
        return agg.selectExpr(
            f"stack({len(rules)}, {args}) AS (rule, n_checked, n_violations)"
        )

    li_rules = stack(
        li.agg(
            F.count(F.lit(1)).alias("n"),
            cnt((F.col("l_quantity") <= 0) | (F.col("l_quantity") > 100)).alias("bad_qty"),
            cnt(F.col("l_extendedprice") < 0).alias("bad_price"),
            cnt(F.col("l_orderkey").isNull()).alias("null_ok"),
        ),
        ("lineitem_quantity_in_(0,100]", "n", "bad_qty"),
        ("lineitem_price_nonnegative", "n", "bad_price"),
        ("lineitem_orderkey_not_null", "n", "null_ok"),
    )
    o_rules = stack(
        o.agg(
            F.count(F.lit(1)).alias("n"),
            (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_keys"),
        ),
        ("orders_orderkey_unique", "n", "dup_keys"),
    )
    # Referential integrity as ONE outer-join aggregate (n_checked and the
    # orphan count from the same pass; a separate anti-join would need a
    # second lineitem scan just for the denominator).
    ri_rules = stack(
        li.select("l_orderkey")
        .join(
            o.select(F.col("o_orderkey").alias("__ok")).distinct(),
            F.col("l_orderkey") == F.col("__ok"),
            "left_outer",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            cnt(F.col("__ok").isNull()).alias("orphans"),
        ),
        ("lineitem_orderkey_in_orders", "n", "orphans"),
    )
    d_rules = stack(
        d.agg(
            F.count(F.lit(1)).alias("n"),
            F.greatest(
                F.lit(0).cast("long"),
                cnt(F.col("text").isNull())
                - F.floor(
                    F.count(F.lit(1)) * F.lit(float(DQ_TEXT_NULL_MAX_FRAC))
                ).cast("long"),
            ).alias("excess_null_text"),
        ),
        ("documents_text_null_frac_le_5pct", "n", "excess_null_text"),
    )
    e_rules = stack(
        e.agg(
            F.count(F.lit(1)).alias("n"),
            cnt(~F.col("event_type").isin(*DQ_EVENT_TYPES)).alias("bad_type"),
        ),
        ("events_type_in_domain", "n", "bad_type"),
    )

    report = li_rules.unionAll(o_rules).unionAll(ri_rules).unionAll(d_rules).unionAll(e_rules)
    return report.select(
        "rule",
        F.col("n_checked").cast("long").alias("n_checked"),
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


# ---------------------------------------------------------------------------
# skew_salted_join
# ---------------------------------------------------------------------------

SALT_BUCKETS = 8


@register(
    "skew_salted_join",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_events,
           COUNT(DISTINCT e.user_id) AS n_users,
           CAST(SUM(CAST(COALESCE(e.value, 0) AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY c_mktsegment
    """,
    description="Hot-key-safe shuffle join: hash-salted fact side x "
    "salt-replicated dimension side, provably equal to the plain join",
    tags=("join", "skew", "extension"),
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted shuffle join — the broadcast-free answer to one melting reducer.

    When the dimension side is too big to broadcast and the fact side has a
    hot key (one user with half the events — see tools/skew_fixtures.py),
    a plain shuffle join lands the whole hot key on one reducer. Salting
    spreads it: the fact side gets ``salt = pmod(xxhash64(event_id), B)``
    (hash of a UNIQUE column — deterministic, uniform, and independent of
    the join key, so every hot-key row lands in a different bucket), the
    dim side is replicated B times via a posexplode'd literal array, and
    the equi-join runs on (key, salt) — B reducers share each hot key.

    B is a constant here; at 100 TB drive it from AQE skew stats or a
    sampled key histogram, and salt only the keys above the skew threshold
    (replicating the dim rows only for those keys). The identity
    salted_join == plain_join is pinned by tests/test_pipeline6.py.

    Deliberately disables broadcast for this join (the dim fits in memory at
    test SF, which would let Catalyst sidestep the pattern being exercised)
    via a per-join hint-free shuffle_hash hint on the replicated side.
    """
    e = events_tbl(spark, sf_dir).filter(F.col("user_id").isNotNull())
    c = tbl(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")

    fact = e.withColumn(
        "salt", F.pmod(F.xxhash64(F.col("event_id")), F.lit(SALT_BUCKETS)).cast("int")
    )
    dim = c.select(
        "c_custkey",
        "c_mktsegment",
        F.posexplode(F.array(*[F.lit(i) for i in range(SALT_BUCKETS)])).alias("pos", "salt"),
    ).drop("pos")

    joined = fact.hint("shuffle_hash").join(
        dim,
        (fact.user_id == dim.c_custkey) & (fact.salt == dim.salt),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.coalesce(F.col("value"), F.lit(0.0)).cast("decimal(18,6)"))
        .cast("double")
        .alias("total_value"),
    )


# ---------------------------------------------------------------------------
# graph_khop_reach
# ---------------------------------------------------------------------------

KHOP_K = 3


@register(
    "graph_khop_reach",
    oracle="""
    WITH e1 AS (SELECT pa, pb FROM (
           SELECT l_orderkey, l_partkey FROM lineitem GROUP BY ALL
         ) a(l_orderkey, pa)
         JOIN (SELECT l_orderkey, l_partkey FROM lineitem GROUP BY ALL
         ) b(l_orderkey, pb) USING (l_orderkey)
         WHERE pa < pb
         GROUP BY pa, pb HAVING COUNT(*) >= 2),
    deg AS (SELECT pa AS p, COUNT(*) AS d FROM (
              SELECT pa FROM e1 UNION ALL SELECT pb FROM e1) t(pa)
            GROUP BY pa),
    -- support-2 co-purchase graph (same mining as triangle_count), seeds =
    -- the 10 highest-degree parts (degree desc, id asc — unique order)
    seeds AS (SELECT p FROM deg ORDER BY d DESC, p LIMIT 10),
    edges AS (SELECT pa AS src, pb AS dst FROM e1
              UNION ALL SELECT pb, pa FROM e1),
    h1 AS (SELECT DISTINCT s.p AS seed, e.dst AS node
           FROM seeds s JOIN edges e ON e.src = s.p),
    h2 AS (SELECT DISTINCT h.seed, e.dst AS node
           FROM h1 h JOIN edges e ON e.src = h.node),
    h3 AS (SELECT DISTINCT h.seed, e.dst AS node
           FROM h2 h JOIN edges e ON e.src = h.node),
    reach AS (SELECT seed, node FROM h1
              UNION SELECT seed, node FROM h2
              UNION SELECT seed, node FROM h3)
    SELECT seed, COUNT(*) AS n_reachable
    FROM (SELECT seed, node FROM reach WHERE node <> seed) r
    GROUP BY seed
    """,
    description=f"Bounded {KHOP_K}-hop reachability over the co-purchase graph "
    "(BFS frontier expansion, distinct per round)",
    tags=("graph", "iterative", "extension"),
)
def graph_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K rounds of frontier expansion; reach sets accumulate via UNION DISTINCT.

    Scale plan: edges are shuffled on ``src`` once and every round's
    expansion joins on that same key, so AQE reuses the exchange; the
    per-round ``distinct`` is the frontier dedup that keeps work
    proportional to |reach|, not to path multiplicity (without it the
    joined row count grows with the number of PATHS — exponential on dense
    graphs). Seeds are a 10-row broadcast. K is a compile-time constant so
    the plan is a fixed 3-join chain — no driver-side loop state; for
    variable K at scale, iterate with a localCheckpoint every few rounds
    exactly as dedup_clusters does (clusters.py documents that shape).
    Degree-based seed choice with an id tiebreaker keeps the result
    deterministic in both engines.
    """
    und = _copurchase_edges(spark, sf_dir)  # a < b, support-2 co-purchase
    # Persist the directed edge list: every hop (and the degree pass) joins
    # against it — without this the support-2 mining re-runs per round. At
    # warehouse scale the edge list is materialized to storage once.
    edges = (
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(und.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .persist()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    seeds = (
        deg.orderBy(F.col("d").desc(), F.col("src"))
        .limit(10)
        .select(F.col("src").alias("seed"))
    )

    frontier = (
        F.broadcast(seeds)
        .join(edges, seeds.seed == edges.src)
        .select("seed", F.col("dst").alias("node"))
        .distinct()
    )
    frontiers = [frontier]
    for _ in range(KHOP_K - 1):
        frontier = (
            frontier.join(edges, frontier.node == edges.src)
            .select("seed", F.col("dst").alias("node"))
            .distinct()
        )
        frontiers.append(frontier)

    # Union the per-round frontiers (each internally distinct — that is what
    # bounds the joins) and dedup across rounds ONCE in the final aggregate:
    # countDistinct is a two-level hash agg, cheaper than a distinct shuffle
    # per round feeding a plain count.
    reach = frontiers[0]
    for f_ in frontiers[1:]:
        reach = reach.unionAll(f_)
    return (
        reach.filter(F.col("node") != F.col("seed"))
        .groupBy("seed")
        .agg(F.countDistinct("node").alias("n_reachable"))
    )
