"""Round 6 additions, part 5: iterative graph + relational/ML-prep batch.

- ``graph_connected_components``: TRUE connected components (iterate min-
  label propagation to CONVERGENCE, not a fixed round count) over the
  shared co-purchase edge table — the one classic graph primitive the
  graph family (pagerank / k-core / k-hop / LPA / SSSP-bounded) was still
  missing. The DuckDB oracle computes exact components independently via a
  recursive reachability CTE, so the driver verifies convergence itself.
- ``asof_join_tolerance``: as-of join with a STALENESS BOUND — each
  purchase matched to the user's latest prior click only if it is at most
  1 hour old, else NULL (the sensor-fusion/feature-freshness contract the
  plain as-of join lacks). Single window pass over the unioned timeline —
  no join at all.
- ``drawdown_running_max``: per-customer running peak and maximum drawdown
  of order totals in exact cents — the finance risk metric (peak-to-trough)
  as two window passes.
- ``ml_kfold_stratified``: deterministic stratified k-fold assignment
  (portable hash modulo k within each language stratum) with a per-stratum
  fold balance report — the cross-validation prep step.
- ``feature_crosses_hashed``: hashed cross features (market segment x
  nation through the customer->nation join) into 64 buckets with collision
  accounting — the feature-engineering shape for categorical crosses.
- ``explode_outer_nulls``: explode_outer parity — rows with empty/NULL
  arrays survive with NULL elements (the LEFT-JOIN-UNNEST semantics),
  proven against an oracle that pads empty arrays with [NULL].

Reference parity note: the reference engine (SURVEY.md §0) has no
analytics surface; these extend the batch side per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .dedup import h60_duck, h60_spark
from .graphshared import _SUPPORT, copurchase_edges
from .relational import events_tbl, spread, tbl
from .retrieval3 import _TOKS_DUCK, _TOKS_SPARK

# ---------------------------------------------------------------------------
# graph_connected_components
# ---------------------------------------------------------------------------

_CC_MAX_ITERS = 20

_CC_ORACLE = f"""
WITH RECURSIVE
op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
freq AS (SELECT l_partkey FROM op GROUP BY 1 HAVING COUNT(*) >= {_SUPPORT}),
fop AS (SELECT op.* FROM op JOIN freq USING (l_partkey)),
edges AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM fop a JOIN fop b ON a.l_orderkey = b.l_orderkey
   AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {_SUPPORT}
),
sym AS (
  SELECT a AS src, b AS dst FROM edges
  UNION ALL
  SELECT b AS src, a AS dst FROM edges
),
verts AS (SELECT DISTINCT src AS v FROM sym),
reach(v, u) AS (
  SELECT v, v FROM verts
  UNION
  SELECT r.v, s.dst FROM reach r JOIN sym s ON s.src = r.u
)
SELECT v AS part_id, MIN(u) AS component,
       CAST(COUNT(*) AS BIGINT) AS component_reach
FROM reach GROUP BY v
"""


@register(
    "graph_connected_components",
    oracle=_CC_ORACLE,
    description="TRUE connected components of the co-purchase graph: min-"
    "label propagation iterated to CONVERGENCE (not a fixed round count); "
    "oracle = exact components via a recursive reachability CTE, so the "
    "convergence claim itself is driver-verified",
    tags=("graph", "iterative", "extension"),
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-label propagation: every vertex repeatedly adopts the minimum
    label among itself and its neighbors until a full pass changes nothing.
    The per-iteration work is one shuffle on the vertex key (edge-message
    aggregation), and the convergence check is a 1-row count per round —
    a metadata-scale driver action (the kmeans_lloyd_rounds class), never
    row data. Converges in O(diameter) rounds; at 100 TB the same loop
    runs with the large-star/small-star (HashToMin) contraction steps that
    cut rounds to O(log diameter) — the plan shape (join, aggregate-min,
    compare) is identical, documented here as the production variant.
    component_reach (= component size, the count of vertices each vertex
    can reach) is emitted so the oracle pins reachability, not just labels.
    """
    edges = copurchase_edges(spark, sf_dir).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    # localCheckpoint (the repo's iterative-loop convention, clusters.py):
    # every round's state is materialized with TRUNCATED lineage, so the
    # plan — and the broadcast/exchange state behind it — stays O(1) per
    # round instead of accumulating across the convergence loop.
    sym = (
        edges.unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    ).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("v")).distinct().withColumn("lbl", F.col("v"))
    ).localCheckpoint(eager=True)
    for _ in range(_CC_MAX_ITERS):
        msgs = (
            sym.join(labels, sym["src"] == labels["v"])
            .select(F.col("dst").alias("v"), F.col("lbl").alias("m"))
            .groupBy("v")
            .agg(F.min("m").alias("m"))
        )
        new_labels = (
            labels.join(msgs, "v", "left")
            .select("v", F.least("lbl", F.coalesce("m", "lbl")).alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )  # 1-number convergence probe (metadata-scale, documented)
        labels = new_labels
        if changed == 0:
            break
    sizes = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("sz"))
    return (
        labels.join(sizes, "lbl")
        .select(
            F.col("v").alias("part_id"),
            F.col("lbl").alias("component"),
            F.col("sz").cast("long").alias("component_reach"),
        )
    )


# ---------------------------------------------------------------------------
# asof_join_tolerance
# ---------------------------------------------------------------------------

_ASOF_TOL_S = 3600  # 1 hour staleness bound

_ASOF_TOL_ORACLE = f"""
WITH timeline AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type = 'click' THEN ts END AS click_ts
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
matched AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(click_ts IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS last_click_ts
  FROM timeline
)
SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
       CAST(CASE WHEN date_diff('second', last_click_ts, ts) <= {_ASOF_TOL_S}
                 THEN last_click_ts END AS TIMESTAMP) AS matched_click_ts,
       last_click_ts IS NOT NULL
         AND date_diff('second', last_click_ts, ts) <= {_ASOF_TOL_S} AS fresh
FROM matched
WHERE event_type = 'purchase'
"""


@register(
    "asof_join_tolerance",
    oracle=_ASOF_TOL_ORACLE,
    description="As-of join with a staleness bound: each purchase matched "
    "to the user's latest PRIOR click only when at most 1h old, else NULL — "
    "the bounded-freshness contract (sensor fusion / feature staleness) the "
    "plain as-of join lacks; one window pass, no join",
    tags=("relational", "asof", "temporal", "extension"),
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The union-timeline rewrite makes the as-of a single IGNORE NULLS
    window over events sorted once per user — at any scale this is one
    shuffle on user_id, versus a range join's per-pair work. The tolerance
    is a post-window filter, so the plan is identical to the unbounded
    as-of; only the NULL-out predicate differs."""
    timeline = (
        events_tbl(spark, sf_dir)
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
        )
    )
    # LAG(x IGNORE NULLS) == LAST(x, ignorenulls) over (unbounded, -1)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    matched = timeline.withColumn(
        "last_click_ts", F.last("click_ts", ignorenulls=True).over(w)
    )
    age_ok = F.col("last_click_ts").isNotNull() & (
        F.unix_timestamp("ts") - F.unix_timestamp("last_click_ts") <= _ASOF_TOL_S
    )
    return (
        matched.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            F.when(age_ok, F.col("last_click_ts"))
            .cast("timestamp")
            .alias("matched_click_ts"),
            age_ok.alias("fresh"),
        )
    )


# ---------------------------------------------------------------------------
# drawdown_running_max
# ---------------------------------------------------------------------------

_DRAWDOWN_ORACLE = """
WITH series AS (
  SELECT o_custkey, o_orderdate, o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_totalprice IS NOT NULL
),
runs AS (
  SELECT o_custkey, o_orderdate, o_orderkey, cents,
         MAX(cents) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS peak
  FROM series
)
SELECT o_custkey,
       COUNT(*) AS n_orders,
       CAST(MAX(peak) AS BIGINT) AS peak_cents,
       CAST(MAX(peak - cents) AS BIGINT) AS max_drawdown_cents
FROM runs
GROUP BY o_custkey
HAVING COUNT(*) >= 3
"""


@register(
    "drawdown_running_max",
    oracle=_DRAWDOWN_ORACLE,
    description="Per-customer running peak and MAXIMUM DRAWDOWN of order "
    "totals in exact cents (the peak-to-trough risk metric) — one window "
    "pass plus one aggregate, both keyed on the same column",
    tags=("finance", "window", "extension"),
)
def drawdown_running_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running MAX then aggregate on the SAME partitioning key means one
    exchange total — the window's hash partitioning is reused by the
    groupBy. Integer cents end-to-end, so no float drift anywhere."""
    series = (
        tbl(spark, sf_dir, "orders")
        .where(F.col("o_totalprice").isNotNull())
        .select(
            "o_custkey",
            "o_orderdate",
            "o_orderkey",
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    runs = series.withColumn("peak", F.max("cents").over(w))
    return (
        runs.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max("peak").cast("long").alias("peak_cents"),
            F.max(F.col("peak") - F.col("cents")).cast("long").alias("max_drawdown_cents"),
        )
        .filter(F.col("n_orders") >= 3)
    )


# ---------------------------------------------------------------------------
# ml_kfold_stratified
# ---------------------------------------------------------------------------

_KFOLDS = 5

_KFOLD_ORACLE = f"""
WITH assign AS (
  SELECT doc_id, lang,
         {h60_duck("CAST(doc_id AS VARCHAR) || '|fold'")} % {_KFOLDS} AS fold
  FROM documents WHERE lang IS NOT NULL
)
SELECT lang, CAST(fold AS BIGINT) AS fold,
       COUNT(*) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
FROM assign GROUP BY lang, fold
"""


@register(
    "ml_kfold_stratified",
    oracle=_KFOLD_ORACLE,
    description=f"Deterministic stratified {_KFOLDS}-fold assignment "
    "(portable hash modulo k within each language stratum) with the fold-"
    "balance report — the replayable cross-validation prep step",
    tags=("sampling", "ml", "extension"),
)
def ml_kfold_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-modulo assignment is stateless and replayable: any executor can
    recompute any row's fold, folds are disjoint and exhaustive by
    construction, and within each stratum the hash uniformity balances
    folds. One map-side-combined aggregate on (lang, fold); no shuffle of
    the assignment itself is ever needed downstream — consumers filter
    `fold != i` for training splits, a pushed-down predicate."""
    assign = (
        spread(tbl(spark, sf_dir, "documents"))
        .where(F.col("lang").isNotNull())
        .select(
            "doc_id",
            "lang",
            (F.expr(h60_spark("CAST(doc_id AS STRING) || '|fold'")) % _KFOLDS).alias(
                "fold"
            ),
        )
    )
    return assign.groupBy("lang", "fold").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
    )


# ---------------------------------------------------------------------------
# feature_crosses_hashed
# ---------------------------------------------------------------------------

_CROSS_BUCKETS = 64

_CROSS_ORACLE = f"""
WITH crossed AS (
  SELECT c.c_mktsegment || '#' || n.n_name AS cross_val,
         {h60_duck("c.c_mktsegment || '#' || n.n_name")} % {_CROSS_BUCKETS} AS bucket
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       COUNT(*) AS n_rows,
       CAST(COUNT(DISTINCT cross_val) AS BIGINT) AS n_values,
       COUNT(DISTINCT cross_val) > 1 AS has_collision
FROM crossed GROUP BY bucket
"""


@register(
    "feature_crosses_hashed",
    oracle=_CROSS_ORACLE,
    description=f"Hashed cross features (mktsegment × nation) into "
    f"{_CROSS_BUCKETS} buckets with per-bucket collision accounting — the "
    "categorical-cross feature-engineering shape (hashing trick)",
    tags=("features", "ml", "extension"),
)
def feature_crosses_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick keeps the cross's cardinality bounded (5 segments
    × 25 nations = 125 values into 64 buckets here; billions of values at
    scale) without a vocabulary build. The nation dim broadcasts; the
    bucket aggregate is map-side combined on a 64-value key. Collision
    accounting (n_values per bucket) is the quality report feature stores
    publish with hashed features."""
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    crossed = (
        c.join(F.broadcast(n), n["n_nationkey"] == c["c_nationkey"])
        .select(F.expr("c_mktsegment || '#' || n_name").alias("cross_val"))
        .select(
            "cross_val",
            (F.expr(h60_spark("cross_val")) % _CROSS_BUCKETS).alias("bucket"),
        )
    )
    return crossed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("cross_val").cast("long").alias("n_values"),
        (F.countDistinct("cross_val") > 1).alias("has_collision"),
    )


# ---------------------------------------------------------------------------
# explode_outer_nulls
# ---------------------------------------------------------------------------

_EXPLODE_OUTER_ORACLE = f"""
WITH docs AS (
  SELECT doc_id,
         list_filter({_TOKS_DUCK}, t -> LENGTH(t) >= 8) AS long_toks
  FROM documents
),
padded AS (
  SELECT doc_id,
         CASE WHEN long_toks IS NULL OR LEN(long_toks) = 0
              THEN [NULL] ELSE long_toks END AS toks
  FROM docs
)
SELECT doc_id, UNNEST(toks) AS tok
FROM padded
"""


@register(
    "explode_outer_nulls",
    oracle=_EXPLODE_OUTER_ORACLE,
    description="explode_outer semantics: rows whose array is empty or NULL "
    "survive with a NULL element (LEFT-JOIN-UNNEST), proven against an "
    "oracle that pads empty arrays with [NULL] — the row-preserving fan-out "
    "every nested-data pipeline needs for audit completeness",
    tags=("relational", "explode", "nested", "extension"),
)
def explode_outer_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer is the row-preserving explode: downstream counts per
    doc_id still cover every document (an inner explode silently drops
    empty docs — the classic audit bug). Map-side fan-out, no shuffle."""
    docs = spread(tbl(spark, sf_dir, "documents")).select(
        "doc_id",
        F.expr(f"filter({_TOKS_SPARK}, t -> length(t) >= 8)").alias("long_toks"),
    )
    return docs.select("doc_id", F.explode_outer("long_toks").alias("tok"))
