"""Near-duplicate clustering: connected components over the similarity graph.

Pair lists (from Jaccard/MinHash/SimHash) answer "which documents are
similar"; a dedup pipeline needs "which documents form one group, and who is
the keeper". That's connected components.

The algorithm is the alternating large-star/small-star method (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14) — the
standard web-scale formulation, chosen over naive min-label propagation for
two reasons that matter at 100 TB:

* **Hub components don't serialize.** Label propagation funnels a giant
  component's labels through its hub key for O(diameter) rounds; the star
  operations restructure the graph toward stars directly and converge in
  O(log n) rounds with bounded per-key fan-in.
* **No per-round driver probe.** Convergence is checked with one
  count+checksum aggregate every `check_every` rounds (batched), not a
  `limit(1).count()` round-trip per iteration.

Each round is joins+groupBy only — no driver-side graph. The DuckDB oracle
computes the same fixpoint with a recursive CTE, so the component ids
(min doc_id per component) are hash-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import JACCARD_THRESHOLD, dedup_ngram_jaccard

_MAX_ROUNDS = 25  # alternating rounds; O(log n) suffices (SoCC'14 Thm 2)
_EDGES_PER_PARTITION = 100_000  # per-round partition sizing target


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to u's neighborhood minimum.
    Input/output: directed edge list (u, v)."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least(F.col("mv"), F.col("u")).alias("m"))
    )
    # No trailing distinct: duplicates (same (v,m) via different u) are
    # bounded by node degree and collapse in _small_star's own distinct —
    # saves one shuffle per round.
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Point every smaller-or-equal neighbor (and u itself) at the minimum of
    u's smaller neighborhood."""
    # canonical direction: u = max endpoint, v = min endpoint
    canon = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = canon.groupBy("u").agg(F.min("v").alias("m"))
    joined = canon.join(mins, "u")
    return (
        joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(joined.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    check_every: int = 1,
) -> DataFrame:
    """(node, component) — component = min node id reachable.

    Alternating large-star/small-star rounds until the edge set reaches its
    fixpoint (every edge points node → component root). The convergence
    probe is one count+checksum aggregate over the already-materialized
    round output (set `check_every` > 1 to batch it further) — never a
    per-row comparison join against the previous round, and never a
    recompute: the round is checkpointed before the probe reads it.

    Each round is materialized with `localCheckpoint(eager=True)`: iterative
    self-join/distinct plans grow with every round, and without lineage
    truncation Catalyst re-analyzes (and on any cache miss re-EXECUTES) the
    whole chain from the source — planning cost alone goes superlinear. The
    checkpoint bounds every round at O(1) plan depth. On a multi-executor
    cluster prefer `setCheckpointDir` + `.checkpoint()` for the same
    truncation with fault tolerance (localCheckpoint state dies with an
    executor)."""
    # Materialize the (possibly expensive) upstream edge pipeline exactly
    # once; both the node universe and the round-0 edge set derive from it.
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(
        eager=True
    )
    nodes = raw.select(F.col("u").alias("node")).union(
        raw.select(F.col("v").alias("node"))
    ).distinct()
    e = raw.filter(F.col("u") != F.col("v")).distinct()
    prev_sig = None
    # Partition sizing per round: star rounds shrink the edge set
    # geometrically, and a near-converged round over 32 near-empty
    # partitions pays pure scheduler overhead. The convergence probe
    # already returns the exact edge count, so each round re-sizes the NEXT
    # round's partitioning to ~`_EDGES_PER_PARTITION` edges per task
    # (coalesce: narrow, no shuffle). At 100 TB the first rounds keep full
    # parallelism — the clamp only bites as the fixpoint nears.
    max_parts = edges.sparkSession.sparkContext.defaultParallelism
    n_edges = None
    for round_no in range(1, _MAX_ROUNDS + 1):
        # Lazy checkpoint + probe: the convergence aggregate is the ONE job
        # per round — it materializes the checkpoint (truncating lineage for
        # the next round) and reads the count+checksum off it in the same
        # pass. No separate materialization job, no per-row comparison join.
        new_e = _small_star(_large_star(e))
        if n_edges is not None:
            parts = max(1, min(max_parts, -(-n_edges // _EDGES_PER_PARTITION)))
            if parts < max_parts:
                new_e = new_e.coalesce(parts)
        new_e = new_e.localCheckpoint(eager=False)
        if round_no % check_every == 0 or round_no == _MAX_ROUNDS:
            # bit_xor: order-independent, overflow-free under ANSI mode
            sig = new_e.agg(
                F.count(F.lit(1)).alias("n"),
                F.expr("bit_xor(xxhash64(u, v))").alias("h"),
            ).collect()[0]
            n_edges = sig["n"]
            sig = (sig["n"], sig["h"])
            e.unpersist()
            e = new_e
            if sig == prev_sig:
                break
            prev_sig = sig
        else:
            e.unpersist()
            e = new_e
    # fixpoint edges are (node -> root); roots and isolated nodes keep their
    # own id. min() guards the (round-capped) case of residual multi-edges.
    pointers = e.groupBy(F.col("u").alias("node")).agg(F.min("v").alias("component"))
    labels = nodes.join(pointers, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )
    return labels


@register(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE sh AS (
      SELECT doc_id, UNNEST(list_distinct(
        CASE WHEN LEN(str_split(text, ' ')) >= 3 THEN
          list_transform(range(1, LEN(str_split(text, ' ')) - 1),
            i -> concat_ws(' ', str_split(text, ' ')[i], str_split(text, ' ')[i+1], str_split(text, ' ')[i+2]))
        ELSE [] END)) AS g
      FROM documents
    ),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    edges AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN counts ca ON ca.doc_id = i.doc_a
      JOIN counts cb ON cb.doc_id = i.doc_b
      WHERE i.n_common * 1.0 / (ca.n + cb.n - i.n_common) >= {JACCARD_THRESHOLD}
    ),
    sym AS (
      SELECT doc_a AS u, doc_b AS v FROM edges
      UNION SELECT doc_b, doc_a FROM edges
    ),
    reach(node, label) AS (
      SELECT u, u FROM sym
      UNION
      SELECT s.u, r.label FROM sym s JOIN reach r ON s.v = r.node
    ),
    comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node)
    SELECT CAST(component AS BIGINT) AS component,
           COUNT(*) AS cluster_size
    FROM comp
    GROUP BY component
    """,
    description="Near-dup clusters: connected components over the Jaccard graph (large-star/small-star)",
    tags=("dedup", "clustering", "graph", "extension"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(edges)
    return comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
