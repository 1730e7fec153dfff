"""Near-duplicate clustering: connected components over the similarity graph.

Pair lists (from Jaccard/MinHash/SimHash) answer "which documents are
similar"; a dedup pipeline needs "which documents form one group, and who is
the keeper". That's connected components. The distributed algorithm is
alternating min-label propagation — each iteration every node adopts the
smallest label among itself and its neighbors, done entirely with
joins+groupBy (no driver-side graph): O(diameter) rounds, each one shuffle.
The synthetic near-dup graphs here have tiny diameter; web-scale dedup runs
the same loop with large-star/small-star optimizations.

The DuckDB oracle computes the same fixpoint with a recursive CTE, so the
component ids (min doc_id per component) are hash-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import JACCARD_THRESHOLD, dedup_ngram_jaccard

_MAX_ITERS = 20


def connected_components(edges: DataFrame, src: str = "doc_a", dst: str = "doc_b") -> DataFrame:
    """(node, component) — component = min node id reachable. Pure DataFrame
    min-label propagation; `edges` is undirected (one row per pair)."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    # symmetric adjacency incl. self-loop so isolated updates keep own label
    adj = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .union(nodes.select(F.col("node").alias("u"), F.col("node").alias("v")))
        .distinct()
        .persist()
    )
    labels = nodes.select("node", F.col("node").alias("component")).persist()
    for _ in range(_MAX_ITERS):
        # every node adopts min(label of neighbors)
        new_labels = (
            adj.join(labels, adj.v == labels.node)
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("component").alias("component"))
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    adj.unpersist()
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
    description="Near-dup clusters: connected components over the Jaccard graph (min-label propagation)",
    tags=("dedup", "clustering", "graph", "extension"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(edges)
    return comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
