"""Round 4 additions, part 6: k-core peeling over the shared edge table.

``graph_kcore_peel`` — THREE rounds of degree-K peeling (remove every
vertex with degree < K, drop incident edges, repeat) over the materialized
support-2 co-purchase graph. The k-core fixpoint is confluent, but lockstep
verifiability demands a FIXED round count, so this is the graph twin of
``kmeans_lloyd_rounds`` / ``bpe_train_rounds``: both engines execute
exactly 3 unrolled peels and compare per-round survivor accounting
(vertices kept, edges kept, vertex checksum).

Shape per round: degree = one union + one groupBy on the CURRENT edge set
(shrinking monotonically), then two equi-joins to filter edges to kept
endpoints. Each round's edge set is persisted so the 3 report rows don't
re-execute earlier rounds per branch (the dedup_clusters lineage
discipline). At 100 TB the edge table is the bucketed warehouse table —
the mining cost is paid once globally (graphshared), never per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .graphshared import _SUPPORT, copurchase_edges

_KCORE_K = 3
_KCORE_ROUNDS = 3

# Unrolled oracle: e0 = the mining CTE (identical to graphshared's), then
# per round r: degrees over e{r-1}, kept set k{r}, filtered edges e{r}.
# Every stage is AS MATERIALIZED: DuckDB inlines plain CTEs, so the
# per-round scalar subqueries would re-evaluate the whole mining+peel
# chain each time (measured 24 s -> sub-second with materialization).
_MINE_CTE = f"""
op AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
freq AS MATERIALIZED (
  SELECT l_partkey FROM op GROUP BY 1 HAVING COUNT(*) >= {_SUPPORT}
),
fop AS MATERIALIZED (SELECT op.* FROM op JOIN freq USING (l_partkey)),
e0 AS MATERIALIZED (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM fop a JOIN fop b ON a.l_orderkey = b.l_orderkey
   AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {_SUPPORT}
)"""


def _kcore_oracle() -> str:
    parts = [_MINE_CTE]
    for r in range(1, _KCORE_ROUNDS + 1):
        parts.append(
            f"""
d{r} AS MATERIALIZED (
  SELECT v, COUNT(*) AS n FROM (
    SELECT a AS v FROM e{r - 1} UNION ALL SELECT b FROM e{r - 1}
  ) GROUP BY 1
),
k{r} AS MATERIALIZED (SELECT v FROM d{r} WHERE n >= {_KCORE_K}),
e{r} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{r - 1} e
  JOIN k{r} ka ON e.a = ka.v JOIN k{r} kb ON e.b = kb.v
)"""
        )
    selects = [
        f"""SELECT {r} AS round,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM k{r}) AS n_vertices,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e{r}) AS n_edges,
       (SELECT CAST(COALESCE(SUM(v), 0) AS BIGINT) FROM k{r}) AS v_checksum"""
        for r in range(1, _KCORE_ROUNDS + 1)
    ]
    return "WITH " + ",".join(parts) + " " + " UNION ALL ".join(selects)


@register(
    "graph_kcore_peel",
    oracle=_kcore_oracle(),
    description=f"{_KCORE_ROUNDS} rounds of k-core peeling (K={_KCORE_K}) "
    "over the shared co-purchase edge table: per-round survivor vertices, "
    "edges and vertex checksum — the iterative-graph twin of "
    "kmeans_lloyd_rounds, lockstep-unrolled in both engines",
    tags=("graph", "iterative", "kcore", "extension"),
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round degree-K peel (see module doc). Each round persists its
    shrinking edge set so the per-round report rows don't re-run earlier
    rounds; persists are released eagerly after the report is computed."""
    edges = copurchase_edges(spark, sf_dir)
    reports = []
    persisted = []
    for rnd in range(1, _KCORE_ROUNDS + 1):
        deg = (
            edges.select(F.col("a").alias("v"))
            .unionAll(edges.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        kept = deg.filter(F.col("n") >= _KCORE_K).select("v").persist()
        edges = (
            edges.join(kept.withColumnRenamed("v", "a"), "a")
            .join(kept.withColumnRenamed("v", "b"), "b")
            .select("a", "b")
            .persist()
        )
        persisted.extend([kept, edges])
        stats = kept.agg(
            F.count(F.lit(1)).cast("long").alias("n_vertices"),
            F.coalesce(F.sum("v"), F.lit(0)).cast("long").alias("v_checksum"),
        ).crossJoin(
            edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        )
        reports.append(
            stats.select(
                F.lit(rnd).cast("int").alias("round"),
                "n_vertices",
                "n_edges",
                "v_checksum",
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionAll(r)
    # materialize the report (3 rows) before releasing the round caches
    out = out.localCheckpoint(eager=True)
    for df in persisted:
        df.unpersist()
    return out
