"""Graph analytics beyond connected components (round 2, appended):
triangle counting with degree-ordered orientation.

Triangles are the building block of clustering-coefficient / community
metrics over similarity and co-occurrence graphs (here: the co-purchase
graph that `copurchase_pairs` mines). The naive wedge join is quadratic in
the max degree; the standard distributed fix (Suri & Vassilvitskii, WWW'11
"Counting Triangles and the Curse of the Last Reducer") orients every edge
from the lower-(degree, id) endpoint to the higher one, so each wedge is
generated at its LOWEST-degree vertex and per-vertex work is bounded by
(max out-degree)² ≈ (√m)² instead of (max degree)².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register

_SUPPORT = 2  # co-purchase support for the triangle edge set


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected unique edges (a < b) of the support-{_SUPPORT} co-purchase
    graph. Round 4: reads the SHARED materialized bucketed edge table
    (`graphshared.ensure_copurchase_edges`) instead of re-mining the
    lineitem self-join per query — the mining moved there verbatim, and
    `graph_edges_materialized` oracle-verifies the layout step."""
    from .graphshared import copurchase_edges

    return copurchase_edges(spark, sf_dir)


def oriented_triangles(edges: DataFrame) -> DataFrame:
    """Triangles of an undirected simple edge list (columns a, b; one row
    per unordered edge) via degree-ordered wedge orientation. Returns the
    (x, y, u) triangle rows pre-count."""
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    ranked = (
        edges.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        # orient low-(degree, id) -> high-(degree, id)
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
    )
    w1 = ranked.select(F.col("u"), F.col("v").alias("x"))
    w2 = ranked.select(F.col("u"), F.col("v").alias("y"))
    wedges = w1.join(w2, "u").filter(F.col("x") < F.col("y"))
    # close the wedge: an (x, y) edge in EITHER canonical direction
    closing = ranked.select(
        F.least("u", "v").alias("x"), F.greatest("u", "v").alias("y")
    )
    return wedges.join(closing, ["x", "y"])



@register(
    "triangle_count",
    oracle=f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    freq AS (SELECT l_partkey FROM op GROUP BY 1 HAVING COUNT(*) >= {_SUPPORT}),
    fop AS (SELECT op.* FROM op JOIN freq USING (l_partkey)),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM fop a JOIN fop b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    e AS (SELECT pa AS a, pb AS b FROM pairs GROUP BY 1, 2
          HAVING COUNT(*) >= {_SUPPORT})
    SELECT COUNT(*) AS n_triangles,
           (SELECT COUNT(*) FROM e) AS n_edges
    FROM e ab
    JOIN e bc ON ab.b = bc.a
    JOIN e ac ON ac.a = ab.a AND ac.b = bc.b
    """,
    description="Triangle count of the co-purchase graph via degree-ordered "
    "orientation (curse-of-the-last-reducer guard); oracle = direct "
    "a<b<c triple join",
    tags=("graph", "triangles", "extension"),
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triangle counting with the degree-orientation guard.

    Wedges are generated only at a vertex that is the (degree, id)-minimum
    of both its edges, so a celebrity vertex of degree d contributes
    wedges at its LOW-degree neighbors instead of d²/2 at itself — the
    skew fix the naive id-ordered join lacks. The oracle closes the same
    triangles with the plain a<b<c triple join (different plan, same
    count), so the orientation logic itself is under the hash check.

    Scale: degrees are one map-side-combined aggregation, broadcast back
    (node-id + degree is tiny relative to edges); the wedge join and the
    closing join are equi-joins on vertex keys. Edge count rides along to
    pin the graph itself.
    """
    edges = _copurchase_edges(spark, sf_dir).persist()
    tri = oriented_triangles(edges)
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return tri.agg(F.count(F.lit(1)).alias("n_triangles")).crossJoin(
        F.broadcast(n_edges)
    )
