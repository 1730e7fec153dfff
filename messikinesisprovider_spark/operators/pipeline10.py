"""Link prediction, round 3j.

``graph_jaccard_links``: common-neighbor Jaccard link prediction over the
co-purchase graph — for part pairs NOT already connected, score
|N(a) ∩ N(b)| / |N(a) ∪ N(b)| and keep the strongest candidates. The
classic "customers who bought X also bought Y two hops away" recommender
shape, and the third member of the graph family (communities = LPA,
reachability = k-hop, similarity = this).

Scaled-integer rational score (1e6 * common // (da + db - common)) keeps the
compare bit-exact; the wedge join is degree-capped the same way
triangle_count is (a super-hub part would otherwise contribute deg² wedges).

Reference parity note: the reference (SURVEY.md §0) has no graph surface;
extends the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .graph2 import _copurchase_edges

JACC_SCALE = 1_000_000
JACC_MIN_COMMON = 2  # candidate pairs need >= 2 shared neighbors
JACC_MAX_DEGREE = 1_000  # hub cap: parts this connected are co-purchase noise


@register(
    "graph_jaccard_links",
    oracle=f"""
    WITH e1 AS (SELECT pa, pb FROM (
           SELECT l_orderkey, l_partkey FROM lineitem GROUP BY ALL
         ) a(l_orderkey, pa)
         JOIN (SELECT l_orderkey, l_partkey FROM lineitem GROUP BY ALL
         ) b(l_orderkey, pb) USING (l_orderkey)
         WHERE pa < pb
         GROUP BY pa, pb HAVING COUNT(*) >= 2),
    edges AS (SELECT pa AS src, pb AS dst FROM e1
              UNION ALL SELECT pb, pa FROM e1),
    deg AS (SELECT src AS v, COUNT(*) AS d FROM edges GROUP BY src),
    -- hub cap: drop super-connected parts BEFORE the wedge join
    capped AS (
      SELECT e.src, e.dst FROM edges e
      JOIN deg ds ON ds.v = e.src JOIN deg dd ON dd.v = e.dst
      WHERE ds.d <= {JACC_MAX_DEGREE} AND dd.d <= {JACC_MAX_DEGREE}
    ),
    wedges AS (
      SELECT w1.dst AS a, w2.dst AS b, COUNT(*) AS common
      FROM capped w1 JOIN capped w2 ON w1.src = w2.src AND w1.dst < w2.dst
      GROUP BY w1.dst, w2.dst
      HAVING COUNT(*) >= {JACC_MIN_COMMON}
    ),
    nonedges AS (
      SELECT w.a, w.b, w.common FROM wedges w
      WHERE NOT EXISTS (SELECT 1 FROM e1 WHERE e1.pa = w.a AND e1.pb = w.b)
    )
    SELECT n.a, n.b, n.common, da.d AS deg_a, db.d AS deg_b,
           CAST(({JACC_SCALE} * n.common) // (da.d + db.d - n.common) AS BIGINT)
             AS jaccard_scaled
    FROM nonedges n
    JOIN deg da ON da.v = n.a JOIN deg db ON db.v = n.b
    """,
    description="Common-neighbor Jaccard link prediction over the co-purchase "
    f"graph (non-adjacent pairs, >= {JACC_MIN_COMMON} shared neighbors, "
    "scaled-integer score)",
    tags=("graph", "similarity", "extension"),
)
def graph_jaccard_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wedge join + anti-join + degree rejoin — all equi-joins on vertex keys.

    Scale plan: the wedge join shuffles the capped edge list on the shared
    neighbor (the same key both sides, one exchange reused); the
    ``JACC_MAX_DEGREE`` cap bounds per-neighbor fan-out to deg² <= 1e6
    wedge rows (the curse-of-the-last-reducer guard, same family as
    triangle_count's degree orientation); the already-an-edge anti-join and
    the degree rejoins are equi-joins against the slim edge/degree tables.
    Degrees are computed once on the UNCAPPED graph so the score's
    denominator is the true neighborhood size.
    """
    und = _copurchase_edges(spark, sf_dir)  # a < b
    edges = (
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(und.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .persist()
    )
    deg = edges.groupBy(F.col("src").alias("v")).agg(F.count(F.lit(1)).alias("d"))
    capped = (
        edges.join(F.broadcast(deg.filter(F.col("d") <= JACC_MAX_DEGREE)), edges.src == F.col("v"))
        .select("src", "dst")
        .join(
            F.broadcast(
                deg.filter(F.col("d") <= JACC_MAX_DEGREE).select(F.col("v").alias("v2"))
            ),
            F.col("dst") == F.col("v2"),
        )
        .select("src", "dst")
    )
    w1 = capped.select(F.col("src").alias("u"), F.col("dst").alias("a"))
    w2 = capped.select(F.col("src").alias("u"), F.col("dst").alias("b"))
    wedges = (
        w1.join(w2, "u")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
        .filter(F.col("common") >= JACC_MIN_COMMON)
    )
    nonedges = wedges.join(
        und, (wedges.a == und.a) & (wedges.b == und.b), "left_anti"
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("deg_b"))
    return (
        nonedges.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            "a",
            "b",
            "common",
            "deg_a",
            "deg_b",
            F.expr(f"({JACC_SCALE} * common) div (deg_a + deg_b - common)")
            .cast("bigint")
            .alias("jaccard_scaled"),
        )
    )
