"""Round 8 additions, part 5: k-truss peeling, JL projection audit,
Fellegi-Sunter match weights.

``graph_ktruss_peel`` (Cohen 2008, "Trusses: cohesive subgraphs for social
network analysis"): two rounds of edge peeling by triangle support over
the shared co-purchase graph — the EDGE-cohesion twin of
``graph_kcore_peel``'s vertex peel (a k-truss is strictly stronger than a
(k-1)-core). Fixed round count for lockstep verifiability, per-round
survivor accounting, triangles via the degree-ordered orientation that
``triangle_count`` established (per-vertex work bounded by sqrt(m)).

``embedding_jl_distortion`` (Johnson-Lindenstrauss; Achlioptas 2003
"Database-friendly random projections" for the ±1 matrix): project the
64-dim embeddings to 16 dims through a LITERAL ±1 matrix (seeded,
embedded verbatim in both engines — the plane-embed convention), pair
each vector with its successor within its label class, and report both
squared distances plus the distortion ratio per pair. The audit a team
runs before trusting a projected index; the JL bound itself is pinned by
test, not oracle (it is probabilistic).

``er_fellegi_sunter`` (Fellegi & Sunter, JASA 1969): probabilistic record
linkage over nation-blocked customer pairs. u-probabilities are ESTIMATED
exactly from the data (within-block value-frequency pair counts — the
standard "random pairs are non-matches" approximation, computed as exact
rationals without enumerating pairs); m-probabilities are literals; each
candidate pair gets per-field agreement bits and the summed log2(m/u) /
log2((1-m)/(1-u)) weight. Scoring enumerates pairs only WITHIN blocks
(the FS production shape); the registry's sorted-neighborhood and
signature blockers are the high-cardinality alternatives.

Reference parity note: the reference engine (SURVEY.md §0) has no
analytics surface; these extend the engine per the round brief.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .graph3 import _MINE_CTE
from .graphshared import copurchase_edges
from .relational import tbl

# --------------------------------------------------------------------------
# graph_ktruss_peel
# --------------------------------------------------------------------------

_TRUSS_K = 3  # keep edges in >= K-2 = 1 triangle
_TRUSS_ROUNDS = 2
_EDGE_CK = 100003  # checksum multiplier: a * _EDGE_CK + b summed over edges


def _ktruss_oracle() -> str:
    parts = [_MINE_CTE]
    for r in range(1, _TRUSS_ROUNDS + 1):
        parts.append(
            f"""
t{r} AS MATERIALIZED (
  SELECT ab.a AS x, ab.b AS y, bc.b AS z
  FROM e{r - 1} ab JOIN e{r - 1} bc ON ab.b = bc.a
  JOIN e{r - 1} ac ON ac.a = ab.a AND ac.b = bc.b
),
sup{r} AS MATERIALIZED (
  SELECT a, b, COUNT(*) AS s FROM (
    SELECT x AS a, y AS b FROM t{r}
    UNION ALL SELECT x, z FROM t{r}
    UNION ALL SELECT y, z FROM t{r}
  ) GROUP BY 1, 2
),
e{r} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{r - 1} e
  JOIN sup{r} s ON e.a = s.a AND e.b = s.b
  WHERE s.s >= {_TRUSS_K - 2}
)"""
        )
    selects = [
        f"""SELECT {r} AS round,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM t{r}) AS n_triangles,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e{r}) AS n_edges,
       (SELECT CAST(COALESCE(SUM(a * {_EDGE_CK} + b), 0) AS BIGINT) FROM e{r})
         AS e_checksum"""
        for r in range(1, _TRUSS_ROUNDS + 1)
    ]
    return "WITH " + ",".join(parts) + " " + " UNION ALL ".join(selects)


@register(
    "graph_ktruss_peel",
    oracle=_ktruss_oracle(),
    description=f"{_TRUSS_ROUNDS} rounds of k-truss edge peeling "
    f"(K={_TRUSS_K}: every surviving edge sits in >= {_TRUSS_K - 2} "
    "triangle of the CURRENT edge set) over the shared co-purchase graph; "
    "per-round triangle count, surviving edges and edge checksum — the "
    "edge-cohesion twin of graph_kcore_peel, triangles degree-oriented",
    tags=("graph", "iterative", "truss", "extension"),
)
def graph_ktruss_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per round: orient the current edges low-(degree,id) -> high, join
    wedges at their lowest-degree vertex (Suri & Vassilvitskii WWW'11 —
    per-vertex work ~ sqrt(m), not max-degree squared), close against the
    canonical edge set, explode each triangle into its three canonical
    edges, count support, keep edges with support >= K-2. Edge sets are
    persisted per round and released after the 2-row report materializes
    (the graph_kcore_peel lineage discipline)."""
    from .graph2 import oriented_triangles

    edges = copurchase_edges(spark, sf_dir)
    reports = []
    persisted = []
    for rnd in range(1, _TRUSS_ROUNDS + 1):
        tri = oriented_triangles(edges).persist()
        # three canonical (a < b) edges of each (x < y, u) triangle
        tri_edges = tri.select(
            F.explode(
                F.array(
                    F.struct(
                        F.least("u", "x").alias("a"), F.greatest("u", "x").alias("b")
                    ),
                    F.struct(
                        F.least("u", "y").alias("a"), F.greatest("u", "y").alias("b")
                    ),
                    F.struct(F.col("x").alias("a"), F.col("y").alias("b")),
                )
            ).alias("e")
        ).select("e.a", "e.b")
        sup = tri_edges.groupBy("a", "b").agg(F.count(F.lit(1)).alias("s"))
        edges = (
            edges.join(sup, ["a", "b"], "left")
            .filter(F.coalesce(F.col("s"), F.lit(0)) >= _TRUSS_K - 2)
            .select("a", "b")
            .persist()
        )
        persisted.extend([tri, edges])
        stats = tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles")).crossJoin(
            edges.agg(
                F.count(F.lit(1)).cast("long").alias("n_edges"),
                F.coalesce(F.sum(F.col("a") * _EDGE_CK + F.col("b")), F.lit(0))
                .cast("long")
                .alias("e_checksum"),
            )
        )
        reports.append(
            stats.select(
                F.lit(rnd).cast("int").alias("round"),
                "n_triangles",
                "n_edges",
                "e_checksum",
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionAll(r)
    out = out.localCheckpoint(eager=True)
    for df in persisted:
        df.unpersist()
    return out


# --------------------------------------------------------------------------
# embedding_jl_distortion
# --------------------------------------------------------------------------

_JL_IN = 64
_JL_OUT = 16


def _jl_matrix() -> list[list[int]]:
    """±1 projection matrix, seeded from md5 so both engines embed the SAME
    literals (the minhash-coefficient convention). Row j, column i."""
    rows = []
    for j in range(_JL_OUT):
        row = []
        for i in range(_JL_IN):
            h = hashlib.md5(f"jl:{j}:{i}".encode()).digest()
            row.append(1 if h[0] & 1 else -1)
        rows.append(row)
    return rows


_JL_R = _jl_matrix()
_JL_R_SPARK = (
    "array(" + ", ".join("array(" + ", ".join(f"{v}D" for v in row) + ")" for row in _JL_R) + ")"
)
_JL_R_DUCK = (
    "[" + ", ".join("[" + ", ".join(f"{v}.0" for v in row) + "]" for row in _JL_R) + "]"
)

# projected vector: y[j] = sum_i R[j][i] * x[i]  (left fold over i, both engines)
_JL_PROJ_SPARK = (
    f"transform(sequence(0, {_JL_OUT - 1}), j -> "
    f"aggregate(zip_with(embedding, element_at({_JL_R_SPARK}, j + 1), "
    "(x, r) -> CAST(x AS DOUBLE) * r), 0D, (acc, p) -> acc + p))"
)
_JL_PROJ_DUCK = (
    f"list_transform(range(0, {_JL_OUT}), j -> "
    f"list_sum(list_transform(range(1, {_JL_IN + 1}), "
    f"i -> embedding[i]::DOUBLE * ({_JL_R_DUCK})[j + 1][i])))"
)

_JL_ORACLE = f"""
WITH pr AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS x, {_JL_PROJ_DUCK} AS y
  FROM embeddings
),
pairs AS (
  SELECT label, vec_id AS id_a,
         LEAD(vec_id) OVER w AS id_b,
         x AS xa, LEAD(x) OVER w AS xb,
         y AS ya, LEAD(y) OVER w AS yb
  FROM pr
  WINDOW w AS (PARTITION BY label ORDER BY vec_id)
)
SELECT label, id_a, id_b,
       CAST(ROUND(d_orig, 6) AS DOUBLE) AS dist_sq_orig,
       CAST(ROUND(d_proj / {_JL_OUT}, 6) AS DOUBLE) AS dist_sq_proj,
       CAST(ROUND(CASE WHEN d_orig > 0 THEN d_proj / {_JL_OUT} / d_orig END, 6)
            AS DOUBLE) AS distortion
FROM (
  SELECT label, id_a, id_b,
         list_sum(list_transform(range(1, {_JL_IN + 1}),
           i -> (xa[i] - xb[i]) * (xa[i] - xb[i]))) AS d_orig,
         list_sum(list_transform(range(1, {_JL_OUT + 1}),
           i -> (ya[i] - yb[i]) * (ya[i] - yb[i]))) AS d_proj
  FROM pairs WHERE id_b IS NOT NULL
)
ORDER BY label, id_a
"""


@register(
    "embedding_jl_distortion",
    oracle=_JL_ORACLE,
    description=f"Johnson-Lindenstrauss audit: project {_JL_IN}-dim embeddings "
    f"to {_JL_OUT} dims through a literal seeded ±1 matrix (Achlioptas 2003), "
    "pair each vector with its successor in its label class, report exact "
    "squared distances (original vs projected/k) and the distortion ratio — "
    "the fidelity check before switching an ANN index to projected vectors",
    tags=("embedding", "projection", "audit", "extension"),
)
def embedding_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection is one map-side codegen expression per row (no shuffle);
    the successor pairing is one window over (label, vec_id) — at 100 TB
    the audit samples pairs, it never joins all-pairs. Sums are left folds
    in array-index order so both engines add in the same sequence."""
    from pyspark.sql import Window

    e = tbl(spark, sf_dir, "embeddings")
    pr = e.select(
        "vec_id",
        "label",
        F.expr("transform(embedding, v -> CAST(v AS DOUBLE))").alias("x"),
        F.expr(_JL_PROJ_SPARK).alias("y"),
    )
    w = Window.partitionBy("label").orderBy("vec_id")
    pairs = pr.select(
        "label",
        F.col("vec_id").alias("id_a"),
        F.lead("vec_id").over(w).alias("id_b"),
        F.col("x").alias("xa"),
        F.lead("x").over(w).alias("xb"),
        F.col("y").alias("ya"),
        F.lead("y").over(w).alias("yb"),
    ).filter(F.col("id_b").isNotNull())
    d_orig = F.expr(
        "aggregate(zip_with(xa, xb, (p, q) -> (p - q) * (p - q)), 0D, (acc, v) -> acc + v)"
    )
    d_proj = F.expr(
        "aggregate(zip_with(ya, yb, (p, q) -> (p - q) * (p - q)), 0D, (acc, v) -> acc + v)"
    )
    scored = pairs.select(
        "label",
        "id_a",
        "id_b",
        d_orig.alias("d_orig"),
        (d_proj / F.lit(float(_JL_OUT))).alias("d_proj_k"),
    )
    return scored.select(
        "label",
        "id_a",
        "id_b",
        F.round("d_orig", 6).cast("double").alias("dist_sq_orig"),
        F.round("d_proj_k", 6).cast("double").alias("dist_sq_proj"),
        F.round(
            F.when(F.col("d_orig") > 0, F.col("d_proj_k") / F.col("d_orig")), 6
        )
        .cast("double")
        .alias("distortion"),
    ).orderBy("label", "id_a")


# --------------------------------------------------------------------------
# er_fellegi_sunter
# --------------------------------------------------------------------------

# m-probabilities: literal priors for P(field agrees | pair is a match)
_FS_M = {"seg": 0.95, "bal": 0.9, "cents": 0.85}
_FS_MIN_AGREE = 2  # report pairs agreeing on >= 2 of the 3 fields

_FS_FIELDS_DUCK = """
  SELECT c_custkey AS id, c_nationkey AS blk,
         c_mktsegment AS f_seg,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS f_bal,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) % 100 AS f_cents
  FROM customer
"""

def _fs_oracle() -> str:
    # u_i = P(agree on field i | random within-block pair), exact rational:
    # sum over blocks of sum_v f_v*(f_v-1)  /  sum over blocks of n*(n-1).
    per_field = []
    for f in ("seg", "bal", "cents"):
        per_field.append(
            f"""a_{f} AS (
  SELECT CAST(SUM(c * (c - 1)) AS BIGINT) AS agree
  FROM (SELECT blk, f_{f}, COUNT(*) AS c FROM r GROUP BY 1, 2)
)"""
        )
    weights = []
    for f, m in _FS_M.items():
        weights.append(
            f"CASE WHEN p.ag_{f} = 1 THEN log2({m} / u.u_{f}) "
            f"ELSE log2({1 - m} / (1 - u.u_{f})) END"
        )
    w_expr = " + ".join(weights)
    return f"""
WITH r AS MATERIALIZED ({_FS_FIELDS_DUCK}),
tot AS (
  SELECT CAST(SUM(c * (c - 1)) AS BIGINT) AS pairs2
  FROM (SELECT blk, COUNT(*) AS c FROM r GROUP BY 1)
),
{", ".join(per_field)},
u AS (
  SELECT (SELECT agree FROM a_seg) * 1.0 / (SELECT pairs2 FROM tot) AS u_seg,
         (SELECT agree FROM a_bal) * 1.0 / (SELECT pairs2 FROM tot) AS u_bal,
         (SELECT agree FROM a_cents) * 1.0 / (SELECT pairs2 FROM tot) AS u_cents
),
p AS (
  SELECT a.id AS id_a, b.id AS id_b, a.blk,
         CASE WHEN a.f_seg = b.f_seg THEN 1 ELSE 0 END AS ag_seg,
         CASE WHEN a.f_bal = b.f_bal THEN 1 ELSE 0 END AS ag_bal,
         CASE WHEN a.f_cents = b.f_cents THEN 1 ELSE 0 END AS ag_cents
  FROM r a JOIN r b ON a.blk = b.blk AND a.id < b.id
)
SELECT id_a, id_b, blk AS block, ag_seg, ag_bal, ag_cents,
       CAST(ROUND({w_expr}, 6) AS DOUBLE) AS fs_weight
FROM p CROSS JOIN u
WHERE ag_seg + ag_bal + ag_cents >= {_FS_MIN_AGREE}
"""


@register(
    "er_fellegi_sunter",
    oracle=_fs_oracle(),
    description="Fellegi-Sunter (JASA 1969) probabilistic linkage over "
    "nation-blocked customer pairs: u-probabilities estimated exactly from "
    "within-block value frequencies (no pair enumeration), literal "
    "m-priors, per-pair agreement bits on (mktsegment, acctbal-bucket, "
    "acctbal-cents) and the summed log2 match weight; pairs reported at "
    f">= {_FS_MIN_AGREE}/3 agreements",
    tags=("linkage", "probabilistic", "extension"),
)
def er_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """u-estimation is two tiny aggregations (value-frequency sums), never
    a pair join; pair enumeration happens only within blocks (the FS
    production shape — the registry's sorted-neighborhood / signature
    blockers are the drop-in replacements when blocks get hot). The 1-row
    u table rides a broadcast cross join into the scoring select."""
    c = tbl(spark, sf_dir, "customer")
    r = c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").alias("blk"),
        F.col("c_mktsegment").alias("f_seg"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("f_bal"),
        F.expr("CAST(ROUND(c_acctbal * 100) AS BIGINT) % 100").alias("f_cents"),
    )
    tot = r.groupBy("blk").agg(F.count(F.lit(1)).alias("c")).agg(
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("pairs2")
    )
    agrees = []
    for f in ("seg", "bal", "cents"):
        agrees.append(
            r.groupBy("blk", f"f_{f}")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(
                F.sum(F.col("c") * (F.col("c") - 1))
                .cast("long")
                .alias(f"agree_{f}")
            )
        )
    u = tot.crossJoin(agrees[0]).crossJoin(agrees[1]).crossJoin(agrees[2]).select(
        (F.col("agree_seg") / F.col("pairs2")).alias("u_seg"),
        (F.col("agree_bal") / F.col("pairs2")).alias("u_bal"),
        (F.col("agree_cents") / F.col("pairs2")).alias("u_cents"),
    )
    a = r.select(
        F.col("id").alias("id_a"),
        "blk",
        F.col("f_seg").alias("sa"),
        F.col("f_bal").alias("ba"),
        F.col("f_cents").alias("pa"),
    )
    b = r.select(
        F.col("id").alias("id_b"),
        "blk",
        F.col("f_seg").alias("sb"),
        F.col("f_bal").alias("bb"),
        F.col("f_cents").alias("pb"),
    )
    pairs = (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.col("blk").alias("block"),
            # when/otherwise, not a bare cast: a NULL field must read as
            # disagreement (0) exactly like the oracle's CASE, never NULL
            F.when(F.col("sa") == F.col("sb"), 1).otherwise(0).alias("ag_seg"),
            F.when(F.col("ba") == F.col("bb"), 1).otherwise(0).alias("ag_bal"),
            F.when(F.col("pa") == F.col("pb"), 1).otherwise(0).alias("ag_cents"),
        )
        .filter(F.col("ag_seg") + F.col("ag_bal") + F.col("ag_cents") >= _FS_MIN_AGREE)
    )
    terms = []
    for f, m in _FS_M.items():
        terms.append(
            F.when(
                F.col(f"ag_{f}") == 1, F.log2(F.lit(m) / F.col(f"u_{f}"))
            ).otherwise(F.log2(F.lit(1 - m) / (F.lit(1.0) - F.col(f"u_{f}"))))
        )
    return pairs.crossJoin(F.broadcast(u)).select(
        "id_a",
        "id_b",
        "block",
        "ag_seg",
        "ag_bal",
        "ag_cents",
        F.round(terms[0] + terms[1] + terms[2], 6).cast("double").alias("fs_weight"),
    )
