"""Round 4 additions, part 41: consistent-hash placement and churn labels.

- ``consistent_hash_ring_plan`` — the placement layer under every
  distributed cache/shard router: 8 storage nodes x 16 virtual points
  hashed onto the 2^60 ring (portable 60-bit hash, all ring positions
  precomputed in Python and embedded as literals — metadata, like IVF
  centroids), each document owned by the first ring point clockwise from
  its hash.  The query emits per-node placement counts AND the property
  the ring exists for: when node 'n3' leaves, ONLY its documents move
  (moved == owned-by-n3, pinned in test and visible in the output as
  exact counts) — a modulo router would reshuffle nearly everything.
  Ownership is a literal CASE ladder over sorted ring positions: pure
  codegen, zero joins.

- ``churn_label_daily`` — leakage-safe label generation for a
  retention model: a user is CHURNED on day D iff active on D and silent
  on D+1 — the label for D is only knowable after D+1 closes, so the
  last observed day emits NULL labels (not false negatives).
  Per-user-day activity -> LEAD over the user's day sequence (gaps
  respected by date arithmetic, not row adjacency) -> per-day cohort
  rates as exact integer pairs.  (Days, not weeks/months: this corpus's
  users are all active every week, so coarser labels are vacuous.)
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import events_tbl, tbl

# ---------------------------------------------------------------------------
# consistent_hash_ring_plan
# ---------------------------------------------------------------------------

_NODES = tuple(f"n{i}" for i in range(8))
_VNODES = 16
_DEPARTING = "n3"


def _ring() -> list[tuple[int, str]]:
    """(position, node) ring points — deterministic metadata, like IVF
    centroid literals; 128 points for 8 nodes."""
    pts = []
    for node in _NODES:
        for v in range(_VNODES):
            h = int(hashlib.md5(f"ring|{node}|{v}".encode()).hexdigest()[:15], 16)
            pts.append((h, node))
    return sorted(pts)


def _owner_case(ring: list[tuple[int, str]], hexpr: str) -> str:
    """First ring point clockwise (>= hash, wrapping to the smallest)."""
    clauses = " ".join(
        f"WHEN {hexpr} <= {pos} THEN '{node}'" for pos, node in ring
    )
    wrap = ring[0][1]
    return f"CASE {clauses} ELSE '{wrap}' END"


def _ring_without(node: str) -> list[tuple[int, str]]:
    return [(p, n) for p, n in _ring() if n != node]


def _ring_oracle() -> str:
    h = h60_duck("CAST(doc_id AS VARCHAR)")
    own_before = _owner_case(_ring(), "hv")
    own_after = _owner_case(_ring_without(_DEPARTING), "hv")
    return f"""
WITH hashed AS (SELECT doc_id, ({h}) AS hv FROM documents),
placed AS (
  SELECT doc_id, {own_before} AS owner, {own_after} AS owner_after
  FROM hashed
)
SELECT owner AS node,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN owner_after <> owner THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
FROM placed
GROUP BY owner
"""


@register(
    "consistent_hash_ring_plan",
    oracle=_ring_oracle(),
    description=f"Consistent-hash placement: {len(_NODES)} nodes x "
    f"{_VNODES} virtual ring points (positions precomputed metadata "
    "literals, ownership a pure-codegen CASE ladder — zero joins); emits "
    f"per-node counts plus the rebalance accounting when {_DEPARTING} "
    "leaves — only the departed node's documents move (n_moved == n_docs "
    "exactly there, 0 elsewhere), the minimal-disruption property a "
    "modulo router lacks",
    tags=("lakehouse", "sharding", "extension"),
)
def consistent_hash_ring_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = h60_spark("CAST(doc_id AS STRING)")
    own_before = _owner_case(_ring(), "hv")
    own_after = _owner_case(_ring_without(_DEPARTING), "hv")
    # hash once per row, then two literal CASE ladders over the column —
    # 256 WHEN clauses re-evaluating md5 would be the naive alternative
    placed = (
        tbl(spark, sf_dir, "documents")
        .select(F.expr(f"({h})").alias("hv"))
        .select(F.expr(own_before).alias("owner"), F.expr(own_after).alias("owner_after"))
    )
    return placed.groupBy(F.col("owner").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("owner_after") != F.col("owner"), 1).otherwise(0))
        .cast("long")
        .alias("n_moved"),
    )


# ---------------------------------------------------------------------------
# churn_label_daily
# ---------------------------------------------------------------------------

_CHURN_ORACLE = """
WITH um AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
bounds AS (SELECT MAX(day) AS last_day FROM um),
labeled AS (
  SELECT u.user_id, u.day,
         CASE WHEN u.day = b.last_day THEN NULL
              WHEN LEAD(u.day) OVER (PARTITION BY u.user_id ORDER BY u.day)
                   = u.day + INTERVAL 1 DAY THEN 0
              ELSE 1 END AS churned
  FROM um u CROSS JOIN bounds b
)
SELECT CAST(day AS TIMESTAMP) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(COUNT(churned) AS BIGINT) AS n_labeled,
       CAST(COALESCE(SUM(churned), 0) AS BIGINT) AS n_churned,
       CASE WHEN COUNT(churned) = 0 THEN NULL
            ELSE CAST(SUM(churned) AS DOUBLE) / COUNT(churned) END AS churn_rate
FROM labeled
GROUP BY day
"""


@register(
    "churn_label_daily",
    oracle=_CHURN_ORACLE,
    description="Leakage-safe churn/retention label generation: churned "
    "on day D iff active on D and silent on D+1 (date arithmetic on the "
    "user's day sequence, not row adjacency); the last observed day "
    "emits NULL labels — unknowable, not negative; per-day cohort rates "
    "as exact integer pairs + one display division",
    tags=("analytics", "ml", "labeling", "extension"),
)
def churn_label_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    um = (
        events_tbl(spark, sf_dir)
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
    )
    bounds = um.agg(F.max("day").alias("last_day"))
    w = W.partitionBy("user_id").orderBy("day")
    labeled = (
        um.crossJoin(F.broadcast(bounds))
        .withColumn("next_day", F.lead("day").over(w))
        .select(
            "day",
            F.when(F.col("day") == F.col("last_day"), F.lit(None))
            .when(F.col("next_day") == F.col("day") + F.expr("INTERVAL 1 DAY"), 0)
            .otherwise(1)
            .alias("churned"),
        )
    )
    return labeled.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_active"),
        F.count("churned").cast("long").alias("n_labeled"),
        F.coalesce(F.sum("churned"), F.lit(0)).cast("long").alias("n_churned"),
        F.when(F.count("churned") == 0, F.lit(None))
        .otherwise(F.sum("churned").cast("double") / F.count("churned"))
        .alias("churn_rate"),
    ).select(
        F.col("day").cast("timestamp").alias("day"),
        "n_active",
        "n_labeled",
        "n_churned",
        "churn_rate",
    )
