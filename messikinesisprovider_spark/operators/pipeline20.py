"""Training-pair generation, round 3 (appended).

``negative_sampling_hash``: contrastive/recsys training prep — for every
observed (customer, part) purchase pair, K candidate negatives are drawn
by the portable 60-bit hash mapped into the part-key domain, then
candidates that collide with a TRUE positive are dropped by an anti-join.
Sampling is a pure function of (customer, part, slot): reproducible across
re-runs, partitionings and incremental ingest — the property that makes a
100 TB training-pair corpus regenerable and auditable. Generation is
map-side (no shuffle); the only shuffles are the positive-pair distinct
and the collision anti-join on the composite key. Collisions are not
re-drawn (the slot is simply absent) — at the observed positive densities
the loss is ~|user's positives|/|domain| per slot and the emitted `slot`
column makes the accounting checkable; a production variant re-draws with
offset slots, same hash construction.

Reference parity note: the reference (SURVEY.md §0) has no relational
surface; these extend the engine per the round brief (training-data
pipeline ops are graded first-class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import tbl

N_NEG_SLOTS = 3

_NEG_HASH_SPARK = h60_spark("concat(CAST(c AS STRING), '|', CAST(p AS STRING), '|', CAST(slot AS STRING))")
_NEG_HASH_DUCK = h60_duck("concat(CAST(c AS VARCHAR), '|', CAST(p AS VARCHAR), '|', CAST(slot AS VARCHAR))")

_NEG_ORACLE = f"""
WITH pos AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
dom AS (SELECT MAX(p_partkey) AS n_parts FROM part),
cand AS (
  SELECT c, p, slot,
         1 + ({_NEG_HASH_DUCK}) % n_parts AS neg_p
  FROM pos CROSS JOIN dom
  CROSS JOIN (SELECT UNNEST(range(1, {N_NEG_SLOTS + 1})) AS slot)
)
SELECT c AS custkey, p AS pos_part, CAST(slot AS BIGINT) AS slot,
       CAST(neg_p AS BIGINT) AS neg_part
FROM cand
WHERE NOT EXISTS (SELECT 1 FROM pos p2 WHERE p2.c = cand.c AND p2.p = cand.neg_p)
"""


@register(
    "negative_sampling_hash",
    oracle=_NEG_ORACLE,
    description=f"Deterministic negative sampling for training pairs: {N_NEG_SLOTS} "
    "hash-drawn candidates per positive, true-positive collisions anti-joined out",
    tags=("sampling", "training", "recsys", "extension"),
)
def negative_sampling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(customer, pos_part, slot) → neg_part, purely from the row's hash.

    neg = 1 + h60(c|p|slot) mod max_partkey (the part domain is dense
    1..N); the anti-join drops the rare candidate that is itself a
    positive. Both engines compute the identical hash and modulus, so the
    sample set — not just its statistics — is oracle-exact."""
    orders = tbl(spark, sf_dir, "orders").select(
        F.col("o_orderkey"), F.col("o_custkey").alias("c")
    )
    li = tbl(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), F.col("l_partkey").alias("p")
    )
    # Persist the positive set: both the candidate explode AND the
    # collision anti-join probe it, and without materialization each side
    # re-runs the orders-lineitem join + distinct (two scans of each table
    # in the unpersisted plan, no reusable exchange across the two shapes).
    pos = orders.join(li, "o_orderkey").select("c", "p").distinct().persist()
    dom = tbl(spark, sf_dir, "part").agg(F.max("p_partkey").alias("n_parts"))
    cand = (
        pos.crossJoin(F.broadcast(dom))
        .select("c", "p", "n_parts", F.explode(F.expr(f"sequence(1, {N_NEG_SLOTS})")).alias("slot"))
        .select(
            "c",
            "p",
            "slot",
            (1 + F.expr(_NEG_HASH_SPARK) % F.col("n_parts")).alias("neg_p"),
        )
    )
    kept = cand.join(
        pos.select(F.col("c"), F.col("p").alias("neg_p")),
        ["c", "neg_p"],
        "left_anti",
    )
    return kept.select(
        F.col("c").alias("custkey"),
        F.col("p").alias("pos_part"),
        F.col("slot").cast("long").alias("slot"),
        F.col("neg_p").cast("long").alias("neg_part"),
    )
