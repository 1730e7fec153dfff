"""Distributed-sketch set algebra (round 3c).

``sketch_kmv_setops`` estimates |A ∪ B| and |A ∩ B| of two user
populations from their KMV sketches alone (Beyer et al., "On Synopses for
Distinct-Value Estimation Under Multiset Operations", SIGMOD'07) — the
operation that makes bounded sketch state useful at warehouse scale: audience
overlap across sources/partitions/days without ever co-shuffling the raw
sets. The sketch state is k minimum values of the portable 60-bit hash
(`dedup.h60_spark`/`h60_duck`), so state, merge, and both estimators are
bit-reproducible in DuckDB and the whole pipeline — not just the final
number — is oracle-checked, with the exact counts alongside to make
estimator error measurable.

Estimator, identically in both engines:
- union sketch = k smallest of (S_A ∪ S_B), threshold tau = its max,
  K' = its size; est_union = |pool| exactly when the pool fits in k, else
  (k-1) * 2^60 / tau.
- est_intersection = c * est_union / K', where c = members of the union
  sketch present in BOTH per-set sketches (when the pool fits in k this
  degenerates to the exact intersection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import h60_duck, h60_spark
from .pipeline3 import _H60_SPACE, _KMV_K
from .relational import events_tbl

_A, _B = "click", "purchase"

_KMV_SETOPS_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT event_type, {h60_duck('CAST(user_id AS VARCHAR)')} AS hv
  FROM events
  WHERE user_id IS NOT NULL AND event_type IN ('{_A}', '{_B}')
),
ska AS (SELECT hv FROM h WHERE event_type = '{_A}' ORDER BY hv LIMIT {_KMV_K}),
skb AS (SELECT hv FROM h WHERE event_type = '{_B}' ORDER BY hv LIMIT {_KMV_K}),
pool AS (SELECT DISTINCT hv FROM (SELECT hv FROM ska UNION ALL SELECT hv FROM skb)),
usk AS (SELECT hv FROM pool ORDER BY hv LIMIT {_KMV_K}),
ustats AS (
  SELECT MAX(hv) AS tau, COUNT(*) AS kprime,
         (SELECT COUNT(*) FROM pool) AS npool
  FROM usk
),
c AS (
  SELECT COUNT(*) AS c FROM usk
  WHERE EXISTS (SELECT 1 FROM ska WHERE ska.hv = usk.hv)
    AND EXISTS (SELECT 1 FROM skb WHERE skb.hv = usk.hv)
),
exact AS (
  SELECT
    COUNT(DISTINCT CASE WHEN event_type = '{_A}' THEN hv END) AS n_exact_a,
    COUNT(DISTINCT CASE WHEN event_type = '{_B}' THEN hv END) AS n_exact_b,
    COUNT(DISTINCT hv) AS n_exact_union
  FROM h
),
exact_i AS (
  SELECT COUNT(*) AS n_exact_intersection
  FROM (SELECT hv FROM h GROUP BY hv HAVING COUNT(DISTINCT event_type) = 2)
)
SELECT CAST({_KMV_K} AS BIGINT) AS k,
       CAST(u.kprime AS BIGINT) AS kprime,
       CAST(u.tau AS BIGINT) AS tau,
       CAST(e.n_exact_a AS BIGINT) AS n_exact_a,
       CAST(e.n_exact_b AS BIGINT) AS n_exact_b,
       CAST(e.n_exact_union AS BIGINT) AS n_exact_union,
       CAST(i.n_exact_intersection AS BIGINT) AS n_exact_intersection,
       CAST(CASE WHEN u.npool <= {_KMV_K} THEN u.npool * 1.0
            ELSE ({_KMV_K} - 1) * {_H60_SPACE} / u.tau END AS DOUBLE) AS est_union,
       CAST(CASE WHEN u.kprime = 0 THEN 0.0  -- empty union sketch
            ELSE CAST(c.c AS DOUBLE)
            * (CASE WHEN u.npool <= {_KMV_K} THEN u.npool * 1.0
               ELSE ({_KMV_K} - 1) * {_H60_SPACE} / u.tau END)
            / u.kprime END AS DOUBLE) AS est_intersection
FROM ustats u CROSS JOIN c CROSS JOIN exact e CROSS JOIN exact_i i
"""


@register(
    "sketch_kmv_setops",
    oracle=_KMV_SETOPS_ORACLE,
    description=f"KMV sketch set algebra (k={_KMV_K}): union/intersection "
    f"estimates of the '{_A}' vs '{_B}' user populations from sketch state "
    "alone, exact counts alongside — bit-reproducible cross-engine",
    tags=("sketch", "approx", "setops", "extension"),
)
def sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: each per-set sketch is a TakeOrderedAndProject over the
    distinct-hash set (group shuffle + top-k, no global sort); everything
    after operates on <= 2k rows via broadcasts. The exact counters are one
    extra aggregate over the same distinct-hash scan. At warehouse scale
    the sketches would be precomputed per partition/day and merged by
    keep-k-smallest-of-union — the merge this operator implements.
    """
    ev = events_tbl(spark, sf_dir)
    h = (
        ev.filter(F.col("user_id").isNotNull() & F.col("event_type").isin(_A, _B))
        .select("event_type", F.expr(h60_spark("CAST(user_id AS STRING)")).alias("hv"))
        .dropDuplicates(["event_type", "hv"])
        .persist()
    )
    ska = h.filter(F.col("event_type") == _A).select("hv").orderBy("hv").limit(_KMV_K)
    skb = h.filter(F.col("event_type") == _B).select("hv").orderBy("hv").limit(_KMV_K)
    pool = ska.unionAll(skb).distinct()
    usk = pool.orderBy("hv").limit(_KMV_K)
    ustats = usk.agg(
        F.max("hv").alias("tau"), F.count(F.lit(1)).alias("kprime")
    ).crossJoin(pool.agg(F.count(F.lit(1)).alias("npool")))
    c = (
        usk.join(ska.withColumnRenamed("hv", "ha"), F.col("hv") == F.col("ha"), "left_semi")
        .join(skb.withColumnRenamed("hv", "hb"), F.col("hv") == F.col("hb"), "left_semi")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = h.agg(
        F.countDistinct(F.when(F.col("event_type") == _A, F.col("hv"))).alias("n_exact_a"),
        F.countDistinct(F.when(F.col("event_type") == _B, F.col("hv"))).alias("n_exact_b"),
        F.countDistinct("hv").alias("n_exact_union"),
    )
    exact_i = (
        h.groupBy("hv")
        .agg(F.countDistinct("event_type").alias("nt"))
        .filter(F.col("nt") == 2)
        .agg(F.count(F.lit(1)).alias("n_exact_intersection"))
    )
    est_union = F.when(
        F.col("npool") <= _KMV_K, F.col("npool") * F.lit(1.0)
    ).otherwise(F.lit(float(_KMV_K - 1)) * F.lit(_H60_SPACE) / F.col("tau"))
    return (
        ustats.crossJoin(c).crossJoin(exact).crossJoin(exact_i)
        .select(
            F.lit(_KMV_K).cast("bigint").alias("k"),
            F.col("kprime").cast("bigint").alias("kprime"),
            F.col("tau").cast("bigint").alias("tau"),
            F.col("n_exact_a").cast("bigint").alias("n_exact_a"),
            F.col("n_exact_b").cast("bigint").alias("n_exact_b"),
            F.col("n_exact_union").cast("bigint").alias("n_exact_union"),
            F.col("n_exact_intersection").cast("bigint").alias("n_exact_intersection"),
            est_union.cast("double").alias("est_union"),
            F.when(F.col("kprime") == 0, F.lit(0.0))  # empty union sketch
            .otherwise(F.col("c").cast("double") * est_union / F.col("kprime"))
            .cast("double")
            .alias("est_intersection"),
        )
    )
