"""Round 4 additions, part 39: grouped Arrow-native aggregation and
abuse-rate flagging.

- ``applyinarrow_group_digest`` — the GROUPED Arrow-native surface
  (``groupBy().applyInArrow``) beside the existing mapInArrow stage
  (arrow_batch_hash) and the four pandas surfaces: per-group custom
  aggregation executed on pyarrow Tables with zero pandas conversion.
  Keys are HASH BUCKETS (the cogroup_order_reconcile lesson: per-business-
  key grouped-Python calls die on per-call overhead; 32 buckets amortize
  it and scale with the cluster, with vectorized compute inside).  Each
  bucket emits exact integer accounting (rows, cents sum, modular key
  digest) that the SQL oracle replays, so the Arrow path itself is
  hash-verified.

- ``bot_rate_flagging`` — the abuse-detection gate a public ingestion
  endpoint runs: per-user request-rate statistics (events per minute)
  with two integer-exact flags — BURST (max per-minute count >= 2, the
  observed tail of this corpus) and HEAVY (lifetime events above 2x the
  per-user average, decided by the BIGINT cross-multiplication
  n * n_users > 2 * n_total — no float rate).  Emits only flagged users
  (output is the suspect list, linear in offenders, not users).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import events_tbl, tbl

_CK_MOD = 1000003

# ---------------------------------------------------------------------------
# applyinarrow_group_digest
# ---------------------------------------------------------------------------

_N_BUCKETS = 32


def _arrow_oracle() -> str:
    h = h60_duck("CAST(l_orderkey AS VARCHAR)")
    return f"""
WITH li AS (
  SELECT ({h}) % {_N_BUCKETS} AS bucket,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents,
         (l_orderkey * 31 + l_linenumber) % {_CK_MOD} AS term
  FROM lineitem
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents,
       CAST(SUM(term) % {_CK_MOD} AS BIGINT) AS key_digest
FROM li GROUP BY bucket
"""


@register(
    "applyinarrow_group_digest",
    oracle=_arrow_oracle(),
    description=f"groupBy().applyInArrow — the grouped Arrow-native "
    f"surface beside mapInArrow: {_N_BUCKETS} hash buckets (per-business-"
    "key grouped-Python calls die on per-call overhead; buckets amortize "
    "and scale), vectorized pyarrow.compute aggregation inside, exact "
    "integer accounting the SQL oracle replays",
    tags=("arrow", "udf", "agg", "extension"),
)
def applyinarrow_group_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = h60_spark("CAST(l_orderkey AS STRING)")
    li = tbl(spark, sf_dir, "lineitem").select(
        F.expr(f"({h}) % {_N_BUCKETS}").alias("bucket"),
        F.expr("CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)").alias(
            "cents"
        ),
        F.expr(f"(l_orderkey * 31 + l_linenumber) % {_CK_MOD}").alias("term"),
    )

    def digest(table: pa.Table) -> pa.Table:
        n = table.num_rows
        bucket = table["bucket"][0].as_py() if n else None
        cents = pc.sum(table["cents"]).as_py() or 0
        terms = pc.sum(table["term"]).as_py() or 0
        return pa.table(
            {
                "bucket": pa.array([bucket], pa.int64()),
                "n_rows": pa.array([n], pa.int64()),
                "revenue_cents": pa.array([cents], pa.int64()),
                "key_digest": pa.array([terms % _CK_MOD], pa.int64()),
            }
        )

    return li.groupBy("bucket").applyInArrow(
        digest, schema="bucket bigint, n_rows bigint, revenue_cents bigint, key_digest bigint"
    )


# ---------------------------------------------------------------------------
# bot_rate_flagging
# ---------------------------------------------------------------------------

_BOT_ORACLE = f"""
WITH pm AS (
  SELECT user_id, date_trunc('minute', ts) AS m, CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY user_id, date_trunc('minute', ts)
),
per AS (
  SELECT user_id,
         CAST(SUM(c) AS BIGINT) AS n_events,
         CAST(MAX(c) AS BIGINT) AS max_per_min,
         CAST(COUNT(*) AS BIGINT) AS active_minutes
  FROM pm GROUP BY user_id
),
tot AS (SELECT SUM(n_events) AS n_total, COUNT(*) AS n_users FROM per)
SELECT p.user_id, p.n_events, p.max_per_min, p.active_minutes,
       p.max_per_min >= 2 AS burst_flag,
       p.n_events * t.n_users > 2 * t.n_total AS heavy_flag
FROM per p CROSS JOIN tot t
WHERE p.max_per_min >= 2 OR p.n_events * t.n_users > 2 * t.n_total
"""


@register(
    "bot_rate_flagging",
    oracle=_BOT_ORACLE,
    description="Abuse-rate gate: per-user events-per-minute statistics "
    "with two integer-exact flags — BURST (max per-minute >= 2) and HEAVY "
    "(lifetime events above 2x the per-user average via the BIGINT "
    "cross-multiplication n*n_users > 2*n_total); emits only the suspect "
    "list (linear in offenders)",
    tags=("analytics", "security", "governance", "extension"),
)
def bot_rate_flagging(spark: SparkSession, sf_dir: str) -> DataFrame:
    pm = (
        events_tbl(spark, sf_dir)
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .groupBy("user_id", F.date_trunc("minute", "ts").alias("m"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    per = pm.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.max("c").cast("long").alias("max_per_min"),
        F.count(F.lit(1)).cast("long").alias("active_minutes"),
    )
    tot = per.agg(F.sum("n_events").alias("n_total"), F.count(F.lit(1)).alias("n_users"))
    burst = F.col("max_per_min") >= 2
    heavy = F.col("n_events") * F.col("n_users") > 2 * F.col("n_total")
    return (
        per.crossJoin(F.broadcast(tot))
        .filter(burst | heavy)
        .select(
            "user_id",
            "n_events",
            "max_per_min",
            "active_minutes",
            burst.alias("burst_flag"),
            heavy.alias("heavy_flag"),
        )
    )
