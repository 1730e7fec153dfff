"""Attribution + incremental-warehouse operators, round 3 (appended).

``attribution_linear``: multi-touch marketing attribution — every purchase
distributes 1000 per-mille credit equally (floor division) over the user's
clicks in the preceding 7 days, and credit rolls up by click hour-of-day.
The join is the per-user interval shape: one shuffle of each side on
user_id, a bounded range predicate, then touch counting via a window
partitioned by the conversion id (never global). The credit remainder
(1000 - n·⌊1000/n⌋) is emitted per hour so mass accounting is exact.

``scd2_incremental_merge``: the incremental dimension-maintenance pattern,
verified against the full rebuild IN-PLAN. Events split into history
and a new batch (the last 1/50th of the time range — a realistic
incremental tick); users
touched by the batch are recomputed from their full event set (cost ∝
affected users — the 100 TB story), untouched users carry their history
versions forward via an anti-join; the union must equal the from-scratch
SCD2 build row-for-row. Counts and the equality verdict ride in the
single-row report.

Reference parity note: the reference (SURVEY.md §0) has no relational
surface; these extend the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .pipeline13 import TIER_BAND, scd2_event_projection, scd2_versions_from
from .relational import events_tbl

# ---------------------------------------------------------------------------
# attribution_linear
# ---------------------------------------------------------------------------

_ATTR_WINDOW_US = 7 * 86400000000  # 7-day lookback, microseconds

_ATTR_ORACLE = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS e, hour(ts) AS hr
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
purch AS (SELECT user_id, event_id AS pid, e AS tp FROM ev WHERE event_type = 'purchase'),
clicks AS (SELECT user_id, event_id AS cid, e AS tc, hr FROM ev WHERE event_type = 'click'),
touched AS (
  SELECT p.pid, c.cid, c.hr
  FROM purch p JOIN clicks c
    ON c.user_id = p.user_id AND c.tc <= p.tp AND p.tp - c.tc <= {_ATTR_WINDOW_US}
),
credited AS (
  SELECT pid, cid, hr,
         COUNT(*) OVER (PARTITION BY pid) AS n_touch
  FROM touched
)
SELECT CAST(hr AS BIGINT) AS click_hour,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(COUNT(DISTINCT pid) AS BIGINT) AS n_conversions,
       CAST(SUM(1000 // n_touch) AS BIGINT) AS credit_pm,
       CAST(SUM(CASE WHEN 1000 % n_touch <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_rounded
FROM credited
GROUP BY hr
"""


@register(
    "attribution_linear",
    oracle=_ATTR_ORACLE,
    description="Linear multi-touch attribution: purchases split 1000 pm of "
    "credit over same-user clicks in a 7-day lookback; rollup by click hour",
    tags=("attribution", "analytics", "join", "extension"),
)
def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversion equal-credit attribution in exact integers.

    Scale: purchases and clicks shuffle ONCE each on user_id; the range
    predicate bounds fan-out to each user's 7-day click window; touch
    counts are a window partitioned by conversion id (conversions are
    unique keys — no skew); the final rollup is a map-side-combined
    groupBy over 24 hour keys. Hot users are capped by the same logic a
    production run would add (lookback window bounds the join fan-out)."""
    ev = (
        events_tbl(spark, sf_dir)
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("e"),
            F.hour("ts").alias("hr"),
        )
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"), F.col("e").alias("tp")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("cid"), F.col("e").alias("tc"), "hr"
    )
    touched = purch.join(clicks, "user_id").filter(
        (F.col("tc") <= F.col("tp")) & (F.col("tp") - F.col("tc") <= _ATTR_WINDOW_US)
    )
    credited = touched.select(
        "pid", "cid", "hr", F.count(F.lit(1)).over(W.partitionBy("pid")).alias("n_touch")
    )
    return credited.groupBy(F.col("hr").cast("long").alias("click_hour")).agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.count_distinct("pid").cast("long").alias("n_conversions"),
        F.sum(F.expr("1000 div n_touch")).cast("long").alias("credit_pm"),
        F.sum(F.when(F.expr("1000 % n_touch") != 0, 1).otherwise(0))
        .cast("long")
        .alias("n_rounded"),
    )


# ---------------------------------------------------------------------------
# scd2_incremental_merge
# ---------------------------------------------------------------------------


def _versions_cte(name: str, where: str) -> str:
    """A parametrized copy of pipeline13's SCD2 build over a filtered event
    slice (DuckDB CTE names must be unique per query)."""
    return f"""
{name}_ev AS (
  SELECT event_id, user_id, ts,
         CAST(floor(value / {TIER_BAND}) AS BIGINT) AS tier
  FROM evs WHERE {where}
),
{name}_flagged AS (
  SELECT *,
         CASE WHEN ROW_NUMBER() OVER w = 1
                OR tier IS DISTINCT FROM LAG(tier) OVER w
              THEN 1 ELSE 0 END AS chg
  FROM {name}_ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
{name}_versioned AS (
  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version
  FROM {name}_flagged
),
{name} AS (
  SELECT user_id, CAST(version AS BIGINT) AS version, MIN(tier) AS tier,
         MIN(ts) AS valid_from, COUNT(*) AS n_events
  FROM {name}_versioned GROUP BY user_id, version
)"""


_SCD2_INC_ORACLE = f"""
WITH evs AS (
  SELECT event_id, user_id, ts, value, epoch_us(ts) AS e,
         (SELECT MIN(epoch_us(ts)) FROM events WHERE user_id IS NOT NULL) AS lo,
         (SELECT MAX(epoch_us(ts)) FROM events WHERE user_id IS NOT NULL) AS hi
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
affected AS (SELECT DISTINCT user_id FROM evs WHERE (e - lo) * 50 >= 49 * (hi - lo)),
{_versions_cte("v_full", "TRUE")},
{_versions_cte("v_hist", "(e - lo) * 50 < 49 * (hi - lo)")},
{_versions_cte("v_recomp", "user_id IN (SELECT user_id FROM affected)")},
carried AS (
  SELECT * FROM v_hist WHERE user_id NOT IN (SELECT user_id FROM affected)
),
inc AS (SELECT * FROM v_recomp UNION ALL SELECT * FROM carried),
cmp AS (
  SELECT COUNT(*) AS n_match FROM inc
  JOIN v_full f ON f.user_id = inc.user_id AND f.version = inc.version
   AND f.tier IS NOT DISTINCT FROM inc.tier
   AND f.valid_from = inc.valid_from AND f.n_events = inc.n_events
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v_full) AS n_full,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM inc) AS n_inc,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM v_recomp) AS n_recomputed,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM carried) AS n_carried,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM affected) AS n_affected_users,
       (SELECT CAST(n_match AS BIGINT) FROM cmp) AS n_match,
       (SELECT COUNT(*) FROM v_full) = (SELECT COUNT(*) FROM inc)
         AND (SELECT COUNT(*) FROM inc) = (SELECT n_match FROM cmp)
         AS incremental_equals_full
"""


@register(
    "scd2_incremental_merge",
    oracle=_SCD2_INC_ORACLE,
    description="Incremental SCD2 maintenance (recompute affected users, "
    "carry the rest) verified row-for-row against the full rebuild in-plan",
    tags=("temporal", "scd2", "incremental", "warehouse", "extension"),
)
def scd2_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension maintenance the way a 100 TB warehouse actually runs it.

    The batch (last 1/50th of the time range) touches a subset of users;
    only THOSE users' version chains are recomputed (semi-join), everyone
    else's history rows carry forward untouched (anti-join) — work is
    proportional to the batch's user set, not the dimension. The union is
    then compared row-for-row against the from-scratch build; the verdict
    and the accounting (recomputed vs carried) are the query output, so
    the equivalence is verified by the oracle on every run, not asserted
    in a docstring."""
    base = scd2_event_projection(spark, sf_dir)
    ev = (
        events_tbl(spark, sf_dir)
        .where(F.col("user_id").isNotNull())
        .select("event_id", F.unix_micros("ts").alias("e"))
    )
    bounds = ev.agg(F.min("e").alias("lo"), F.max("e").alias("hi"))
    tagged = base.join(ev, "event_id").crossJoin(F.broadcast(bounds))
    cond = (F.col("e") - F.col("lo")) * 50 >= 49 * (F.col("hi") - F.col("lo"))
    batch = tagged.filter(cond)
    hist = tagged.filter(~cond)
    affected = batch.select("user_id").distinct()

    proj = ["event_id", "user_id", "ts", "tier"]
    v_full = scd2_versions_from(base)
    v_recomp = scd2_versions_from(base.join(affected, "user_id", "left_semi"))
    carried = scd2_versions_from(hist.select(*proj)).join(
        affected, "user_id", "left_anti"
    )
    inc = v_recomp.unionByName(carried)

    n_match = (
        inc.alias("i")
        .join(
            v_full.alias("f"),
            (F.col("f.user_id") == F.col("i.user_id"))
            & (F.col("f.version") == F.col("i.version"))
            & F.col("f.tier").eqNullSafe(F.col("i.tier"))
            & (F.col("f.valid_from") == F.col("i.valid_from"))
            & (F.col("f.n_events") == F.col("i.n_events")),
        )
        .agg(F.count(F.lit(1)).alias("n_match"))
    )
    counts = (
        v_full.agg(F.count(F.lit(1)).alias("n_full"))
        .crossJoin(inc.agg(F.count(F.lit(1)).alias("n_inc")))
        .crossJoin(v_recomp.agg(F.count(F.lit(1)).alias("n_recomputed")))
        .crossJoin(carried.agg(F.count(F.lit(1)).alias("n_carried")))
        .crossJoin(affected.agg(F.count(F.lit(1)).alias("n_affected_users")))
        .crossJoin(n_match)
    )
    return counts.select(
        F.col("n_full").cast("long").alias("n_full"),
        F.col("n_inc").cast("long").alias("n_inc"),
        F.col("n_recomputed").cast("long").alias("n_recomputed"),
        F.col("n_carried").cast("long").alias("n_carried"),
        F.col("n_affected_users").cast("long").alias("n_affected_users"),
        F.col("n_match").cast("long").alias("n_match"),
        ((F.col("n_full") == F.col("n_inc")) & (F.col("n_inc") == F.col("n_match"))).alias(
            "incremental_equals_full"
        ),
    )
