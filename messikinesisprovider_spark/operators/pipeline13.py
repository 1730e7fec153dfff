"""Temporal warehouse + weighted sampling operators, round 3 (appended).

``scd2_history``: slowly-changing-dimension type-2 history build — the
warehouse operation that turns an event stream into validity intervals.
Per user, the banded profile attribute (tier = floor(value/50)) is tracked
through time; consecutive events with the same tier collapse into one
version (change detection via null-safe lag compare), and each version gets
[valid_from, valid_to) with valid_to = next version's start, NULL while
current. One shuffle on user_id; everything else is per-user windows.

``pit_join_scd2``: the point-in-time (temporal) join against that SCD2
dimension — every click resolves the profile version valid AT its
timestamp. Implemented as union-and-carry (one shuffle, no interval join):
version starts and clicks interleave in one per-user ordered window and a
last-non-null carry assigns each click the most recent version at or before
its ts (version rows sort before clicks at the same instant — a version
starting at t applies to a click at t). This is the asof-join shape
specialized to interval dimensions; at scale it replaces the
BroadcastNestedLoopJoin a naive BETWEEN valid_from AND valid_to predicate
would plan.

``sample_weighted_bernoulli``: weighted Bernoulli sampling — keep
probability proportional to a row weight (here n_chars/1000, capped at 1),
decided by comparing the portable 60-bit hash against an integer threshold.
Membership is a pure function of the row, so the sample is reproducible
across re-runs, partitionings and incremental ingest (same property as
`sample_stratified_hash`, extended to weights — the shape behind
importance-weighted corpus sampling a la DSIR). Integer arithmetic
throughout: weight is clamped to [0, 1000] so weight * (2^60/1000) never
overflows and the cap lands exactly on 2^60.

Reference parity note: the reference (SURVEY.md §0) has no relational
surface; these extend the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import events_tbl, tbl

TIER_BAND = 50  # profile attribute: value band of width 50

_SCD2_CTES = f"""
    ev AS (
      SELECT event_id, user_id, ts,
             CAST(floor(value / {TIER_BAND}) AS BIGINT) AS tier
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    flagged AS (
      SELECT *,
             CASE WHEN ROW_NUMBER() OVER w = 1
                    OR tier IS DISTINCT FROM LAG(tier) OVER w
                  THEN 1 ELSE 0 END AS chg
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    versioned AS (
      SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version
      FROM flagged
    ),
    versions AS (
      SELECT user_id, CAST(version AS BIGINT) AS version, MIN(tier) AS tier,
             MIN(ts) AS valid_from, COUNT(*) AS n_events
      FROM versioned GROUP BY user_id, version
    )
"""


def scd2_versions_from(ev: DataFrame) -> DataFrame:
    """(user_id, version, tier, valid_from, n_events) from a projected event
    set (event_id, user_id, ts, tier) — the SCD2 core, reusable over any
    event subset (pipeline17's incremental merge builds it per-slice)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "*",
        F.when(
            (F.row_number().over(w) == 1)
            | ~F.col("tier").eqNullSafe(F.lag("tier").over(w)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("chg"),
    )
    versioned = flagged.select(
        "*", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("version")
    )
    return versioned.groupBy("user_id", F.col("version").cast("bigint").alias("version")).agg(
        F.min("tier").alias("tier"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )


def scd2_event_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (event_id, user_id, ts, tier) projection every SCD2 build uses.

    A temporal history is undefined for an event with no timestamp: a NULL
    ts would sort NULLS FIRST in Spark but NULLS LAST in DuckDB and shift
    every downstream version number, so untimestamped events are excluded
    by contract (matching the streaming maintainers)."""
    return (
        events_tbl(spark, sf_dir)
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts",
            F.floor(F.col("value") / TIER_BAND).cast("bigint").alias("tier"),
        )
    )


def _scd2_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, version, tier, valid_from, n_events) — shared by both
    temporal queries."""
    return scd2_versions_from(scd2_event_projection(spark, sf_dir))


@register(
    "scd2_history",
    oracle=f"""
    WITH {_SCD2_CTES}
    SELECT user_id, version, tier, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
           n_events,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version) IS NULL AS is_current
    FROM versions
    """,
    description=f"SCD type-2 history build: per-user value bands (width {TIER_BAND}) "
    "collapsed into change versions with [valid_from, valid_to) intervals and "
    "an is_current flag; change detection via null-safe lag compare",
    tags=("temporal", "scd2", "warehouse", "extension"),
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build (see module doc). One shuffle on user_id; the
    change-flag, version numbering, interval close and currency flag are all
    per-user window passes over that single partitioning."""
    versions = _scd2_versions(spark, sf_dir)
    wv = Window.partitionBy("user_id").orderBy("version")
    return versions.select(
        "user_id",
        "version",
        "tier",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "n_events",
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
    )


@register(
    "pit_join_scd2",
    oracle=f"""
    WITH {_SCD2_CTES},
    clicks AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'click' AND user_id IS NOT NULL AND ts IS NOT NULL
    ),
    un AS (
      SELECT user_id, valid_from AS ts, 1 AS kind, version, tier,
             CAST(-1 AS BIGINT) AS event_id
      FROM versions
      UNION ALL
      SELECT user_id, ts, 0, CAST(-1 AS BIGINT), CAST(NULL AS BIGINT), event_id
      FROM clicks
    ),
    carry AS (
      SELECT user_id, ts, kind, event_id,
             LAST_VALUE(CASE WHEN kind = 1 THEN {{'v': version, 't': tier}} END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, kind DESC, version, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS st
      FROM un
    )
    SELECT event_id AS click_event_id, user_id, ts AS click_ts,
           st.v AS version_at_click, st.t AS tier_at_click
    FROM carry WHERE kind = 0
    """,
    description="Point-in-time join: every click resolves the SCD2 profile "
    "version valid at its timestamp via union-and-carry (one shuffle on "
    "user_id, no interval predicate join)",
    tags=("temporal", "asof", "scd2", "extension"),
)
def pit_join_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal join against the SCD2 dimension (see module doc). The sort
    key (ts, kind DESC, version, event_id) is null-free and unique: version
    rows carry event_id = -1, click rows carry version = -1, so cross-engine
    tie order is fully pinned. Version starts sort before clicks at the
    same timestamp (inclusive validity)."""
    versions = _scd2_versions(spark, sf_dir)
    clicks = (
        events_tbl(spark, sf_dir)
        .where(
            (F.col("event_type") == "click")
            & F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
        )
        .select("event_id", "user_id", "ts")
    )
    vrows = versions.select(
        "user_id",
        F.col("valid_from").alias("ts"),
        F.lit(1).alias("kind"),
        "version",
        "tier",
        F.lit(-1).cast("bigint").alias("event_id"),
    )
    crows = clicks.select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.lit(-1).cast("bigint").alias("version"),
        F.lit(None).cast("bigint").alias("tier"),
        "event_id",
    )
    un = vrows.unionByName(crows)
    wc = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("kind").desc(), F.col("version"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    st = F.last(
        F.when(F.col("kind") == 1, F.struct(F.col("version").alias("v"), F.col("tier").alias("t"))),
        ignorenulls=True,
    ).over(wc)
    return (
        un.select("user_id", "ts", "kind", "event_id", st.alias("st"))
        .where(F.col("kind") == 0)
        .select(
            F.col("event_id").alias("click_event_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
            F.col("st.v").alias("version_at_click"),
            F.col("st.t").alias("tier_at_click"),
        )
    )


# Weighted Bernoulli sampling: keep probability = clamp(n_chars, 0, 1000)/1000.
# WB_C = 2^60 / 1000 exactly divides the hash domain, so weight 1000 keeps
# with probability exactly 1 and the comparison never overflows int64
# (1000 * WB_C = 2^60 < 2^63).
WB_MAX_W = 1000
WB_C = (1 << 60) // WB_MAX_W


@register(
    "sample_weighted_bernoulli",
    oracle=f"""
    SELECT doc_id, source, n_chars
    FROM documents
    WHERE {h60_duck("'wbs:' || CAST(doc_id AS VARCHAR)")}
          < LEAST(GREATEST(n_chars, 0), {WB_MAX_W}) * {WB_C}
    """,
    description="Weighted Bernoulli sampling: keep probability proportional "
    "to n_chars (clamped), decided by portable-hash threshold — reproducible "
    "across re-runs, partitionings and incremental ingest",
    tags=("sampling", "weighted", "extension"),
)
def sample_weighted_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Bernoulli sample (see module doc). The predicate is a pure
    per-row expression — it pushes down to the scan, costs no shuffle, and
    composes with incremental ingest (new rows decide independently,
    identically to a re-run over the union)."""
    d = tbl(spark, sf_dir, "documents")
    thresh = F.expr(f"least(greatest(n_chars, 0), {WB_MAX_W}) * {WB_C}")
    h = F.expr(h60_spark("concat('wbs:', CAST(doc_id AS STRING))"))
    return d.where(h < thresh).select("doc_id", "source", "n_chars")
