"""Round 4 additions, part 33: position-based attribution and golden-record
survivorship.

- ``attribution_position_based`` — the U-shaped (40/20/40) multi-touch
  model beside ``attribution_linear``'s uniform split: per purchase, the
  FIRST and LAST click in the 7-day lookback get 400 per-mille each, the
  middles share 200 by floor division with the remainder going to the
  earliest middles (largest-remainder, position-ascending tiebreak);
  n = 1 takes 1000, n = 2 splits 500/500.  All integer permille — per
  purchase the credits provably sum to 1000 (pinned in tests) — rolled
  up by click hour-of-day like the linear twin, so the two models are
  directly comparable row-for-row.  Same interval join shape: one
  shuffle per side on user_id, bounded range predicate, windows
  partitioned by the conversion id.

- ``survivorship_golden_record`` — the MDM merge step after duplicate
  detection: within each bag-of-words duplicate cluster (the
  blocking_quality_metrics equivalence key), elect the golden record by
  survivorship rules — longest text wins, doc_id-ascending tiebreak —
  and consolidate fields: modal lang (count desc, lang asc tiebreak),
  max chars, member checksum.  Clusters of one pass through untouched;
  output is one row per multi-member cluster.  Window per cluster key +
  conditional aggregates; no pair joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .relational import events_tbl, tbl

_CK_MOD = 1000003

# ---------------------------------------------------------------------------
# attribution_position_based
# ---------------------------------------------------------------------------

_ATTR_WINDOW_US = 7 * 86400000000  # 7-day lookback, microseconds

_UATTR_ORACLE = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS e, hour(ts) AS hr
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
purch AS (SELECT user_id, event_id AS pid, e AS tp FROM ev WHERE event_type = 'purchase'),
clicks AS (SELECT user_id, event_id AS cid, e AS tc, hr FROM ev WHERE event_type = 'click'),
touched AS (
  SELECT p.pid, c.cid, c.hr,
         ROW_NUMBER() OVER (PARTITION BY p.pid ORDER BY c.tc, c.cid) AS pos,
         COUNT(*) OVER (PARTITION BY p.pid) AS n
  FROM purch p JOIN clicks c
    ON c.user_id = p.user_id AND c.tc <= p.tp AND p.tp - c.tc <= {_ATTR_WINDOW_US}
),
credited AS (
  SELECT pid, cid, hr,
         CASE
           WHEN n = 1 THEN 1000
           WHEN n = 2 THEN 500
           WHEN pos = 1 OR pos = n THEN 400
           ELSE 200 // (n - 2)
                + CASE WHEN pos - 1 <= 200 % (n - 2) THEN 1 ELSE 0 END
         END AS permille
  FROM touched
)
SELECT hr AS click_hour,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(permille) AS BIGINT) AS credit_permille,
       CAST(SUM((pid * 31 + cid) % {_CK_MOD}) AS BIGINT) AS touch_checksum
FROM credited
GROUP BY hr
"""


@register(
    "attribution_position_based",
    oracle=_UATTR_ORACLE,
    description="U-shaped (40/20/40) multi-touch attribution: first/last "
    "click 400 permille each, middles share 200 by floor division with "
    "largest-remainder to the earliest (n=1 takes 1000, n=2 splits "
    "500/500) — per-purchase credits sum to exactly 1000; same interval "
    "join + per-conversion windows as attribution_linear, rolled up by "
    "click hour for row-for-row model comparison",
    tags=("analytics", "attribution", "window", "join", "extension"),
)
def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("e"),
            F.hour("ts").alias("hr"),
        )
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("pid"), F.col("e").alias("tp")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("cid"), F.col("e").alias("tc"), "hr"
    )
    touched = purch.join(
        clicks,
        (clicks.user_id == purch.pu)
        & (F.col("tc") <= F.col("tp"))
        & (F.col("tp") - F.col("tc") <= _ATTR_WINDOW_US),
    ).select("pid", "cid", "hr", "tc")
    wp = W.partitionBy("pid")
    pos_n = touched.select(
        "pid",
        "cid",
        "hr",
        F.row_number().over(wp.orderBy("tc", "cid")).alias("pos"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    credited = pos_n.select(
        "pid",
        "cid",
        "hr",
        F.when(F.col("n") == 1, 1000)
        .when(F.col("n") == 2, 500)
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("n")), 400)
        .otherwise(
            F.expr("200 DIV (n - 2)")
            + F.when(F.col("pos") - 1 <= F.expr("200 % (n - 2)"), 1).otherwise(0)
        )
        .alias("permille"),
    )
    return credited.groupBy(F.col("hr").cast("long").alias("click_hour")).agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.sum("permille").cast("long").alias("credit_permille"),
        F.sum((F.col("pid") * 31 + F.col("cid")) % _CK_MOD)
        .cast("long")
        .alias("touch_checksum"),
    )


# ---------------------------------------------------------------------------
# survivorship_golden_record
# ---------------------------------------------------------------------------

_GOLDEN_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lang, n_chars,
         -- DuckDB's list_sort(list_distinct([])) is NULL (Spark's
         -- array_sort(array_distinct([])) is []); coalesce so zero-token
         -- docs form ONE cluster and survive the fp equi-joins below
         COALESCE(md5(array_to_string(list_sort(list_distinct(
             regexp_extract_all(lower(text), '[a-z]+'))), '|')), md5('')) AS fp
  FROM documents WHERE text IS NOT NULL
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY fp ORDER BY n_chars DESC, doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY fp) AS n_members
  FROM d
),
langmode AS (
  SELECT fp, lang AS mode_lang,
         ROW_NUMBER() OVER (PARTITION BY fp ORDER BY COUNT(*) DESC, lang) AS lrk
  FROM d WHERE lang IS NOT NULL
  GROUP BY fp, lang
),
members AS (
  SELECT fp,
         CAST(MAX(n_chars) AS BIGINT) AS max_chars,
         CAST(SUM(doc_id % {_CK_MOD}) AS BIGINT) AS member_checksum
  FROM d GROUP BY fp
)
SELECT r.doc_id AS survivor_doc_id,
       CAST(r.n_members AS BIGINT) AS n_members,
       l.mode_lang,
       m.max_chars,
       m.member_checksum
FROM ranked r
JOIN members m ON m.fp = r.fp
LEFT JOIN (SELECT fp, mode_lang FROM langmode WHERE lrk = 1) l ON l.fp = r.fp
WHERE r.rk = 1 AND r.n_members > 1
"""


@register(
    "survivorship_golden_record",
    oracle=_GOLDEN_ORACLE,
    description="MDM golden-record election within bag-of-words duplicate "
    "clusters: longest-text survivor (doc_id tiebreak), modal lang "
    "(count desc, lang asc), max chars, member checksum — one row per "
    "multi-member cluster; per-cluster windows + conditional aggregates, "
    "zero pair joins",
    tags=("dedup", "entity-resolution", "window", "extension"),
)
def survivorship_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        tbl(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.expr(
                "md5(array_join(array_sort(array_distinct("
                "regexp_extract_all(lower(text), '[a-z]+', 0))), '|'))"
            ).alias("fp"),
        )
    )
    wfp = W.partitionBy("fp")
    ranked = d.select(
        "doc_id",
        "fp",
        F.row_number().over(wfp.orderBy(F.col("n_chars").desc(), "doc_id")).alias("rk"),
        F.count(F.lit(1)).over(wfp).alias("n_members"),
    )
    langmode = (
        d.filter(F.col("lang").isNotNull())
        .groupBy("fp", "lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "fp",
            F.col("lang").alias("mode_lang"),
            F.row_number()
            .over(W.partitionBy("fp").orderBy(F.col("c").desc(), "lang"))
            .alias("lrk"),
        )
        .filter(F.col("lrk") == 1)
        .drop("lrk")
    )
    members = d.groupBy("fp").agg(
        F.max("n_chars").cast("long").alias("max_chars"),
        F.sum(F.col("doc_id") % _CK_MOD).cast("long").alias("member_checksum"),
    )
    return (
        ranked.filter((F.col("rk") == 1) & (F.col("n_members") > 1))
        .join(members, "fp")
        .join(langmode, "fp", "left")
        .select(
            F.col("doc_id").alias("survivor_doc_id"),
            F.col("n_members").cast("long").alias("n_members"),
            "mode_lang",
            "max_chars",
            "member_checksum",
        )
    )
