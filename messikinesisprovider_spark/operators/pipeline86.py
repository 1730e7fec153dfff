"""Round 6 additions, part 7: attribution decay + ER blocking + array surface.

- ``attribution_time_decay``: completes the attribution family (linear,
  position-based) with the TIME-DECAY model — each purchase splits 1000 pm
  of credit over its 7-day-lookback clicks proportionally to a half-life
  weight. Weights are exact powers of two from integer shifts (the
  decayed_popularity convention — no libm pow), and credit shares are
  integer floor divisions with a remainder count, so everything is
  bit-exact under any shuffle order.
- ``blocking_sorted_neighborhood``: the OTHER classic entity-resolution
  candidate generator — sort by a blocking key, pair every record with its
  w nearest neighbors in sort order. Hash blocking (blocking_quality_
  metrics) misses near-keys that hash apart; sorted neighborhood catches
  them at O(N·w) pairs. The global sort rank comes from the two-pass
  range-partitioned ranking (never a single-partition window), and the
  neighbor join is an equi-join on rank+k.
- ``array_functions_2``: second array-surface breadth batch — descending
  sort + slice (top-k inside an array), NULL compaction, flatten,
  element position, distinct count — each proven against DuckDB list
  functions, scalarized for exact hashing.

Reference parity note: the reference engine (SURVEY.md §0) has no
analytics surface; these extend the batch side per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .ranking import global_row_number
from .relational import events_tbl, spread, tbl
from .retrieval3 import _TOKS_DUCK, _TOKS_SPARK

# ---------------------------------------------------------------------------
# attribution_time_decay
# ---------------------------------------------------------------------------

_ATD_WINDOW_US = 7 * 86_400_000_000  # 7-day lookback, microseconds
_DAY_US = 86_400_000_000

_ATD_ORACLE = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS e, hour(ts) AS hr
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
purch AS (SELECT user_id, event_id AS pid, e AS tp FROM ev WHERE event_type = 'purchase'),
clicks AS (SELECT user_id, event_id AS cid, e AS tc, hr FROM ev WHERE event_type = 'click'),
touched AS (
  SELECT p.pid, c.cid, c.hr,
         CAST(1 AS BIGINT) << (7 - LEAST((p.tp - c.tc) // {_DAY_US}, 7)) AS w
  FROM purch p JOIN clicks c
    ON c.user_id = p.user_id AND c.tc <= p.tp AND p.tp - c.tc <= {_ATD_WINDOW_US}
),
credited AS (
  SELECT pid, cid, hr, w,
         SUM(w) OVER (PARTITION BY pid) AS sw
  FROM touched
)
SELECT CAST(hr AS BIGINT) AS click_hour,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(COUNT(DISTINCT pid) AS BIGINT) AS n_conversions,
       CAST(SUM((1000 * w) // sw) AS BIGINT) AS credit_pm,
       CAST(SUM(CASE WHEN (1000 * w) % sw <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_rounded
FROM credited
GROUP BY hr
"""


@register(
    "attribution_time_decay",
    oracle=_ATD_ORACLE,
    description="Time-decay multi-touch attribution: purchases split 1000 pm "
    "over 7-day-lookback clicks weighted by 2^(7-age_days) (exact integer "
    "shifts, one-day half-life) — completes the linear/position family with "
    "the recency-weighted model",
    tags=("attribution", "analytics", "join", "extension"),
)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same join shape as attribution_linear (per-user range join bounded
    by the 7-day lookback, AQE-skew-safe on user_id), with recency weights
    that are exact powers of two and credit shares as integer floor
    divisions — no float enters the pipeline, so engine agreement is exact
    including the remainder accounting."""
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
    touched = purch.join(
        clicks,
        (purch["user_id"] == clicks["user_id"])
        & (clicks["tc"] <= purch["tp"])
        & (purch["tp"] - clicks["tc"] <= _ATD_WINDOW_US),
    ).select(
        "pid",
        "cid",
        "hr",
        F.expr(
            f"shiftleft(1L, CAST(7 - LEAST((tp - tc) DIV {_DAY_US}, 7) AS INT))"
        ).alias("w"),
    )
    credited = touched.withColumn("sw", F.sum("w").over(W.partitionBy("pid")))
    return credited.groupBy(F.col("hr").cast("long").alias("click_hour")).agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.countDistinct("pid").alias("n_conversions"),
        F.sum(F.expr("(1000 * w) DIV sw")).cast("long").alias("credit_pm"),
        F.sum(F.when(F.expr("(1000 * w) % sw") != 0, 1).otherwise(0))
        .cast("long")
        .alias("n_rounded"),
    )


# ---------------------------------------------------------------------------
# blocking_sorted_neighborhood
# ---------------------------------------------------------------------------

_SNM_WINDOW = 3  # pair each record with its 3 successors in key order

_SNM_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id,
         substr(lower(trim(text)), 1, 12) AS bkey,
         md5(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS fp
  FROM documents WHERE text IS NOT NULL
),
ranked AS (
  SELECT doc_id, bkey, fp,
         ROW_NUMBER() OVER (ORDER BY bkey, doc_id) AS rn
  FROM keyed
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(b.rn - a.rn AS BIGINT) AS neighbor_dist,
       a.bkey = b.bkey AS same_block_key,
       a.fp = b.fp AS same_fingerprint
FROM ranked a JOIN ranked b
  ON b.rn BETWEEN a.rn + 1 AND a.rn + {_SNM_WINDOW}
"""


@register(
    "blocking_sorted_neighborhood",
    oracle=_SNM_ORACLE,
    description=f"Sorted-neighborhood ER blocking: records sorted by a "
    f"12-char text key, each paired with its {_SNM_WINDOW} successors — "
    "O(N*w) candidates catching near-keys hash blocking misses; the global "
    "rank is the two-pass range-partitioned ranking",
    tags=("dedup", "blocking", "er", "extension"),
)
def blocking_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sort rank comes from `global_row_number` (range partition +
    per-partition window + broadcast offsets — no single-partition
    exchange), and the neighbor pairing is an EQUI-join on rn + k exploded
    over k = 1..w, so candidate volume is exactly N*w at any scale. The
    fingerprint-equality flag makes the output a labeled candidate set for
    a downstream match stage."""
    keyed = spread(tbl(spark, sf_dir, "documents")).where(F.col("text").isNotNull()).select(
        "doc_id",
        F.expr("substr(lower(trim(text)), 1, 12)").alias("bkey"),
        F.expr("md5(lower(trim(regexp_replace(text, ' +', ' '))))").alias("fp"),
    )
    ranked, _n = global_row_number(keyed, order_by=["bkey", "doc_id"], rn_col="rn")
    probes = ranked.select(
        F.col("doc_id").alias("doc_a"),
        F.col("bkey").alias("bkey_a"),
        F.col("fp").alias("fp_a"),
        F.col("rn").alias("rn_a"),
        F.explode(
            F.array(*[F.col("rn") + k for k in range(1, _SNM_WINDOW + 1)])
        ).alias("rn"),
    )
    return probes.join(ranked, "rn").select(
        "doc_a",
        F.col("doc_id").alias("doc_b"),
        (F.col("rn") - F.col("rn_a")).cast("long").alias("neighbor_dist"),
        (F.col("bkey_a") == F.col("bkey")).alias("same_block_key"),
        (F.col("fp_a") == F.col("fp")).alias("same_fingerprint"),
    )


# ---------------------------------------------------------------------------
# array_functions_2
# ---------------------------------------------------------------------------

_ARR2_ORACLE = f"""
WITH base AS (
  SELECT doc_id, {_TOKS_DUCK} AS ts FROM documents WHERE text IS NOT NULL
),
derived AS (
  SELECT doc_id,
         list_sort(ts, 'DESC')[1:5] AS top5,
         list_filter(list_transform(ts, t -> CASE WHEN LENGTH(t) >= 6 THEN t END),
                     x -> x IS NOT NULL) AS longs,
         list_position(ts, 'spark') AS pos_spark,
         LEN(list_distinct(ts)) AS n_distinct
  FROM base
)
SELECT doc_id,
       COALESCE(array_to_string(top5, '|'), '') AS top5_desc,
       CAST(LEN(longs) AS BIGINT) AS n_long,
       CAST(LEN(flatten([top5, longs])) AS BIGINT) AS flat_len,
       CAST(COALESCE(pos_spark, 0) AS BIGINT) AS pos_spark,
       CAST(n_distinct AS BIGINT) AS n_distinct
FROM derived
"""


@register(
    "array_functions_2",
    oracle=_ARR2_ORACLE,
    description="Array surface, batch 2: descending sort + slice (in-array "
    "top-k), NULL compaction (array_compact), flatten, element position, "
    "distinct count — scalarized for exact hashing",
    tags=("relational", "array", "scalar", "extension"),
)
def array_functions_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All whole-stage-codegen array expressions over one scan — no
    shuffle, no UDF. sort+slice is the in-array top-k idiom; compact is
    the NULL-scrub after a partial transform; position/distinct are the
    audit scalars."""
    base = spread(tbl(spark, sf_dir, "documents")).where(F.col("text").isNotNull()).select(
        "doc_id", F.expr(_TOKS_SPARK).alias("ts")
    )
    derived = base.select(
        "doc_id",
        F.expr("slice(sort_array(ts, false), 1, 5)").alias("top5"),
        F.expr(
            "array_compact(transform(ts, t -> CASE WHEN length(t) >= 6 THEN t END))"
        ).alias("longs"),
        F.expr("array_position(ts, 'spark')").alias("pos_spark"),
        F.expr("size(array_distinct(ts))").alias("n_distinct"),
    )
    return derived.select(
        "doc_id",
        F.concat_ws("|", "top5").alias("top5_desc"),
        F.size("longs").cast("long").alias("n_long"),
        F.expr("size(flatten(array(top5, longs)))").cast("long").alias("flat_len"),
        F.coalesce(F.col("pos_spark"), F.lit(0)).cast("long").alias("pos_spark"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
    )
