"""Event-sequence analytics, round 3h.

- ``sequence_pattern_match``: CEP-style pattern detection (the
  MATCH_RECOGNIZE shape): each user's event history becomes an ordered
  symbol string (one char per event type), and a regular expression counts
  pattern occurrences — here ``cv*p``, "click, any number of views, then
  purchase, with nothing else in between". Over {c,v,p,s,e} with a
  required terminal symbol, greedy-vs-backtracking engines cannot
  disagree, so Java regex (Spark) and RE2 (DuckDB) count identically and
  the operator is oracle-exact.
- ``seasonal_hourly_index``: per-event-type hourly seasonality: the share
  of a type's events in each hour-of-day, scaled against the uniform 1/24
  baseline. Index is scaled-integer (1e6 = exactly at baseline) so the
  cross-engine compare is exact; the load profile every ops dashboard
  draws.

Reference parity note: the reference (SURVEY.md §0) has no analytics
surface; these extend the batch side per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import events_tbl

# ---------------------------------------------------------------------------
# sequence_pattern_match
# ---------------------------------------------------------------------------

SEQ_PATTERN = "cv*p"  # click -> views -> purchase, nothing else between


@register(
    "sequence_pattern_match",
    oracle=f"""
    WITH seqs AS (
      SELECT user_id,
             string_agg(COALESCE(substr(event_type, 1, 1), 'x'), ''
                        ORDER BY ts, event_id) AS seq
      FROM events
      WHERE user_id IS NOT NULL
      GROUP BY user_id
    )
    SELECT user_id,
           CAST(LENGTH(seq) AS BIGINT) AS n_events,
           CAST(len(regexp_extract_all(seq, '{SEQ_PATTERN}')) AS BIGINT) AS n_matches
    FROM seqs
    WHERE len(regexp_extract_all(seq, '{SEQ_PATTERN}')) > 0
    """,
    description="CEP sequence matching: count 'click -> view* -> purchase' "
    "runs per user via regex over the ordered event-type string",
    tags=("analytics", "sequence", "cep", "extension"),
)
def sequence_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE semantics as groupBy + sorted collect + regex.

    Scale plan: ONE shuffle on user_id; per-user state is that user's
    event initials (bounded by per-user activity, the same state any
    sessionizer carries). The symbol string is built with
    ``array_join(transform(sort_array(collect_list(struct(ts, event_id,
    initial)))))`` — sort_array on (ts, event_id) gives the unique total
    order, so the regex input is deterministic. Matching runs inside
    whole-stage codegen (regexp_extract_all is a JVM expression, no UDF).
    Engine-portability note: over a 5-symbol alphabet with a required
    terminal symbol, `cv*p` is effectively a DFA — leftmost non-overlapping
    counts agree between Java regex and RE2 regardless of greedy/
    backtracking strategy (a `v*` can never eat the `p` that follows).
    NULL users are excluded (no cross-engine NULL-group ordering contract);
    NULL event types map to the reserved symbol 'x'.
    """
    e = events_tbl(spark, sf_dir).filter(F.col("user_id").isNotNull())
    seqs = (
        e.select(
            "user_id",
            F.struct(
                "ts",
                "event_id",
                F.coalesce(F.substring("event_type", 1, 1), F.lit("x")).alias("sym"),
            ).alias("ev"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.expr("transform(sort_array(collect_list(ev)), e -> e.sym)"), ""
            ).alias("seq")
        )
    )
    matched = seqs.select(
        "user_id",
        F.length("seq").cast("bigint").alias("n_events"),
        F.size(F.expr(f"regexp_extract_all(seq, '{SEQ_PATTERN}', 0)"))
        .cast("bigint")
        .alias("n_matches"),
    )
    return matched.filter(F.col("n_matches") > 0)


# ---------------------------------------------------------------------------
# seasonal_hourly_index
# ---------------------------------------------------------------------------

SEASONAL_SCALE = 1_000_000  # 1e6 == exactly the uniform 1/24 baseline


@register(
    "seasonal_hourly_index",
    oracle=f"""
    WITH by_hour AS (
      SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hh,
             COUNT(*) AS n
      FROM events
      GROUP BY event_type, hh
    ),
    totals AS (
      SELECT event_type, SUM(n) AS total FROM by_hour GROUP BY event_type
    )
    SELECT b.event_type, b.hh, b.n,
           CAST((b.n * 24 * {SEASONAL_SCALE}) // t.total AS BIGINT) AS index_scaled
    FROM by_hour b JOIN totals t USING (event_type)
    """,
    description="Hourly seasonality index per event type: hour share vs the "
    "uniform 1/24 baseline, scaled-integer exact",
    tags=("analytics", "timeseries", "extension"),
)
def seasonal_hourly_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two map-side-combined aggregates + a broadcast rejoin.

    Scale plan: the (type, hour) grid is at most |types| x 24 rows after
    the first aggregate — partial aggregation collapses the corpus
    map-side, the per-type totals re-aggregate those few rows, and the
    rejoin broadcasts. ``index_scaled`` = n/total x 24 x 1e6 via integer
    division — order-independent, bit-exact cross-engine (1e6 means the
    hour carries exactly its uniform share).
    """
    e = events_tbl(spark, sf_dir)
    by_hour = (
        e.select("event_type", F.hour("ts").cast("int").alias("hh"))
        .groupBy("event_type", "hh")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = by_hour.groupBy("event_type").agg(F.sum("n").alias("total"))
    return (
        by_hour.join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "hh",
            "n",
            F.expr(f"(n * 24 * {SEASONAL_SCALE}) div total")
            .cast("bigint")
            .alias("index_scaled"),
        )
    )
