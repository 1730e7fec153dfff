"""Batch operator surface, part 2: temporal/statistical/navigation operators.

Continues relational.py with the operator families a streaming-log engine's
users lean on hardest: as-of joins (nearest-event semantics — the batch
generalization of the reference's AT_EXTERNAL_ID nearest-match positioning,
KinesisMessiStreamingConsumer.java:106-148), gaps-and-islands
sessionization, interval self-joins, navigation windows, exact order
statistics, and moment-based statistics computed with order-independent
decimal sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .relational import dsum, events_tbl, tbl, _osum


@register(
    "asof_join_last_click",
    oracle="""
    WITH errors AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'error' AND user_id IS NOT NULL
    ),
    clicks AS (
      SELECT user_id, ts FROM events
      WHERE event_type = 'click' AND user_id IS NOT NULL
    )
    SELECT e.event_id,
           e.user_id,
           e.ts::TIMESTAMP AS error_ts,
           l.click_ts
    FROM errors e
    LEFT JOIN (
      SELECT e2.event_id, MAX(l.ts)::TIMESTAMP AS click_ts
      FROM errors e2 JOIN clicks l
        ON l.user_id = e2.user_id AND l.ts <= e2.ts
      GROUP BY e2.event_id
    ) l ON l.event_id = e.event_id
    """,
    description="As-of join: for each error event, the most recent click of the same user",
    tags=("asof", "join", "temporal"),
)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable as-of join via the union-and-carry-forward pattern: tag both
    streams, sort within user by time, carry the last click forward with
    last_value(ignoreNulls). ONE shuffle on user_id — no range-join blowup
    (the naive inequality join is O(|errors|·|clicks per user|))."""
    # user_id IS NOT NULL on both sides: a keyed as-of join follows SQL join
    # semantics (NULL matches nothing) — without the filter the Spark window
    # groups NULL users into one partition while the oracle's equi-join
    # drops them, a cross-engine divergence.
    ev = events_tbl(spark, sf_dir).filter(F.col("user_id").isNotNull())
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", F.lit(None).cast("timestamp").alias("click_ts"), F.lit(1).alias("is_err")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.lit(None).cast("bigint").alias("event_id"),
        "user_id",
        "ts",
        F.col("ts").alias("click_ts"),
        F.lit(0).alias("is_err"),
    )
    # order by (ts, is_err): a click at exactly the error's ts counts (<=)
    w = W.partitionBy("user_id").orderBy("ts", "is_err").rowsBetween(W.unboundedPreceding, W.currentRow)
    merged = errors.unionByName(clicks).withColumn(
        "carried_login", F.last("click_ts", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("is_err") == 1).select(
        "event_id",
        "user_id",
        F.col("ts").alias("error_ts"),
        F.col("carried_login").alias("click_ts"),
    )


@register(
    "sessionize_gaps",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE ts IS NOT NULL
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts)::TIMESTAMP AS session_start,
           MAX(ts)::TIMESTAMP AS session_end,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
    description="Gaps-and-islands sessionization (30-minute inactivity gap) — batch twin of session_window",
    tags=("session", "window", "temporal"),
)
def sessionize_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sessions are defined over timestamped events only: a NULL ts has no
    # gap to its neighbors (and would sort NULLS FIRST here, NULLS LAST in
    # ANSI engines — a latent cross-engine session-count divergence)
    ev = events_tbl(spark, sf_dir).filter(F.col("ts").isNotNull())
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wo) > 1_800_000_000)
            | F.lag("ts").over(wo).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    ws = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(ws).cast("bigint"))
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "interval_self_join",
    oracle="""
    SELECT a.event_id AS event_a, b.event_id AS event_b,
           a.user_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 1 HOUR
     AND a.event_type = 'click' AND b.event_type = 'purchase'
    """,
    description="Interval self-join: purchases within 1 hour after a click (equi key + time residual)",
    tags=("join", "interval", "temporal"),
)
def interval_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_tbl(spark, sf_dir)
    a = ev.filter(F.col("event_type") == "click").alias("a")
    b = ev.filter(F.col("event_type") == "purchase").alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            F.col("a.event_id").alias("event_a"),
            F.col("b.event_id").alias("event_b"),
            F.col("a.user_id").alias("user_id"),
        )
    )


@register(
    "window_navigation",
    oracle="""
    SELECT event_id, user_id,
           LEAD(event_type, 1, 'none') OVER w AS next_type,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts NULLS LAST,
                                        event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING) AS final_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id)
    """,
    description="Navigation windows: LEAD with default, FIRST_VALUE, whole-partition LAST_VALUE",
    tags=("window", "navigation"),
)
def window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explicit NULLS LAST (Spark ASC = NULLS FIRST, DuckDB = NULLS LAST):
    # an untimestamped event navigates as the LAST element of its user's
    # timeline in both engines
    ev = events_tbl(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy(F.asc_nulls_last("ts"), "event_id")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.lead("event_type", 1, "none").over(w).alias("next_type"),
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(wfull).alias("final_type"),
    )


@register(
    "percent_rank_cume",
    oracle="""
    SELECT c_custkey, c_acctbal,
           CAST(ROUND(PERCENT_RANK() OVER (ORDER BY c_acctbal NULLS LAST, c_custkey), 6) AS DOUBLE) AS pct_rank,
           CAST(ROUND(CUME_DIST()    OVER (ORDER BY c_acctbal NULLS LAST, c_custkey), 6) AS DOUBLE) AS cume
    FROM customer
    """,
    description="PERCENT_RANK and CUME_DIST distribution windows",
    tags=("window", "rank"),
)
def percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-pass global ranking (ranking.global_row_number): a bare
    # Window.orderBy would single-partition the whole table at scale.
    from .ranking import cume_dist_of, global_row_number, percent_rank_of

    c = tbl(spark, sf_dir, "customer")
    # explicit NULLS LAST: Spark ASC defaults NULLS FIRST, DuckDB NULLS
    # LAST — a NULL balance must rank last in both engines
    ranked, n = global_row_number(
        c, [F.asc_nulls_last("c_acctbal"), "c_custkey"], rn_col="_rn"
    )
    return ranked.select(
        "c_custkey",
        "c_acctbal",
        F.round(percent_rank_of(F.col("_rn"), n), 6).cast("double").alias("pct_rank"),
        F.round(cume_dist_of(F.col("_rn"), n), 6).cast("double").alias("cume"),
    )


@register(
    "exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(quantile_cont(l_quantity, 0.5), 4) AS DOUBLE) AS p50_qty,
           CAST(ROUND(quantile_cont(l_quantity, 0.9), 4) AS DOUBLE) AS p90_qty,
           CAST(ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS DOUBLE) AS p99_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="Exact interpolated percentiles (median/p90/p99) per group",
    tags=("agg", "percentile"),
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    # The two l_quantity percentiles share ONE buffer (array form — identical
    # sort + interpolation, bit-identical values); p99 is a different input
    # column, so it keeps its own aggregate.
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, array(0.5, 0.9))").alias("_pq"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).cast("double").alias("p99_price"),
    ).select(
        "l_returnflag",
        F.round(F.col("_pq").getItem(0), 4).cast("double").alias("p50_qty"),
        F.round(F.col("_pq").getItem(1), 4).cast("double").alias("p90_qty"),
        "p99_price",
    )


@register(
    "moment_statistics",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           {_osum("o_totalprice", "sum_price")},
           CAST(ROUND((CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(28,8))) AS DOUBLE)
                 - CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                   * CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
                / (COUNT(*) - 1), 4) AS DOUBLE) AS var_price
    FROM orders
    GROUP BY o_orderstatus
    HAVING COUNT(*) > 1
    """,
    description="Sample variance via exact decimal moments (order-independent, shuffle-safe)",
    tags=("agg", "statistics"),
)
def moment_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Both moments are summed as exact decimals (order-independent across
    # shuffle partitions); the final combine runs in double — deterministic
    # because both engines start from the identical decimal sums.
    o = tbl(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", "sum_price"),
            F.expr(
                "CAST(ROUND((CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(28,8))) AS DOUBLE)"
                " - CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)"
                "   * CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))"
                " / (COUNT(*) - 1), 4) AS DOUBLE)"
            ).alias("var_price"),
        )
        .filter(F.col("n") > 1)
    )


@register(
    "minby_maxby",
    oracle="""
    SELECT o_custkey,
           MIN_BY(o_orderkey, o_totalprice) AS cheapest_order,
           MAX_BY(o_orderkey, o_totalprice) AS priciest_order,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_custkey
    """,
    description="MIN_BY / MAX_BY argmin-argmax aggregation",
    tags=("agg", "argminmax"),
)
def minby_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ties: o_totalprice has 2 decimal digits over a wide range; duplicates
    # within one customer are absent in this generator (asserted by parity)
    o = tbl(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.expr("min_by(o_orderkey, o_totalprice)").alias("cheapest_order"),
        F.expr("max_by(o_orderkey, o_totalprice)").alias("priciest_order"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "bool_aggregates",
    oracle="""
    SELECT user_id,
           BOOL_OR(event_type = 'purchase')  AS ever_purchased,
           BOOL_AND(value >= 0)              AS all_nonnegative,
           COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors
    FROM events
    GROUP BY user_id
    """,
    description="Boolean aggregates (ANY/EVERY) + FILTER clause counting",
    tags=("agg", "boolean"),
)
def bool_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_tbl(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.expr("any(event_type = 'purchase')").alias("ever_purchased"),
        F.expr("every(value >= 0)").alias("all_nonnegative"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
    )


@register(
    "explode_word_topk",
    oracle="""
    SELECT word, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
    FROM (SELECT doc_id, UNNEST(str_split(text, ' ')) AS word FROM documents)
    GROUP BY word
    ORDER BY n_occurrences DESC, word
    LIMIT 20
    """,
    description="Lateral explode of tokens → global top-k vocabulary",
    tags=("explode", "lateral", "topk", "text"),
)
def explode_word_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), "word")
        .limit(20)
    )


@register(
    "string_functions_2",
    oracle="""
    SELECT doc_id,
           REPLACE(SUBSTRING(text, 1, 20), ' ', '_') AS head_snake,
           LPAD(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
           SPLIT_PART(text, ' ', 1) AS first_word,
           POSITION(' ' IN text) AS first_space,
           REVERSE(SUBSTRING(text, 1, 10)) AS rev_head,
           REPEAT('ab', 3) AS repeated
    FROM documents
    WHERE doc_id % 10 = 0
    """,
    description="String function family: replace/lpad/split_part/position/reverse/repeat",
    tags=("scalar", "string"),
)
def string_functions_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return d.select(
        "doc_id",
        F.replace(F.substring("text", 1, 20), F.lit(" "), F.lit("_")).alias("head_snake"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.expr("split_part(text, ' ', 1)").alias("first_word"),
        F.expr("CAST(position(' ' IN text) AS BIGINT)").alias("first_space"),
        F.reverse(F.substring("text", 1, 10)).alias("rev_head"),
        F.repeat(F.lit("ab"), 3).alias("repeated"),
    )


@register(
    "date_functions_2",
    oracle="""
    SELECT o_orderkey,
           (o_orderdate + INTERVAL 30 DAY)::TIMESTAMP AS due_date,
           date_trunc('month', o_orderdate)::TIMESTAMP AS order_month,
           last_day(o_orderdate::DATE)::TIMESTAMP AS month_end,
           CAST(dayofweek(o_orderdate) AS INT) AS dow,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '1999-01-01') AS BIGINT) AS days_to_1999
    FROM orders
    WHERE o_orderkey % 97 = 0
    """,
    description="Date/time function family: interval add, trunc, last_day, dow, quarter, datediff",
    tags=("scalar", "date"),
)
def date_functions_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        # Spark dayofweek: 1=Sunday..7; DuckDB dayofweek: 0=Sunday..6
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.datediff(F.lit("1999-01-01").cast("timestamp"), F.col("o_orderdate"))
        .cast("bigint")
        .alias("days_to_1999"),
    )


@register(
    "approx_percentile_sketch",
    # The sketch's member values are engine-internal, so the portable output
    # is the exact interpolated percentiles plus a boolean asserting every
    # sketch value landed within 2% relative — the oracle reproduces exact +
    # TRUE. At accuracy 10000 the rank error is <= n/10000 (a handful of
    # rows per group here), far inside the band on this distribution.
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS DOUBLE) AS p50,
           CAST(ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS DOUBLE) AS p90,
           CAST(ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS DOUBLE) AS p99,
           TRUE AS sketch_within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
    description="approx_percentile (KLL-style sketch) per group — the 100 TB "
    "path for order statistics, verified in-plan against exact percentiles",
    tags=("agg", "percentile", "approx"),
)
def approx_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    # One exact-percentile buffer for all three targets (array form —
    # identical sort + interpolation, bit-identical values).
    agg = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").alias("_ep"),
        F.expr("approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)").alias(
            "_ap"
        ),
    ).select(
        "l_returnflag",
        F.round(F.col("_ep").getItem(0), 4).cast("double").alias("p50"),
        F.round(F.col("_ep").getItem(1), 4).cast("double").alias("p90"),
        F.round(F.col("_ep").getItem(2), 4).cast("double").alias("p99"),
        "_ap",
    )
    close = (
        (F.abs(F.col("_ap")[0] - F.col("p50")) <= F.col("p50") * F.lit(0.02))
        & (F.abs(F.col("_ap")[1] - F.col("p90")) <= F.col("p90") * F.lit(0.02))
        & (F.abs(F.col("_ap")[2] - F.col("p99")) <= F.col("p99") * F.lit(0.02))
    )
    return agg.select(
        "l_returnflag", "p50", "p90", "p99", close.alias("sketch_within_tol")
    )
