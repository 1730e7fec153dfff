"""Round 4 additions, part 29: revenue recognition, Allen interval algebra,
and delta-join incremental view maintenance.

- ``revenue_recognition_monthly`` — the accounting spread: each order's
  total (cents) is recognized pro-rata by DAYS over the calendar months
  of its service period [orderdate, last shipdate], with the
  largest-remainder method making every order conserve its cents exactly
  (base share = integer division; the remainder goes +1 cent to the
  months with the largest division remainders, month-ascending
  tiebreak — the apportion_largest_remainder rule applied per order).
  Orders with no lineitems (or shipdate < orderdate) recognize entirely
  in the order month.  One month explode bounded by the period length,
  windows partitioned by order key, one final month groupBy.

- ``allen_interval_relations`` — Allen's interval algebra as a streaming
  CASE ladder: per-customer order intervals [orderdate, last shipdate]
  sorted by (start, end, key); each consecutive pair is classified into
  the 7 relations reachable under that lexicographic order (precedes,
  meets, overlaps, finished_by, contains, starts, equals) with pure
  comparisons — no engine date arithmetic beyond < and =.  Output is the
  relation histogram with an exact pair checksum, the statistic temporal
  join planners (interval_self_join, range_join_binned) need about their
  input.

- ``ivm_join_delta_view`` — incremental maintenance of a JOIN view by the
  classic delta algebra: with A = A0 + dA (orders split at a date
  literal) and B = B0 + dB (lineitem split at the same date),
  A JOIN B = A0*B0 + A0*dB + dA*B0 + dA*dB.  The four terms are computed
  as four independent joins (each term's sides are disjoint slices, so
  every joined pair lands in EXACTLY one term) and the from-scratch
  rebuild A JOIN B runs IN THE SAME PLAN; the output is per-term row
  counts / revenue-cents / key checksums plus the rebuild row, so the
  oracle verifies that base + three deltas reconstruct the rebuild
  column-for-column.  At 100 TB only the delta terms rescan fresh data:
  A0*B0 is the stored view, dA/dB are the new partition, and A0*dB /
  dA*B0 are key-pruned joins against history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .relational import tbl

_CK_MOD = 1000003

# ---------------------------------------------------------------------------
# revenue_recognition_monthly
# ---------------------------------------------------------------------------

_REVREC_ORACLE = f"""
WITH period AS (
  SELECT o.o_orderkey,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents,
         CAST(o.o_orderdate AS DATE) AS d0,
         GREATEST(CAST(COALESCE(MAX(l.l_shipdate), o.o_orderdate) AS DATE),
                  CAST(o.o_orderdate AS DATE)) AS d1
  FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_totalprice, o.o_orderdate
),
months AS (
  SELECT p.*, CAST(UNNEST(generate_series(date_trunc('month', d0),
                                          date_trunc('month', d1),
                                          INTERVAL 1 MONTH)) AS DATE) AS m
  FROM period p
),
shares AS (
  SELECT o_orderkey, cents, m,
         date_diff('day',
                   GREATEST(m, d0),
                   LEAST(CAST(m + INTERVAL 1 MONTH AS DATE) - 1, d1)) + 1 AS od,
         date_diff('day', d0, d1) + 1 AS td
  FROM months
),
alloc AS (
  SELECT o_orderkey, m,
         (cents * od) // td AS base,
         (cents * od) % td AS rem,
         cents - SUM((cents * od) // td) OVER (PARTITION BY o_orderkey) AS extra,
         ROW_NUMBER() OVER (PARTITION BY o_orderkey
                            ORDER BY (cents * od) % td DESC, m) AS rk
  FROM shares
),
final AS (
  SELECT o_orderkey, m,
         base + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS rec
  FROM alloc
)
SELECT CAST(m AS TIMESTAMP) AS month,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(rec) AS BIGINT) AS recognized_cents,
       CAST(SUM((o_orderkey * 31 + rec % 97) % {_CK_MOD}) AS BIGINT) AS alloc_checksum
FROM final
GROUP BY m
"""


@register(
    "revenue_recognition_monthly",
    oracle=_REVREC_ORACLE,
    description="Accounting revenue recognition: order cents spread "
    "pro-rata by days over the service-period months with per-order "
    "largest-remainder apportionment (integer base DIV + remainder cents "
    "to the largest division remainders, month-asc tiebreak) so every "
    "order conserves its total exactly; month explode bounded by period "
    "length, per-order windows, one month groupBy",
    tags=("analytics", "finance", "window", "extension"),
)
def revenue_recognition_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    # pre-aggregate lineitem to one row per order BEFORE the join: the
    # map-side-combined max shrinks the join's probe side ~4x (and at scale
    # keeps the join input proportional to |orders|, not |lineitem|)
    maxship = (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("_maxship"))
    )
    period = (
        orders.join(maxship, orders.o_orderkey == maxship.l_orderkey, "left")
        .select(
            "o_orderkey",
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
            F.col("o_orderdate").cast("date").alias("d0"),
            F.greatest(
                F.coalesce(F.col("_maxship"), F.col("o_orderdate")).cast("date"),
                F.col("o_orderdate").cast("date"),
            ).alias("d1"),
        )
    )
    months = period.select(
        "o_orderkey",
        "cents",
        "d0",
        "d1",
        F.explode(
            F.sequence(
                F.trunc("d0", "month"), F.trunc("d1", "month"), F.expr("INTERVAL 1 MONTH")
            )
        ).alias("m"),
    )
    shares = months.select(
        "o_orderkey",
        "cents",
        "m",
        (
            F.datediff(
                F.least(F.date_sub(F.add_months("m", 1), 1), F.col("d1")),
                F.greatest(F.col("m"), F.col("d0")),
            )
            + 1
        )
        .cast("long")
        .alias("od"),
        (F.datediff("d1", "d0") + 1).cast("long").alias("td"),
    )
    worder = W.partitionBy("o_orderkey")
    alloc = shares.select(
        "o_orderkey",
        "m",
        F.expr("(cents * od) DIV td").alias("base"),
        ((F.col("cents") - F.sum(F.expr("(cents * od) DIV td")).over(worder))).alias("extra"),
        F.row_number()
        .over(worder.orderBy(F.expr("(cents * od) % td").desc(), F.col("m")))
        .alias("rk"),
    )
    final = alloc.select(
        "o_orderkey",
        "m",
        (F.col("base") + F.when(F.col("rk") <= F.col("extra"), 1).otherwise(0)).alias("rec"),
    )
    return final.groupBy("m").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("rec").cast("long").alias("recognized_cents"),
        F.sum((F.col("o_orderkey") * 31 + F.col("rec") % 97) % _CK_MOD)
        .cast("long")
        .alias("alloc_checksum"),
    ).select(
        F.col("m").cast("timestamp").alias("month"),
        "n_orders",
        "recognized_cents",
        "alloc_checksum",
    )


# ---------------------------------------------------------------------------
# allen_interval_relations
# ---------------------------------------------------------------------------

_ALLEN_ORACLE = f"""
WITH iv AS (
  SELECT o.o_custkey AS cust, o.o_orderkey AS k,
         CAST(o.o_orderdate AS DATE) AS s,
         GREATEST(CAST(COALESCE(MAX(l.l_shipdate), o.o_orderdate) AS DATE),
                  CAST(o.o_orderdate AS DATE)) AS e
  FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey, o.o_orderkey, o.o_orderdate
),
paired AS (
  SELECT cust, k, s, e,
         LEAD(s) OVER w AS s2, LEAD(e) OVER w AS e2, LEAD(k) OVER w AS k2
  FROM iv
  WINDOW w AS (PARTITION BY cust ORDER BY s, e, k)
),
classified AS (
  SELECT cust, k, k2,
         CASE
           WHEN s < s2 AND e < s2 THEN 'precedes'
           WHEN s < s2 AND e = s2 THEN 'meets'
           WHEN s < s2 AND e > s2 AND e < e2 THEN 'overlaps'
           WHEN s < s2 AND e = e2 THEN 'finished_by'
           WHEN s < s2 AND e > e2 THEN 'contains'
           WHEN s = s2 AND e < e2 THEN 'starts'
           ELSE 'equals'
         END AS relation
  FROM paired WHERE s2 IS NOT NULL
)
SELECT relation,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT cust) AS BIGINT) AS n_customers,
       CAST(SUM((k * 31 + k2) % {_CK_MOD}) AS BIGINT) AS pair_checksum
FROM classified
GROUP BY relation
"""


@register(
    "allen_interval_relations",
    oracle=_ALLEN_ORACLE,
    description="Allen's interval algebra over consecutive per-customer "
    "order intervals [orderdate, last shipdate]: the 7 relations reachable "
    "under (start, end, key) lexicographic order classified with pure "
    "comparisons; relation histogram + exact pair checksum — the input "
    "statistic temporal-join planners need",
    tags=("analytics", "temporal", "window", "extension"),
)
def allen_interval_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tbl(spark, sf_dir, "orders")
    maxship = (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("_maxship"))
    )
    iv = (
        orders.join(maxship, orders.o_orderkey == maxship.l_orderkey, "left")
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("o_orderkey").alias("k"),
            F.col("o_orderdate").cast("date").alias("s"),
            F.greatest(
                F.coalesce(F.col("_maxship"), F.col("o_orderdate")).cast("date"),
                F.col("o_orderdate").cast("date"),
            ).alias("e"),
        )
    )
    w = W.partitionBy("cust").orderBy("s", "e", "k")
    paired = iv.select(
        "cust",
        "k",
        "s",
        "e",
        F.lead("s").over(w).alias("s2"),
        F.lead("e").over(w).alias("e2"),
        F.lead("k").over(w).alias("k2"),
    ).filter(F.col("s2").isNotNull())
    classified = paired.select(
        "cust",
        "k",
        "k2",
        F.when((F.col("s") < F.col("s2")) & (F.col("e") < F.col("s2")), "precedes")
        .when((F.col("s") < F.col("s2")) & (F.col("e") == F.col("s2")), "meets")
        .when(
            (F.col("s") < F.col("s2"))
            & (F.col("e") > F.col("s2"))
            & (F.col("e") < F.col("e2")),
            "overlaps",
        )
        .when((F.col("s") < F.col("s2")) & (F.col("e") == F.col("e2")), "finished_by")
        .when((F.col("s") < F.col("s2")) & (F.col("e") > F.col("e2")), "contains")
        .when((F.col("s") == F.col("s2")) & (F.col("e") < F.col("e2")), "starts")
        .otherwise("equals")
        .alias("relation"),
    )
    return classified.groupBy("relation").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.countDistinct("cust").cast("long").alias("n_customers"),
        F.sum((F.col("k") * 31 + F.col("k2")) % _CK_MOD).cast("long").alias("pair_checksum"),
    )


# ---------------------------------------------------------------------------
# ivm_join_delta_view
# ---------------------------------------------------------------------------

_IVM_SPLIT = "1999-01-01"

_IVM_JOIN_ORACLE = f"""
WITH a AS (
  SELECT o_orderkey, o_custkey, o_orderdate,
         CASE WHEN o_orderdate < TIMESTAMP '{_IVM_SPLIT}' THEN 0 ELSE 1 END AS da
  FROM orders
),
b AS (
  SELECT l_orderkey, l_linenumber,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents,
         CASE WHEN l_shipdate < TIMESTAMP '{_IVM_SPLIT}' THEN 0 ELSE 1 END AS db
  FROM lineitem
),
joined AS (
  SELECT a.da, b.db, a.o_orderkey, b.l_linenumber, b.cents
  FROM a JOIN b ON b.l_orderkey = a.o_orderkey
),
terms AS (
  SELECT CASE WHEN da = 0 AND db = 0 THEN 'base_base'
              WHEN da = 0 AND db = 1 THEN 'base_deltaB'
              WHEN da = 1 AND db = 0 THEN 'deltaA_base'
              ELSE 'deltaA_deltaB' END AS term,
         COUNT(*) AS n_rows,
         SUM(cents) AS revenue_cents,
         SUM((o_orderkey * 31 + l_linenumber) % {_CK_MOD}) AS key_checksum
  FROM joined GROUP BY 1
)
SELECT term, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(revenue_cents AS BIGINT) AS revenue_cents,
       CAST(key_checksum AS BIGINT) AS key_checksum
FROM terms
UNION ALL
SELECT 'rebuild' AS term,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents,
       CAST(SUM((o_orderkey * 31 + l_linenumber) % {_CK_MOD}) AS BIGINT) AS key_checksum
FROM joined
"""


@register(
    "ivm_join_delta_view",
    oracle=_IVM_JOIN_ORACLE,
    description="Incremental JOIN-view maintenance by delta algebra: "
    "orders/lineitem each split at a date literal into (base, delta); "
    "A*B = A0*B0 + A0*dB + dA*B0 + dA*dB with the four terms computed as "
    "four disjoint-slice joins and the from-scratch rebuild in the same "
    "plan — the output accounting (rows/cents/key checksums per term + "
    "rebuild row) proves base + deltas reconstruct the rebuild; at scale "
    "only the delta terms rescan fresh data",
    tags=("lakehouse", "incremental", "join", "extension"),
)
def ivm_join_delta_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    split = F.lit(_IVM_SPLIT).cast("timestamp")
    a = tbl(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderdate") < split, 0).otherwise(1).alias("da"),
    )
    b = tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.expr("CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)").alias(
            "cents"
        ),
        F.when(F.col("l_shipdate") < split, 0).otherwise(1).alias("db"),
    )
    # The four IVM terms are the (da, db) slices of one shuffled equi-join:
    # computing them from a single join keeps history scanned once here;
    # in the incremental deployment each term is its own pruned join.
    joined = a.join(b, a.o_orderkey == b.l_orderkey).select(
        "da", "db", "o_orderkey", "l_linenumber", "cents"
    )
    ck = (F.col("o_orderkey") * 31 + F.col("l_linenumber")) % _CK_MOD
    terms = joined.groupBy(
        F.when((F.col("da") == 0) & (F.col("db") == 0), "base_base")
        .when((F.col("da") == 0) & (F.col("db") == 1), "base_deltaB")
        .when((F.col("da") == 1) & (F.col("db") == 0), "deltaA_base")
        .otherwise("deltaA_deltaB")
        .alias("term")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("revenue_cents"),
        F.sum(ck).cast("long").alias("key_checksum"),
    )
    rebuild = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("revenue_cents"),
        F.sum(ck).cast("long").alias("key_checksum"),
    ).select(F.lit("rebuild").alias("term"), "n_rows", "revenue_cents", "key_checksum")
    return terms.unionAll(rebuild)
