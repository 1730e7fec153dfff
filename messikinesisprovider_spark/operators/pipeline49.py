"""Round 4 additions, part 24: quantile normalization, business-day
arithmetic, null-safe join semantics.

- ``quantile_bucket_normalize`` — quantile normalization (the
  bioinformatics / feature-prep transform that forces every group onto a
  shared distribution): values ranked within their group (partitioned
  window, id tiebreak), mapped to one of 20 quantile buckets by exact
  integer arithmetic ((rn-1)*Q DIV n — no percentile interpolation), and
  each (group, bucket) decimal mean is re-targeted to the cross-group
  bucket mean.  The cross-group reduce runs on the (groups x buckets)
  micro-table; output is the normalization mapping itself, so the
  compare verifies every source and target moment.

- ``business_days_ship_delay`` — business-day arithmetic without any
  engine calendar function: weekday = (epoch_day + 3) % 7 (1970-01-01
  was a Thursday) is pure integer arithmetic, identical everywhere —
  Spark's dayofweek (1=Sunday) and DuckDB's dow (0=Sunday) conventions
  never enter.  The weekend-excluded delay between order date and ship
  date = full_weeks*5 + a python-precomputed 7x7 residual CASE table.
  Output: delay histogram + key checksum.

- ``null_safe_key_join`` — the <=> / IS NOT DISTINCT FROM semantic
  corner: per-key aggregates of two deterministically NULLed projections
  joined NULL-SAFELY, so the NULL group pairs like a value (a normal
  equi-join drops it).  Spark plans EqualNullSafe as a hash-join key —
  this stays a real shuffled equi-join, no BNLJ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .relational import events_tbl, tbl

# ---------------------------------------------------------------------------
# quantile_bucket_normalize
# ---------------------------------------------------------------------------

_QN_BUCKETS = 20

_QN_ORACLE = f"""
WITH ev AS (
  SELECT event_type, event_id, value FROM events WHERE value IS NOT NULL
),
ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM ev
),
bucketed AS (
  SELECT event_type, ((rn - 1) * {_QN_BUCKETS}) // n AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_vals,
         SUM(CAST(value AS DECIMAL(18,6))) AS val_sum
  FROM ranked GROUP BY event_type, ((rn - 1) * {_QN_BUCKETS}) // n
),
target AS (
  SELECT bucket,
         CAST(SUM(val_sum) AS DOUBLE) / SUM(n_vals) AS target_mean
  FROM bucketed GROUP BY bucket
)
SELECT b.event_type, CAST(b.bucket AS BIGINT) AS bucket, b.n_vals,
       CAST(b.val_sum AS DOUBLE) / b.n_vals AS group_mean,
       t.target_mean
FROM bucketed b JOIN target t USING (bucket)
"""


@register(
    "quantile_bucket_normalize",
    oracle=_QN_ORACLE,
    description=f"Quantile normalization over {_QN_BUCKETS} buckets: "
    "within-group rank (partitioned window, id tiebreak) -> exact integer "
    "bucket assignment -> per-(group,bucket) decimal means re-targeted to "
    "the cross-group bucket mean; the cross-group reduce is a "
    "groups-x-buckets micro-table; output is the mapping itself",
    tags=("ml", "features", "analytics", "extension"),
)
def quantile_bucket_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select("event_type", "event_id", "value")
    )
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("value", "event_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).alias("n"),
    )
    bucketed = (
        ranked.groupBy(
            "event_type",
            F.expr(f"((rn - 1) * {_QN_BUCKETS}) DIV n").alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vals"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("val_sum"),
        )
    )
    target = bucketed.groupBy("bucket").agg(
        (F.sum("val_sum").cast("double") / F.sum("n_vals")).alias("target_mean")
    )
    return (
        bucketed.join(target, "bucket")
        .select(
            "event_type",
            F.col("bucket").cast("long").alias("bucket"),
            "n_vals",
            (F.col("val_sum").cast("double") / F.col("n_vals")).alias("group_mean"),
            "target_mean",
        )
    )


# ---------------------------------------------------------------------------
# business_days_ship_delay
# ---------------------------------------------------------------------------


def _residual_case(w1: str, r: str) -> str:
    """Python-precomputed weekend-exclusion residual: for start weekday w
    (0=Monday) and residual span r (0..6), how many of the r days
    FOLLOWING the start are weekdays."""
    entries = []
    for w in range(7):
        for rr in range(1, 7):
            k = sum(1 for i in range(1, rr + 1) if (w + i) % 7 < 5)
            entries.append(f"WHEN {w1} = {w} AND {r} = {rr} THEN {k}")
    return "CASE " + " ".join(entries) + " ELSE 0 END"


def _bizdays_sql(engine: str) -> str:
    if engine == "duck":
        e1 = "(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01')"
        e2 = "(CAST(l.l_shipdate AS DATE) - DATE '1970-01-01')"
    else:
        e1 = "datediff(CAST(o.o_orderdate AS DATE), DATE '1970-01-01')"
        e2 = "datediff(CAST(l.l_shipdate AS DATE), DATE '1970-01-01')"
    div = "//" if engine == "duck" else "DIV"
    w1 = f"(({e1}) + 3) % 7"
    full = f"({e2}) - ({e1})"
    res = _residual_case("w1", "r")
    return f"""
WITH spans AS (
  SELECT l.l_orderkey, l.l_linenumber,
         {w1} AS w1,
         ({full}) {div} 7 AS weeks,
         ({full}) % 7 AS r
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_shipdate >= o.o_orderdate
),
biz AS (
  SELECT l_orderkey, l_linenumber,
         weeks * 5 + ({res}) AS bizdays
  FROM spans
)
SELECT CAST(bizdays AS BIGINT) AS bizdays,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(l_orderkey % 1000003) AS BIGINT) AS key_checksum
FROM biz
GROUP BY bizdays
"""


@register(
    "business_days_ship_delay",
    oracle=_bizdays_sql("duck"),
    description="Weekend-excluded ship delay in business days via pure "
    "integer arithmetic: weekday = (epoch_day + 3) % 7 (no engine "
    "calendar conventions), full_weeks*5 + a python-precomputed 7x7 "
    "residual CASE; delay histogram + key checksum from one join + one "
    "groupBy",
    tags=("timeseries", "calendar", "analytics", "extension"),
)
def business_days_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_bizdays_sql("spark"))


# ---------------------------------------------------------------------------
# null_safe_key_join
# ---------------------------------------------------------------------------

_NS_ORACLE = """
WITH a AS (
  SELECT CASE WHEN doc_id % 11 = 0 THEN NULL ELSE source END AS k,
         CAST(COUNT(*) AS BIGINT) AS n_a, CAST(SUM(doc_id) AS BIGINT) AS ck_a
  FROM documents GROUP BY 1
),
b AS (
  SELECT CASE WHEN doc_id % 7 = 0 THEN NULL ELSE source END AS k,
         CAST(COUNT(*) AS BIGINT) AS n_b, CAST(SUM(doc_id) AS BIGINT) AS ck_b
  FROM documents GROUP BY 1
)
SELECT a.k, a.n_a, a.ck_a, b.n_b, b.ck_b
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
"""


@register(
    "null_safe_key_join",
    oracle=_NS_ORACLE,
    description="Null-safe equi-join (<=> / IS NOT DISTINCT FROM): per-key "
    "aggregates of two deterministically NULLed projections joined so the "
    "NULL group pairs like a value; Spark plans EqualNullSafe as a hash "
    "join key — a real shuffled equi-join, no BNLJ",
    tags=("relational", "join", "null-semantics", "extension"),
)
def null_safe_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")

    def side(mod: int, nn: str, cn: str) -> DataFrame:
        return (
            d.select(
                F.when(F.col("doc_id") % mod == 0, F.lit(None))
                .otherwise(F.col("source"))
                .alias("k"),
                "doc_id",
            )
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).cast("long").alias(nn),
                F.sum("doc_id").cast("long").alias(cn),
            )
        )

    a = side(11, "n_a", "ck_a")
    b = side(7, "n_b", "ck_b").withColumnRenamed("k", "kb")
    return a.join(b, a.k.eqNullSafe(F.col("kb"))).select("k", "n_a", "ck_a", "n_b", "ck_b")
