"""Round 4 additions, part 31: SQL pipe syntax, fairness parity, blocking
quality metrics.

- ``sql_pipe_syntax_report`` — the Spark 4 SQL pipe-syntax front-end
  (``FROM t |> WHERE ... |> EXTEND ... |> AGGREGATE ... GROUP BY``):
  the pricing-summary shape written as a pipeline instead of nested
  SELECTs.  Same Catalyst plan as the
  classic form — this registers the FRONT-END surface; determinism via
  the registry's decimal-sum convention.

- ``fairness_parity_audit`` — the four-fifths (80%%) disparate-impact
  rule as exact integer arithmetic: per-market-segment fulfilled-order
  customer rates vs the global rate, disparity ratio from BIGINT
  cross-products with ONE IEEE division, and the flag evaluated as the
  rational cross-multiplication 5*pos*g_n < 4*n*g_pos (or the inverse) —
  no float thresholds anywhere.  The responsible-AI eval twin of the
  k-anonymity/l-diversity/t-closeness privacy trio.

- ``blocking_quality_metrics`` — record-linkage blocking evaluation
  WITHOUT materializing a single candidate pair: reduction ratio and
  pair completeness from group-size arithmetic alone.  Candidate pairs =
  sum C(block size, 2) per blocking key (raw prefix-16), truth pairs =
  sum C(group, 2) over the bag-of-words duplicate class (md5 of the
  sorted distinct word set — an EQUIVALENCE key, which is what makes the
  group-arithmetic trick legal), intersection = sum C(group, 2) over
  (block, truth) — three aggregates over counts, because a pair join for
  evaluation would be quadratic exactly where blocking avoids it.  On
  this corpus the verdict is itself informative: prefix blocking
  recalls ~0.2%% of word-set duplicates (reordered templates), the
  exact finding such an audit exists to surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import tbl

# ---------------------------------------------------------------------------
# sql_pipe_syntax_report
# ---------------------------------------------------------------------------

_PIPE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18, 6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18, 6))) AS DOUBLE)
         AS sum_disc_price,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
GROUP BY l_returnflag, l_linestatus
"""


@register(
    "sql_pipe_syntax_report",
    oracle=_PIPE_ORACLE,
    description="Spark 4 SQL pipe syntax (FROM |> WHERE |> AGGREGATE "
    "... GROUP BY |> SELECT): the pricing-summary shape as a pipeline "
    "— same Catalyst plan, new front-end surface; decimal-sum determinism "
    "per the registry convention",
    tags=("sql", "agg", "extension"),
)
def sql_pipe_syntax_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "lineitem").createOrReplaceTempView("_pipe_lineitem")
    return spark.sql(
        """
        FROM _pipe_lineitem
        |> WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |> EXTEND CAST(l_quantity AS DECIMAL(18, 6)) AS qty_dec,
                  CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18, 6)) AS price_dec
        |> AGGREGATE SUM(qty_dec) AS _sq, SUM(price_dec) AS _sp,
                     COUNT(*) AS n_rows
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus,
                  CAST(_sq AS DOUBLE) AS sum_qty,
                  CAST(_sp AS DOUBLE) AS sum_disc_price,
                  CAST(n_rows AS BIGINT) AS n_rows
        """
    )


# ---------------------------------------------------------------------------
# fairness_parity_audit
# ---------------------------------------------------------------------------

_PARITY_ORACLE = """
WITH outcomes AS (
  SELECT c.c_custkey, c.c_mktsegment,
         MAX(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS pos
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_mktsegment
),
per AS (
  SELECT c_mktsegment AS segment,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pos) AS BIGINT) AS n_pos
  FROM outcomes GROUP BY c_mktsegment
),
tot AS (SELECT SUM(n) AS g_n, SUM(n_pos) AS g_pos FROM per)
SELECT p.segment, p.n, p.n_pos,
       CASE WHEN t.g_pos = 0 OR p.n = 0 THEN 0.0
            ELSE CAST(p.n_pos * t.g_n AS DOUBLE) / CAST(p.n * t.g_pos AS DOUBLE)
       END AS parity_ratio,
       (5 * p.n_pos * t.g_n < 4 * p.n * t.g_pos
        OR 4 * p.n_pos * t.g_n > 5 * p.n * t.g_pos) AS flagged
FROM per p CROSS JOIN tot t
"""


@register(
    "fairness_parity_audit",
    oracle=_PARITY_ORACLE,
    description="Four-fifths disparate-impact rule, exact: per-segment "
    "fulfilled-customer rates vs global, disparity ratio from BIGINT "
    "cross-products (one IEEE division), flag via the rational "
    "cross-multiplication 5*pos*g_n < 4*n*g_pos — no float thresholds; "
    "the responsible-AI twin of the privacy-audit trio",
    tags=("analytics", "evaluation", "governance", "extension"),
)
def fairness_parity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders").select(
        "o_custkey", F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("f")
    )
    outcomes = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.coalesce(F.max("f"), F.lit(0)).alias("pos"))
    )
    per = outcomes.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pos").cast("long").alias("n_pos"),
    )
    tot = per.agg(F.sum("n").alias("g_n"), F.sum("n_pos").alias("g_pos"))
    return per.crossJoin(F.broadcast(tot)).select(
        "segment",
        "n",
        "n_pos",
        F.when((F.col("g_pos") == 0) | (F.col("n") == 0), F.lit(0.0))
        .otherwise(
            (F.col("n_pos") * F.col("g_n")).cast("double")
            / (F.col("n") * F.col("g_pos")).cast("double")
        )
        .alias("parity_ratio"),
        (
            (5 * F.col("n_pos") * F.col("g_n") < 4 * F.col("n") * F.col("g_pos"))
            | (4 * F.col("n_pos") * F.col("g_n") > 5 * F.col("n") * F.col("g_pos"))
        ).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# blocking_quality_metrics
# ---------------------------------------------------------------------------

_BLOCKING_ORACLE = """
WITH d AS MATERIALIZED (
  SELECT doc_id,
         substr(lower(text), 1, 16) AS block,
         md5(array_to_string(list_sort(list_distinct(
             regexp_extract_all(lower(text), '[a-z]+'))), '|')) AS fp
  FROM documents WHERE text IS NOT NULL
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
cand AS (
  SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT) AS cand_pairs
  FROM (SELECT COUNT(*) AS c FROM d GROUP BY block)
),
truth AS (
  SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT) AS truth_pairs
  FROM (SELECT COUNT(*) AS c FROM d GROUP BY fp)
),
hit AS (
  SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT) AS hit_pairs
  FROM (SELECT COUNT(*) AS c FROM d GROUP BY block, fp)
)
SELECT t.n, c.cand_pairs, u.truth_pairs, h.hit_pairs,
       CASE WHEN t.n < 2 THEN 0.0
            ELSE 1.0 - CAST(c.cand_pairs AS DOUBLE) / CAST(t.n * (t.n - 1) // 2 AS DOUBLE)
       END AS reduction_ratio,
       CASE WHEN u.truth_pairs = 0 THEN 1.0
            ELSE CAST(h.hit_pairs AS DOUBLE) / CAST(u.truth_pairs AS DOUBLE)
       END AS pair_completeness
FROM tot t CROSS JOIN cand c CROSS JOIN truth u CROSS JOIN hit h
"""


@register(
    "blocking_quality_metrics",
    oracle=_BLOCKING_ORACLE,
    description="Record-linkage blocking evaluation with ZERO pair "
    "materialization: candidate/truth/hit pairs all from group-size "
    "arithmetic sum C(c,2) (per raw-prefix block, per bag-of-words "
    "equivalence class, per both), reduction ratio and pair completeness "
    "as one IEEE division each — a pair join for evaluation would be "
    "quadratic exactly where blocking avoids it",
    tags=("dedup", "evaluation", "llm-pipeline", "extension"),
)
def blocking_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        tbl(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            F.expr("substr(lower(text), 1, 16)").alias("block"),
            F.expr(
                "md5(array_join(array_sort(array_distinct("
                "regexp_extract_all(lower(text), '[a-z]+', 0))), '|'))"
            ).alias("fp"),
        )
    )

    # One pass, no scalar crossJoins: (block, fp) cell counts, re-keyed by
    # tag (block / fp / both) in a single union, pair sums per tag, then a
    # conditional aggregate folds the three tags + row total into one row.
    cells = d.groupBy("block", "fp").agg(F.count(F.lit(1)).alias("c"))
    tagged = (
        cells.select(F.lit("block").alias("tag"), F.col("block").alias("key"), "c")
        .unionAll(cells.select(F.lit("fp").alias("tag"), F.col("fp").alias("key"), "c"))
        .unionAll(
            cells.select(
                F.lit("both").alias("tag"),
                F.concat("fp", "block").alias("key"),
                "c",
            )
        )
    )
    per = tagged.groupBy("tag", "key").agg(F.sum("c").alias("g"))
    out = per.agg(
        F.coalesce(
            F.sum(F.when(F.col("tag") == "fp", F.col("g"))).cast("long"), F.lit(0)
        ).alias("n"),
        F.coalesce(
            F.sum(
                F.when(F.col("tag") == "block", F.expr("g * (g - 1) DIV 2"))
            ).cast("long"),
            F.lit(0),
        ).alias("cand_pairs"),
        F.coalesce(
            F.sum(F.when(F.col("tag") == "fp", F.expr("g * (g - 1) DIV 2"))).cast("long"),
            F.lit(0),
        ).alias("truth_pairs"),
        F.coalesce(
            F.sum(F.when(F.col("tag") == "both", F.expr("g * (g - 1) DIV 2"))).cast("long"),
            F.lit(0),
        ).alias("hit_pairs"),
    )
    return out.select(
        "n",
        "cand_pairs",
        "truth_pairs",
        "hit_pairs",
        F.when(F.col("n") < 2, F.lit(0.0))
        .otherwise(
            1.0
            - F.col("cand_pairs").cast("double")
            / F.expr("CAST(n * (n - 1) DIV 2 AS DOUBLE)")
        )
        .alias("reduction_ratio"),
        F.when(F.col("truth_pairs") == 0, F.lit(1.0))
        .otherwise(F.col("hit_pairs").cast("double") / F.col("truth_pairs").cast("double"))
        .alias("pair_completeness"),
    )
