"""Round 4 additions, part 36: two-level tree growth and successive
halving.

- ``tree_split_two_level`` — one level deeper than
  ``tree_split_histogram``: the root's best Gini split is chosen from the
  9-threshold class histogram, the corpus is partitioned by that split,
  and each child picks ITS best threshold from its own conditional
  histogram — the compounding-decision structure of real tree growth
  (level 2 depends on level 1's argmax), unrolled declaratively like
  bpe_train_rounds.  Histograms are map-side conditional aggregates over
  a literal threshold explode; purity = (pos^2 + neg^2)/n per side in
  exact BIGINTs with two fixed IEEE divisions; the root argmax is a
  1-row broadcast that tags the level-1 scan.  Output: one row per node
  (root / left / right) with its chosen split and histogram.

- ``successive_halving_eval`` — the AutoML tournament shape: 8 candidate
  quality thresholds evaluated on a 1/4 hash-slice of the corpus, the
  best 4 re-evaluated on 1/2, the best 2 on the full corpus — compute
  concentrates on surviving configs exactly like hyperparameter
  successive halving.  The metric (distance of kept-document rate from
  500 permille) is exact integer arithmetic; per-round ranks come from
  the 8x8 config micro-table theta join (the user_growth_curve class),
  so survivor selection is deterministic with threshold tiebreaks.
  Output: every (round, config) evaluation with its slice accounting and
  survival flag — 8 + 4 + 2 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import events_tbl, tbl

# ---------------------------------------------------------------------------
# tree_split_two_level
# ---------------------------------------------------------------------------

_T2_THRESHOLDS = tuple(range(10, 100, 10))
_T2_LIST = list(_T2_THRESHOLDS)

_PURITY_SQL = """
(CASE WHEN n_left = 0 THEN 0.0
      ELSE CAST(pos_left * pos_left
                + (n_left - pos_left) * (n_left - pos_left) AS DOUBLE) / n_left END)
+ (CASE WHEN n_right = 0 THEN 0.0
        ELSE CAST(pos_right * pos_right
                  + (n_right - pos_right) * (n_right - pos_right) AS DOUBLE) / n_right END)
"""

_T2_ORACLE = f"""
WITH ev AS (
  SELECT value, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL
),
hist0 AS (
  SELECT t.t AS threshold,
         CAST(COUNT(*) FILTER (WHERE value < t.t) AS BIGINT) AS n_left,
         CAST(COUNT(*) FILTER (WHERE value < t.t AND y = 1) AS BIGINT) AS pos_left,
         CAST(COUNT(*) FILTER (WHERE value >= t.t) AS BIGINT) AS n_right,
         CAST(COUNT(*) FILTER (WHERE value >= t.t AND y = 1) AS BIGINT) AS pos_right
  FROM ev CROSS JOIN (SELECT UNNEST({_T2_LIST!r}) AS t) t
  GROUP BY t.t
),
scored0 AS (SELECT *, {_PURITY_SQL} AS purity FROM hist0),
best0 AS (SELECT threshold AS t0 FROM scored0 ORDER BY purity DESC, threshold LIMIT 1),
sides AS (
  SELECT CASE WHEN e.value < b.t0 THEN 'left' ELSE 'right' END AS node, e.value, e.y
  FROM ev e CROSS JOIN best0 b
),
hist1 AS (
  SELECT s.node, t.t AS threshold,
         CAST(COUNT(*) FILTER (WHERE s.value < t.t) AS BIGINT) AS n_left,
         CAST(COUNT(*) FILTER (WHERE s.value < t.t AND s.y = 1) AS BIGINT) AS pos_left,
         CAST(COUNT(*) FILTER (WHERE s.value >= t.t) AS BIGINT) AS n_right,
         CAST(COUNT(*) FILTER (WHERE s.value >= t.t AND s.y = 1) AS BIGINT) AS pos_right
  FROM sides s CROSS JOIN (SELECT UNNEST({_T2_LIST!r}) AS t) t
  GROUP BY s.node, t.t
),
scored1 AS (SELECT *, {_PURITY_SQL} AS purity FROM hist1),
best1 AS (
  SELECT node, threshold, n_left, pos_left, n_right, pos_right, purity
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY node
                                     ORDER BY purity DESC, threshold) AS r
        FROM scored1) WHERE r = 1
)
SELECT 'root' AS node, s.threshold, s.n_left, s.pos_left, s.n_right, s.pos_right, s.purity
FROM scored0 s JOIN best0 b ON s.threshold = b.t0
UNION ALL
SELECT node, threshold, n_left, pos_left, n_right, pos_right, purity FROM best1
"""


@register(
    "tree_split_two_level",
    oracle=_T2_ORACLE,
    description="Two-level greedy tree growth: root Gini split from the "
    "9-threshold class histogram, corpus partitioned by the root argmax "
    "(1-row broadcast), each child picks its own best threshold from its "
    "conditional histogram — compounding decisions unrolled declaratively; "
    "exact-BIGINT purity with fixed IEEE divisions; one row per node",
    tags=("analytics", "ml", "extension"),
)
def tree_split_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select(
            "value",
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        )
    )
    thresholds = F.explode(F.array(*[F.lit(t) for t in _T2_THRESHOLDS])).alias("threshold")

    def hist(df: DataFrame, keys: list[str]) -> DataFrame:
        e = df.select(*(c for c in df.columns), thresholds)
        return e.groupBy(*keys, "threshold").agg(
            F.sum(F.when(F.col("value") < F.col("threshold"), 1).otherwise(0))
            .cast("long")
            .alias("n_left"),
            F.sum(F.when((F.col("value") < F.col("threshold")) & (F.col("y") == 1), 1).otherwise(0))
            .cast("long")
            .alias("pos_left"),
            F.sum(F.when(F.col("value") >= F.col("threshold"), 1).otherwise(0))
            .cast("long")
            .alias("n_right"),
            F.sum(
                F.when((F.col("value") >= F.col("threshold")) & (F.col("y") == 1), 1).otherwise(0)
            )
            .cast("long")
            .alias("pos_right"),
        )

    purity = F.expr(_PURITY_SQL.replace("\n", " "))
    scored0 = hist(ev, []).withColumn("purity", purity)
    best0 = (
        scored0.orderBy(F.col("purity").desc(), "threshold")
        .limit(1)
        .select(F.col("threshold").alias("t0"))
    )
    root = (
        scored0.join(F.broadcast(best0), scored0.threshold == F.col("t0"))
        .select(
            F.lit("root").alias("node"),
            "threshold",
            "n_left",
            "pos_left",
            "n_right",
            "pos_right",
            "purity",
        )
    )
    sides = ev.crossJoin(F.broadcast(best0)).select(
        F.when(F.col("value") < F.col("t0"), "left").otherwise("right").alias("node"),
        "value",
        "y",
    )
    scored1 = hist(sides, ["node"]).withColumn("purity", purity)
    # per-child argmax over the 9-row micro table: rank = 1 + #better
    a = scored1.alias("a")
    b = scored1.alias("b")
    better = (
        a.join(
            F.broadcast(b),
            (F.col("b.node") == F.col("a.node"))
            & (
                (F.col("b.purity") > F.col("a.purity"))
                | (
                    (F.col("b.purity") == F.col("a.purity"))
                    & (F.col("b.threshold") < F.col("a.threshold"))
                )
            ),
            "left",
        )
        .groupBy(
            F.col("a.node").alias("node"),
            F.col("a.threshold").alias("threshold"),
            F.col("a.n_left").alias("n_left"),
            F.col("a.pos_left").alias("pos_left"),
            F.col("a.n_right").alias("n_right"),
            F.col("a.pos_right").alias("pos_right"),
            F.col("a.purity").alias("purity"),
        )
        .agg(F.count(F.col("b.node")).alias("n_better"))
    )
    best1 = better.filter(F.col("n_better") == 0).drop("n_better")
    return root.unionByName(best1)


# ---------------------------------------------------------------------------
# successive_halving_eval
# ---------------------------------------------------------------------------

_SH_CONFIGS = (60, 90, 120, 150, 180, 220, 260, 300)  # n_chars thresholds
_SH_ROUNDS = ((0, 4, 4), (1, 2, 2), (2, 1, 1))  # (round, hash_mod, keep_next_pow)
# round r evaluates on docs with h60 % mod == 0; keep counts: 4, 2, 1


def _sh_oracle() -> str:
    h = h60_duck("'sh|' || CAST(doc_id AS VARCHAR)")
    rounds_sql = []
    prev = None
    for rnd, mod, keep in ((0, 4, 4), (1, 2, 2), (2, 1, 1)):
        src = f"(SELECT UNNEST({list(_SH_CONFIGS)!r}) AS t)" if prev is None else prev
        rounds_sql.append(
            f"""
r{rnd} AS (
  SELECT CAST({rnd} AS BIGINT) AS round, c.t AS threshold,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(*) FILTER (WHERE d.n_chars >= c.t) AS BIGINT) AS kept
  FROM {src} c
  CROSS JOIN (SELECT doc_id, n_chars FROM documents
              WHERE text IS NOT NULL AND ({h}) % {mod} = 0) d
  GROUP BY c.t
),
s{rnd} AS (
  SELECT *,
         CAST(kept * 1000 // GREATEST(n_docs, 1) AS BIGINT) AS kept_permille,
         ABS(kept * 1000 // GREATEST(n_docs, 1) - 500) AS dist
  FROM r{rnd}
),
k{rnd} AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY dist, threshold) <= {keep} AS survived
  FROM s{rnd}
)"""
        )
        prev = f"(SELECT threshold AS t FROM k{rnd} WHERE survived)"
    body = ",\n".join(rounds_sql)
    return f"""
WITH {body}
SELECT round, threshold, n_docs, kept, kept_permille, survived FROM k0
UNION ALL
SELECT round, threshold, n_docs, kept, kept_permille, survived FROM k1
UNION ALL
SELECT round, threshold, n_docs, kept, kept_permille, survived FROM k2
"""


@register(
    "successive_halving_eval",
    oracle=_sh_oracle(),
    description=f"Successive-halving config tournament: {len(_SH_CONFIGS)} "
    "quality thresholds on a 1/4 hash-slice, best 4 on 1/2, best 2 on the "
    "full corpus — compute concentrates on survivors; exact integer "
    "kept-permille metric, per-round ranks from the config micro-table "
    "theta join with threshold tiebreaks; emits every (round, config) "
    "evaluation with survival flags",
    tags=("llm-pipeline", "evaluation", "sampling", "extension"),
)
def successive_halving_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = h60_spark("'sh|' || CAST(doc_id AS STRING)")
    docs = (
        tbl(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "n_chars", F.expr(f"({h}) % 4").alias("h4"), F.expr(f"({h}) % 2").alias("h2"))
    )
    out = None
    survivors = [F.lit(t) for t in _SH_CONFIGS]
    for rnd, mod, keep in _SH_ROUNDS:
        slice_df = docs if mod == 1 else docs.filter(F.col(f"h{mod}") == 0)
        cfg = slice_df.select(
            "n_chars", F.explode(F.array(*survivors)).alias("threshold")
        )
        r = cfg.groupBy("threshold").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("n_chars") >= F.col("threshold"), 1).otherwise(0))
            .cast("long")
            .alias("kept"),
        )
        s = r.select(
            F.lit(rnd).cast("long").alias("round"),
            "threshold",
            "n_docs",
            "kept",
            F.expr("CAST(kept * 1000 DIV GREATEST(n_docs, 1) AS BIGINT)").alias(
                "kept_permille"
            ),
            F.expr("ABS(kept * 1000 DIV GREATEST(n_docs, 1) - 500)").alias("dist"),
        )
        # rank over the <=8-row config micro-table: rank = 1 + #better
        a = s.alias("a")
        b = s.alias("b")
        ranked = (
            a.join(
                F.broadcast(b),
                (F.col("b.dist") < F.col("a.dist"))
                | (
                    (F.col("b.dist") == F.col("a.dist"))
                    & (F.col("b.threshold") < F.col("a.threshold"))
                ),
                "left",
            )
            .groupBy(
                F.col("a.round").alias("round"),
                F.col("a.threshold").alias("threshold"),
                F.col("a.n_docs").alias("n_docs"),
                F.col("a.kept").alias("kept"),
                F.col("a.kept_permille").alias("kept_permille"),
            )
            .agg((F.count(F.col("b.threshold")) < keep).alias("survived"))
        )
        # metadata-scale driver step (the kmeans_lloyd_rounds shape): the
        # <=4 surviving thresholds become the next round's literal configs
        surv_rows = ranked.filter(F.col("survived")).select("threshold").collect()
        survivors = [
            F.lit(int(x["threshold"]))
            for x in sorted(surv_rows, key=lambda r0: r0["threshold"])
        ]
        out = ranked if out is None else out.unionByName(ranked)
    return out
