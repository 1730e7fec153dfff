"""Round 4 additions: deletion compliance, feature scaling, windowed
collocations.

- ``gdpr_delete_propagation`` — the right-to-be-forgotten pipeline: a
  deterministic hash-selected forget-set of customers cascades through the
  foreign-key graph (customer -> orders -> lineitem), and the output is the
  per-table audit report a deletion job must produce (rows purged, rows
  retained, purged-key checksum). Flags are computed with one equi-join per
  child table (the forget-set is ~2% of a dimension — a shuffled semi-join
  shape, NOT a broadcast, since at 100 TB the set is large); each table is
  scanned once and reduced with one conditional aggregate.

- ``embedding_standardize`` — per-dimension standardization statistics
  (the feature-scaling step before any distance-based model): posexplode
  to (dim, x), exact DECIMAL moment sums (order-independent under shuffle
  aggregation), mean/std from one shared IEEE double tree. 64 output rows
  regardless of corpus size; one map-side-combined shuffle on dim.

- ``cooccur_window_pmi`` — word2vec-style windowed co-occurrence (±2
  skip-grams, unordered canonical pairs) ranked by the integer PMI lift
  1000·N·c(ab) div (c(a)·c(b)) — the windowed generalization of
  ``token_pmi_bigrams`` (adjacent-only). Pair generation is a per-row
  array transform (map-side, no join); marginals count pair slots so the
  estimator is consistent for pairs and singles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import tbl
from .retrieval3 import _TOKS_DUCK, _TOKS_SPARK

# ---------------------------------------------------------------------------
# gdpr_delete_propagation
# ---------------------------------------------------------------------------

_FORGET_DEN = 50  # forget-set = hash-lowest 1/50th (~2%) of customers
_FORGET_THRESH = (1 << 60) // _FORGET_DEN

_GDPR_ORACLE = f"""
WITH forget AS (
  SELECT c_custkey FROM customer
  WHERE {h60_duck('CAST(c_custkey AS VARCHAR)')} < {_FORGET_THRESH}
),
o AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN f.c_custkey IS NOT NULL THEN 1 ELSE 0 END AS purged
  FROM orders LEFT JOIN forget f ON f.c_custkey = orders.o_custkey
),
l AS (
  SELECT l_orderkey,
         CASE WHEN po.o_orderkey IS NOT NULL THEN 1 ELSE 0 END AS purged
  FROM lineitem
  LEFT JOIN (SELECT o_orderkey FROM o WHERE purged = 1) po
    ON po.o_orderkey = lineitem.l_orderkey
)
SELECT 'customer' AS table_name,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN {h60_duck('CAST(c_custkey AS VARCHAR)')} < {_FORGET_THRESH}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
       CAST(SUM(CASE WHEN {h60_duck('CAST(c_custkey AS VARCHAR)')} < {_FORGET_THRESH}
                THEN 0 ELSE 1 END) AS BIGINT) AS n_retained,
       CAST(COALESCE(SUM(CASE WHEN {h60_duck('CAST(c_custkey AS VARCHAR)')} < {_FORGET_THRESH}
                THEN c_custkey ELSE 0 END), 0) AS BIGINT) AS purged_key_checksum
FROM customer
UNION ALL
SELECT 'orders', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(purged) AS BIGINT), CAST(COUNT(*) - SUM(purged) AS BIGINT),
       CAST(COALESCE(SUM(CASE WHEN purged = 1 THEN o_orderkey ELSE 0 END), 0) AS BIGINT)
FROM o
UNION ALL
SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(purged) AS BIGINT), CAST(COUNT(*) - SUM(purged) AS BIGINT),
       CAST(COALESCE(SUM(CASE WHEN purged = 1 THEN l_orderkey ELSE 0 END), 0) AS BIGINT)
FROM l
"""


@register(
    "gdpr_delete_propagation",
    oracle=_GDPR_ORACLE,
    description=f"Right-to-be-forgotten cascade: hash-selected 1/{_FORGET_DEN} "
    "of customers propagated through orders and lineitem; per-table purge "
    "audit (totals, purged, retained, purged-key checksum)",
    tags=("lakeops", "compliance", "join", "extension"),
)
def gdpr_delete_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion cascade audit (see module doc). The forget-set membership is
    a pure function of the key (portable hash threshold — the sampling3
    convention), so the purge is reproducible across runs and engines."""
    cust = tbl(spark, sf_dir, "customer")
    is_forgotten = F.expr(h60_spark("CAST(c_custkey AS STRING)")) < F.lit(_FORGET_THRESH)
    forget = cust.filter(is_forgotten).select("c_custkey")

    def report(name: str, df: DataFrame, purged_col, key_col) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum(F.when(purged_col, 1).otherwise(0)).cast("long").alias("n_purged"),
            F.sum(F.when(purged_col, 0).otherwise(1)).cast("long").alias("n_retained"),
            F.coalesce(F.sum(F.when(purged_col, key_col).otherwise(F.lit(0))), F.lit(0))
            .cast("long")
            .alias("purged_key_checksum"),
        )

    c_rep = report("customer", cust, is_forgotten, F.col("c_custkey"))
    orders = tbl(spark, sf_dir, "orders").join(
        forget.withColumnRenamed("c_custkey", "o_custkey").withColumn("f", F.lit(1)),
        "o_custkey",
        "left",
    )
    o_rep = report("orders", orders, F.col("f").isNotNull(), F.col("o_orderkey"))
    purged_orders = orders.filter(F.col("f").isNotNull()).select("o_orderkey")
    li = tbl(spark, sf_dir, "lineitem").join(
        purged_orders.withColumnRenamed("o_orderkey", "l_orderkey").withColumn(
            "g", F.lit(1)
        ),
        "l_orderkey",
        "left",
    )
    l_rep = report("lineitem", li, F.col("g").isNotNull(), F.col("l_orderkey"))
    return c_rep.unionByName(o_rep).unionByName(l_rep)


# ---------------------------------------------------------------------------
# embedding_standardize
# ---------------------------------------------------------------------------

_DIMS = 64

_STD_ORACLE = f"""
WITH vals AS (
  SELECT p.dim AS dim, p.x AS x FROM (
    SELECT UNNEST(list_transform(range(0, {_DIMS}),
                  i -> {{'dim': i, 'x': embedding[i + 1]::DOUBLE}})) AS p
    FROM embeddings
    WHERE embedding IS NOT NULL AND len(embedding) = {_DIMS}
  )
),
m AS (
  SELECT dim, COUNT(*) AS n,
         SUM(CAST(x AS DECIMAL(27,6))) AS sx,
         SUM(CAST(x * x AS DECIMAL(27,6))) AS sxx
  FROM vals GROUP BY dim
)
SELECT CAST(dim AS BIGINT) AS dim, CAST(n AS BIGINT) AS n_vals,
       CAST(sx AS DOUBLE) / n AS mean,
       sqrt(greatest(CAST(sxx AS DOUBLE) / n
            - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n), 0)) AS stddev
FROM m
"""


@register(
    "embedding_standardize",
    oracle=_STD_ORACLE,
    description=f"Per-dimension standardization stats over the {_DIMS}-dim "
    "embeddings (DECIMAL(27,6)-quantized moment sums — the registry convention; scale 12 hits cross-engine double->decimal rounding ties — one shared double tree for "
    "mean/std) — the feature-scaling reduce; 64 rows at any corpus size",
    tags=("embedding", "features", "agg", "extension"),
)
def embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        tbl(spark, sf_dir, "embeddings")
        .where(F.col("embedding").isNotNull() & (F.size("embedding") == _DIMS))
        .select(F.posexplode(F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")).alias("dim", "x"))
    )
    m = e.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(27,6)")).alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(27,6)")).alias("sxx"),
    )
    mean = F.col("sx").cast("double") / F.col("n")
    var = F.col("sxx").cast("double") / F.col("n") - mean * mean
    return m.select(
        F.col("dim").cast("long").alias("dim"),
        F.col("n").cast("long").alias("n_vals"),
        mean.alias("mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("stddev"),
    )


# ---------------------------------------------------------------------------
# cooccur_window_pmi
# ---------------------------------------------------------------------------

_CW_WINDOW = 2
_CW_MIN_PAIR = 5
_CW_TOPK = 50

_CW_PAIRS_DUCK = f"""
  SELECT p.w1 AS w1, p.w2 AS w2 FROM (
    SELECT UNNEST(list_concat(
      list_transform(range(1, len(ts)),
        i -> {{'w1': least(ts[i], ts[i + 1]), 'w2': greatest(ts[i], ts[i + 1])}}),
      list_transform(range(1, len(ts) - 1),
        i -> {{'w1': least(ts[i], ts[i + 2]), 'w2': greatest(ts[i], ts[i + 2])}})
    )) AS p
    FROM (SELECT {_TOKS_DUCK} AS ts FROM documents WHERE text IS NOT NULL)
  )
"""

_CW_ORACLE = f"""
WITH pairs AS ({_CW_PAIRS_DUCK}),
c2 AS (
  SELECT w1, w2, COUNT(*) AS n_ab FROM pairs GROUP BY w1, w2
  HAVING COUNT(*) >= {_CW_MIN_PAIR}
),
marg AS (
  SELECT w, COUNT(*) AS n_w FROM (
    SELECT w1 AS w FROM pairs UNION ALL SELECT w2 AS w FROM pairs
  ) GROUP BY w
),
tot AS (SELECT COUNT(*) AS n_total FROM pairs)
SELECT c2.w1, c2.w2,
       CAST(n_ab AS BIGINT) AS n_ab,
       CAST(ma.n_w AS BIGINT) AS n_a,
       CAST(mb.n_w AS BIGINT) AS n_b,
       CAST((1000 * n_total * n_ab) // (ma.n_w * mb.n_w) AS BIGINT) AS pmi_lift_pm
FROM c2
JOIN marg ma ON ma.w = c2.w1
JOIN marg mb ON mb.w = c2.w2
CROSS JOIN tot
ORDER BY pmi_lift_pm DESC, c2.w1, c2.w2
LIMIT {_CW_TOPK}
"""

_CW_PAIRS_SPARK = (
    "CASE WHEN size(ts) >= 2 THEN concat("
    "transform(sequence(1, size(ts) - 1), i -> named_struct("
    "'w1', least(ts[i - 1], ts[i]), 'w2', greatest(ts[i - 1], ts[i]))), "
    "CASE WHEN size(ts) >= 3 THEN transform(sequence(1, size(ts) - 2), "
    "i -> named_struct('w1', least(ts[i - 1], ts[i + 1]), "
    "'w2', greatest(ts[i - 1], ts[i + 1]))) "
    "ELSE CAST(array() AS array<struct<w1: string, w2: string>>) END) END"
)


@register(
    "cooccur_window_pmi",
    oracle=_CW_ORACLE,
    description=f"Windowed (±{_CW_WINDOW}) co-occurrence collocations: "
    "unordered canonical token pairs ranked by integer PMI lift — the "
    "word2vec/GloVe context-matrix reduce; pair generation map-side, "
    "marginals count pair slots",
    tags=("text", "collocation", "pmi", "extension"),
)
def cooccur_window_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """±2-window skip-gram co-occurrence with PMI-lift ranking (see module
    doc). Same exactness discipline as token_pmi_bigrams: integer lift,
    full (lift, w1, w2) tiebreak, TakeOrderedAndProject top-k."""
    docs = (
        tbl(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(F.expr(_TOKS_SPARK).alias("ts"))
    )
    pairs = docs.select(F.explode(F.expr(_CW_PAIRS_SPARK)).alias("p")).select(
        F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    c2 = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _CW_MIN_PAIR)
    )
    marg = (
        pairs.select(F.col("w1").alias("w"))
        .unionAll(pairs.select(F.col("w2").alias("w")))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    tot = pairs.agg(F.count(F.lit(1)).alias("n_total"))
    out = (
        c2.join(marg.select(F.col("w").alias("w1"), F.col("n_w").alias("n_a")), "w1")
        .join(marg.select(F.col("w").alias("w2"), F.col("n_w").alias("n_b")), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.expr("CAST((1000 * n_total * n_ab) div (n_a * n_b) AS BIGINT)").alias(
                "pmi_lift_pm"
            ),
        )
    )
    return out.orderBy(F.col("pmi_lift_pm").desc(), "w1", "w2").limit(_CW_TOPK)
