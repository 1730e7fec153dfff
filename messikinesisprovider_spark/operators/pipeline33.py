"""Round 4 additions, part 8: sparse TF-IDF pair similarity, pass@k
evaluation, storage-encoding audit.

- ``tfidf_topk_pairs`` — the SPARSE document-similarity join (the lexical
  twin of the embedding kNN graph): tf-idf weighted terms through an
  inverted index, candidate pairs generated per posting list (term
  self-join, da < db), exact integer dot products (scaled-integer idf, so
  Σ wa·wb is BIGINT-exact), cosine from per-doc norms, global top-50 via
  TakeOrderedAndProject. The posting-list quadratic is bounded by a
  deterministic df cap (terms in more than min(N/10, 512) docs are
  stop-terms and dropped — the standard sparse-join guard; at 100 TB the
  cap is what keeps the hottest term from producing an O(N²) reducer).

- ``eval_pass_at_k`` — the unbiased pass@k estimator used for code/LLM
  evals (Chen et al. 2021): per task, n attempts with deterministic
  hash-derived successes; pass@k = 1 - C(n-c, k)/C(n, k). The 11 possible
  values per k (n = 10, c = 0..10) are computed EXACTLY as rationals in
  Python, rounded to scale-9 decimals, and embedded as CASE literals in
  both engines — the estimator is pure decimal arithmetic, no floats
  until the final per-source mean division.

- ``encoding_runlength_audit`` — the storage-layout twin of
  ``data_skipping_minmax_audit``: per day-partition, how RLE- and
  dictionary-encodable the event stream is when sorted by (ts, event_id) —
  run count / average run length of event_type (lag window PARTITIONED by
  day, never global) and the distinct-value ratio. The measured statistic
  that decides whether sorting a column before write pays for itself in
  parquet encoding.
"""

from __future__ import annotations

from fractions import Fraction
from math import comb

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import events_tbl, tbl
from .retrieval3 import _TOKS_DUCK, _TOKS_SPARK

# ---------------------------------------------------------------------------
# tfidf_topk_pairs
# ---------------------------------------------------------------------------

_PAIR_TOPK = 50
_DF_CAP_ABS = 512  # absolute posting-length cap (with the N/10 relative cap)

_TFIDF_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents WHERE text IS NOT NULL
),
n AS (SELECT COUNT(*) AS n_docs FROM docs),
tf AS (
  SELECT doc_id, t, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(toks) AS t FROM docs)
  GROUP BY 1, 2
),
dfc AS (
  SELECT t, COUNT(*) AS df FROM tf GROUP BY 1
),
kept AS (
  SELECT dfc.t, dfc.df FROM dfc CROSS JOIN n
  WHERE dfc.df <= LEAST(n.n_docs // 10, {_DF_CAP_ABS})
),
w AS (
  SELECT tf.doc_id, tf.t,
         CAST(tf.tf * ((n.n_docs * 1000) // kept.df) AS BIGINT) AS w
  FROM tf JOIN kept ON kept.t = tf.t CROSS JOIN n
),
nrm AS (
  SELECT doc_id, sqrt(CAST(SUM(w * w) AS DOUBLE)) AS nrm FROM w GROUP BY 1
),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.w * b.w) AS dot
  FROM w a JOIN w b ON a.t = b.t AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(ROUND(CAST(dot AS DOUBLE) / (na.nrm * nb.nrm), 6) AS DOUBLE) AS cos_sim
FROM dots
JOIN nrm na ON na.doc_id = doc_a
JOIN nrm nb ON nb.doc_id = doc_b
ORDER BY cos_sim DESC, doc_a, doc_b
LIMIT {_PAIR_TOPK}
"""


@register(
    "tfidf_topk_pairs",
    oracle=_TFIDF_ORACLE,
    description=f"Sparse TF-IDF document-pair cosine top-{_PAIR_TOPK} via an "
    "inverted index: scaled-integer idf (exact BIGINT dot products), "
    f"deterministic df cap min(N/10, {_DF_CAP_ABS}) bounding the "
    "posting-list quadratic, TakeOrdered final top-k",
    tags=("similarity", "text", "retrieval", "extension"),
)
def tfidf_topk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse pair-similarity join (see module doc). All weights are
    integers so the dot products are exact; the only doubles are the two
    norms and the final quotient — the shared-IEEE-tree convention."""
    docs = (
        tbl(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.expr(_TOKS_SPARK).alias("toks"))
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tf = (
        docs.select("doc_id", F.explode("toks").alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfc = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    kept = dfc.crossJoin(F.broadcast(n)).filter(
        F.col("df") <= F.least(F.expr(f"n_docs div 10"), F.lit(_DF_CAP_ABS))
    )
    w = (
        tf.join(kept.select("t", "df"), "t")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "t",
            (F.col("tf") * F.expr("(n_docs * 1000) div df")).cast("long").alias("w"),
        )
    )
    nrm = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w")).cast("double")).alias("nrm")
    )
    a = w.select(F.col("doc_id").alias("doc_a"), "t", F.col("w").alias("wa"))
    b = w.select(F.col("doc_id").alias("doc_b"), "t", F.col("w").alias("wb"))
    dots = (
        a.join(b, "t")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = nrm.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = nrm.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr("CAST(ROUND(CAST(dot AS DOUBLE) / (na * nb), 6) AS DOUBLE)").alias(
                "cos_sim"
            ),
        )
        .orderBy(F.col("cos_sim").desc(), "doc_a", "doc_b")
        .limit(_PAIR_TOPK)
    )


# ---------------------------------------------------------------------------
# eval_pass_at_k
# ---------------------------------------------------------------------------

_N_ATTEMPTS = 10
_PASS_KS = (1, 5)
_SUCCESS_MOD = 4  # ~25% per-attempt success rate


def _pass_table(k: int) -> list[str]:
    """Exact pass@k values for n = _N_ATTEMPTS, c = 0.._N_ATTEMPTS, as
    scale-9 decimal strings (rounded from exact rationals in Python)."""
    vals = []
    for c in range(_N_ATTEMPTS + 1):
        frac = 1 - Fraction(comb(_N_ATTEMPTS - c, k), comb(_N_ATTEMPTS, k))
        vals.append(f"{float(round(frac, 9)):.9f}" if frac.denominator != 1 else f"{int(frac)}.000000000")
    return vals


def _pass_case(c_col: str, k: int) -> str:
    whens = " ".join(
        f"WHEN {c_col} = {c} THEN CAST('{v}' AS DECIMAL(10,9))"
        for c, v in enumerate(_pass_table(k))
    )
    return f"CASE {whens} END"


def _pass_oracle() -> str:
    succ = h60_duck("CAST(doc_id AS VARCHAR) || '|' || CAST(a.i AS VARCHAR)") + f" % {_SUCCESS_MOD} = 0"
    cases = ", ".join(
        f"CAST(SUM({_pass_case('c', k)}) AS DOUBLE) / COUNT(*) AS mean_pass_at_{k}"
        for k in _PASS_KS
    )
    return f"""
WITH tasks AS (
  SELECT COALESCE(source, '') AS source, doc_id,
         SUM(CASE WHEN {succ} THEN 1 ELSE 0 END) AS c
  FROM documents CROSS JOIN (SELECT UNNEST(range(0, {_N_ATTEMPTS})) AS i) a
  GROUP BY 1, 2
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tasks, {cases}
FROM tasks GROUP BY 1
"""


@register(
    "eval_pass_at_k",
    oracle=_pass_oracle(),
    description=f"Unbiased pass@k estimator (Chen et al. 2021) over "
    f"{_N_ATTEMPTS} hash-derived attempts per task: pass@k = "
    "1 - C(n-c,k)/C(n,k) with the 11 possible values per k embedded as "
    "exact scale-9 decimal CASE literals; per-source means",
    tags=("evaluation", "llm", "statistics", "extension"),
)
def eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    succ = F.expr(
        h60_spark(f"CAST(doc_id AS STRING) || '|' || CAST(i AS STRING)")
        + f" % {_SUCCESS_MOD} = 0"
    )
    tasks = (
        tbl(spark, sf_dir, "documents")
        .select(
            F.coalesce(F.col("source"), F.lit("")).alias("source"),
            "doc_id",
            F.explode(F.expr(f"sequence(0, {_N_ATTEMPTS - 1})")).alias("i"),
        )
        .groupBy("source", "doc_id")
        .agg(F.sum(F.when(succ, 1).otherwise(0)).alias("c"))
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_tasks")] + [
        (F.sum(F.expr(_pass_case("c", k))).cast("double") / F.count(F.lit(1))).alias(
            f"mean_pass_at_{k}"
        )
        for k in _PASS_KS
    ]
    return tasks.groupBy("source").agg(*aggs)


# ---------------------------------------------------------------------------
# encoding_runlength_audit
# ---------------------------------------------------------------------------

_RLE_ORACLE = """
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day, ts, event_id, event_type
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
),
runs AS (
  SELECT day, event_type,
         CASE WHEN event_type IS DISTINCT FROM
              LAG(event_type) OVER (PARTITION BY day ORDER BY ts, event_id)
              THEN 1 ELSE 0 END AS run_start
  FROM ev
)
SELECT CAST(day AS TIMESTAMP) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(run_start) AS BIGINT) AS n_runs,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_distinct,
       CAST((COUNT(*) * 1000) // SUM(run_start) AS BIGINT) AS runlen_permille,
       CAST((COUNT(DISTINCT event_type) * 1000) // COUNT(*) AS BIGINT) AS dict_ratio_permille
FROM runs GROUP BY 1
"""


@register(
    "encoding_runlength_audit",
    oracle=_RLE_ORACLE,
    description="Storage-encoding audit: per day-partition run count / "
    "average run length of event_type under (ts, event_id) sort order and "
    "the dictionary-encodability ratio — the measured statistic for "
    "whether sorting before write pays in RLE/dictionary encoding",
    tags=("lakeops", "storage", "audit", "extension"),
)
def encoding_runlength_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .select(F.col("ts").cast("date").alias("day"), "ts", "event_id", "event_type")
    )
    w = W.partitionBy("day").orderBy("ts", "event_id")
    runs = ev.withColumn(
        "run_start",
        F.when(
            ~F.col("event_type").eqNullSafe(F.lag("event_type").over(w)), 1
        ).otherwise(0),
    )
    return runs.groupBy(F.col("day").cast("timestamp").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("run_start").cast("long").alias("n_runs"),
        F.count_distinct("event_type").cast("long").alias("n_distinct"),
        F.expr("CAST((COUNT(*) * 1000) div SUM(run_start) AS BIGINT)").alias(
            "runlen_permille"
        ),
        F.expr(
            "CAST((COUNT(DISTINCT event_type) * 1000) div COUNT(*) AS BIGINT)"
        ).alias("dict_ratio_permille"),
    )
