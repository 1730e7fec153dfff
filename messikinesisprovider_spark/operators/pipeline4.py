"""LLM-pipeline + relational operators, round 3d.

Four more operators, all expression-only (no row UDFs) and all with
bit-exact DuckDB oracles:

- ``semdedup_cells``: SemDeDup-style semantic deduplication (Abbas et al.,
  arXiv:2303.09540): partition the embedding space into coarse cells, then
  mark in-cell near-duplicates by exact cosine, keeping the smallest id.
  The cell quantizer is the same deterministic hash-seeded construction as
  ``sim_ann_ivf_hashseed``, so the entire pipeline — seeding, assignment,
  in-cell pairing, verdicts — is oracle-exact.
- ``ngram_lm_score``: bigram language-model document scoring — the KenLM-
  perplexity-filter shape (CCNet and friends) with the log-likelihood
  computed in portable integer arithmetic (floor-log2 of the MLE count
  ratio), so Spark's shuffle aggregation and DuckDB agree bit-for-bit. A
  production deployment swaps floor-log2 for ``F.ln`` at one marked line;
  the plan shape (token explode → two count aggregations → score join) is
  unchanged.
- ``unpivot_measures``: wide→long unpivot (melt) of the four lineitem
  measures followed by a per-(flag, measure) aggregate — Spark's native
  ``DataFrame.unpivot`` (an Expand, map-side) against a UNION ALL oracle.
- ``ewma_user_value``: per-user exponentially weighted moving average of
  event values over the last K events, with exact rational weights
  ((3/4)^i scaled to integers) and decimal accumulation — the
  decay-smoothing shape used for per-entity rate estimates.

Reference parity note: the reference engine (a Kinesis-protocol streaming
provider, see SURVEY.md §0) has no analytics surface; these extend the
batch side per the round brief's training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .dedup import EMBED_COS_THRESHOLD, h60_duck, h60_spark
from .relational import events_tbl, tbl
from .retrieval3 import _TOKS_DUCK, _TOKS_SPARK
from .similarity import _unit_vectors

# ---------------------------------------------------------------------------
# semdedup_cells
# ---------------------------------------------------------------------------

N_SEM_CELLS = 16

_SEMDEDUP_ORACLE = f"""
WITH e0 AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
),
e AS (SELECT * FROM e0 WHERE nrm > 0),
cent AS (
  SELECT vec_id AS cid, v AS cv FROM e
  ORDER BY {h60_duck('CAST(vec_id AS VARCHAR)')}, vec_id LIMIT {N_SEM_CELLS}
),
assign AS (
  SELECT e.vec_id, e.v, e.nrm, cent.cid,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_sum(list_transform(range(1, 65),
                    i -> (cent.cv[i] - e.v[i]) * (cent.cv[i] - e.v[i]))), cent.cid
         ) AS rn
  FROM e CROSS JOIN cent
),
cells AS (SELECT vec_id, v, nrm, cid FROM assign WHERE rn = 1),
dups AS (
  SELECT a.vec_id, MIN(b.vec_id) AS dup_of
  FROM cells a JOIN cells b ON b.cid = a.cid AND b.vec_id < a.vec_id
  WHERE list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
        / (a.nrm * b.nrm) >= {EMBED_COS_THRESHOLD}
  GROUP BY a.vec_id
)
SELECT c.vec_id, c.cid, d.dup_of IS NOT NULL AS is_dup, d.dup_of
FROM cells c LEFT JOIN dups d ON d.vec_id = c.vec_id
"""


@register(
    "semdedup_cells",
    oracle=_SEMDEDUP_ORACLE,
    description=f"SemDeDup semantic dedup: {N_SEM_CELLS} hash-seeded cells, in-cell "
    f"cosine >= {EMBED_COS_THRESHOLD} marks dups (keep smallest id)",
    tags=("dedup", "embedding", "semdedup", "extension"),
)
def semdedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al., arXiv:2303.09540) on the hash-seeded cells.

    Scale story: the expensive pairwise cosine runs only WITHIN a cell, so
    total cost is O(sum of cell_size²) = O(n²/k) for k cells — the paper's
    point. k is a constant here for oracle determinism; at 100 TB k scales
    with the corpus (k ≈ n / target_cell_size) and assignment stays one
    broadcast-centroids codegen pass. Cells shuffle once on cid; the
    verdict join is a shuffle on vec_id. No ML stages, no driver data.
    """
    e = _unit_vectors(tbl(spark, sf_dir, "embeddings"))
    cent = (
        e.select("vec_id", "v", F.expr(h60_spark("CAST(vec_id AS STRING)")).alias("h"))
        .orderBy("h", "vec_id")
        .limit(N_SEM_CELLS)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    dist = F.expr("aggregate(zip_with(cv, v, (w, x) -> (w - x) * (w - x)), 0D, (s, d) -> s + d)")
    cells = (
        e.crossJoin(F.broadcast(cent))
        .withColumn("dist", dist)
        .withColumn("rn", F.row_number().over(W.partitionBy("vec_id").orderBy("dist", "cid")))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "nrm", "cid")
        # the assignment feeds three scans (both self-join sides + the verdict
        # join); persist it once — at warehouse scale this is the materialized
        # cell-assignment table (same precedent as the winnowing fingerprints)
        .persist()
    )
    a, b = cells.alias("a"), cells.alias("b")
    dot = F.expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D, (acc, p) -> acc + p)")
    dups = (
        a.join(b, (F.col("b.cid") == F.col("a.cid")) & (F.col("b.vec_id") < F.col("a.vec_id")))
        .filter(dot / (F.col("a.nrm") * F.col("b.nrm")) >= EMBED_COS_THRESHOLD)
        .groupBy(F.col("a.vec_id").alias("vec_id"))
        .agg(F.min("b.vec_id").alias("dup_of"))
    )
    return (
        cells.select("vec_id", "cid")
        .join(dups, "vec_id", "left")
        .select("vec_id", "cid", F.col("dup_of").isNotNull().alias("is_dup"), "dup_of")
    )


# ---------------------------------------------------------------------------
# ngram_lm_score
# ---------------------------------------------------------------------------

# keep iff avg log2 p(w2|w1) >= LM_THRESH_MILLI/1000, checked without
# division: score_log2 * 1000 >= LM_THRESH_MILLI * n_bigrams (score <= 0).
LM_THRESH_MILLI = -5500

_NGRAM_LM_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {_TOKS_DUCK} AS ts FROM documents
),
bg AS (
  SELECT doc_id, b.w1, b.w2
  FROM (SELECT doc_id, UNNEST(list_transform(range(1, len(ts)),
            i -> {{'w1': ts[i], 'w2': ts[i + 1]}})) AS b FROM docs)
),
c2 AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS c FROM bg GROUP BY w1),
scored AS (
  SELECT bg.doc_id,
         COUNT(*) AS n_bigrams,
         SUM((length(printf('%b', c2.c)) - 1)
             - (length(printf('%b', c1.c)) - 1)) AS score_log2
  FROM bg
  JOIN c2 ON c2.w1 = bg.w1 AND c2.w2 = bg.w2
  JOIN c1 ON c1.w1 = bg.w1
  GROUP BY bg.doc_id
)
SELECT doc_id, n_bigrams, CAST(score_log2 AS BIGINT) AS score_log2,
       score_log2 * 1000 >= {LM_THRESH_MILLI} * n_bigrams AS keep
FROM scored
"""


@register(
    "ngram_lm_score",
    oracle=_NGRAM_LM_ORACLE,
    description="Bigram LM document scoring (CCNet perplexity-filter shape) in "
    "portable integer floor-log2 arithmetic; keep/drop gate without division",
    tags=("text", "quality", "lm", "extension"),
)
def ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc sum over bigrams of floor(log2 c(w1,w2)) - floor(log2 c(w1·)).

    The MLE bigram log-probability log2(c(w1,w2)/c(w1·)) quantized to the
    integer floor of each log — bit-portable across engines (a production
    build swaps `length(bin(c)) - 1` for `F.ln(c)` on the two marked
    columns, identical plan). Scale: the token explode is map-side; c2/c1
    are map-side-combined count aggregations keyed by token (heavy hitters
    like 'the' are single-key counts, not joins through a hot key's rows —
    the join back to bg fans out, but AQE skew-split covers it); the final
    score is one groupBy(doc_id). No driver data, no UDFs.
    """
    docs = tbl(spark, sf_dir, "documents").select("doc_id", F.expr(_TOKS_SPARK).alias("ts"))
    # Adjacent-pair fan-out stays map-side (no window/shuffle): each doc's
    # bigram list is built in one transform over 0-based array indices.
    bg = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(ts) >= 2 THEN transform(sequence(1, size(ts) - 1), "
                "i -> named_struct('w1', ts[i - 1], 'w2', ts[i])) END"
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    # floor(log2 c) = length of the binary representation minus 1; the
    # production-LM swap point: replace both with F.ln(...) for real logprobs.
    flog2 = lambda c: F.length(F.bin(F.col(c))) - 1  # noqa: E731
    scored = (
        bg.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(flog2("c2") - flog2("c1")).cast("long").alias("score_log2"),
        )
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        "score_log2",
        (F.col("score_log2") * 1000 >= F.lit(LM_THRESH_MILLI) * F.col("n_bigrams")).alias("keep"),
    )


# ---------------------------------------------------------------------------
# unpivot_measures
# ---------------------------------------------------------------------------

_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")

_UNPIVOT_ORACLE = f"""
WITH long AS (
  {" UNION ALL ".join(
      f"SELECT l_returnflag, '{m}' AS measure, {m} AS val FROM lineitem"
      for m in _MEASURES
  )}
)
SELECT l_returnflag, measure,
       COUNT(val) AS n,
       CAST(SUM(CAST(val AS DECIMAL(18,6))) AS DOUBLE) AS total,
       CAST(CAST(SUM(CAST(val AS DECIMAL(18,6))) AS DOUBLE) / COUNT(val) AS DOUBLE) AS mean
FROM long
GROUP BY l_returnflag, measure
"""


@register(
    "unpivot_measures",
    oracle=_UNPIVOT_ORACLE,
    description="Wide-to-long unpivot (melt) of the 4 lineitem measures + per-(flag, "
    "measure) aggregate; Spark native unpivot vs UNION ALL oracle",
    tags=("relational", "unpivot", "reshape"),
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's `unpivot` compiles to an Expand (map-side row fan-out, no
    shuffle), then one hash aggregation on (flag, measure) — 8 groups ×
    4 measures stays map-side-combined at any scale. Decimal sums keep the
    doubles bit-identical across shuffle orders.
    """
    long = tbl(spark, sf_dir, "lineitem").unpivot(
        ids=["l_returnflag"], values=list(_MEASURES),
        variableColumnName="measure", valueColumnName="val",
    )
    dec = F.sum(F.col("val").cast("decimal(18,6)"))
    return long.groupBy("l_returnflag", "measure").agg(
        F.count("val").alias("n"),
        dec.cast("double").alias("total"),
        (dec.cast("double") / F.count("val")).cast("double").alias("mean"),
    )


# ---------------------------------------------------------------------------
# ewma_user_value
# ---------------------------------------------------------------------------

EWMA_K = 8
# alpha = 1/4: weight of lag i is (3/4)^i, scaled by 4^(K-1) to integers.
_EWMA_W = [3**i * 4 ** (EWMA_K - 1 - i) for i in range(EWMA_K)]

_EWMA_NUM_DUCK = " + ".join(
    f"COALESCE(CAST(LAG(value, {i}) OVER w AS DECIMAL(18,6)) * {w}, 0)"
    for i, w in enumerate(_EWMA_W)
)
_EWMA_DEN_DUCK = " + ".join(
    f"CASE WHEN LAG(value, {i}) OVER w IS NOT NULL THEN {w} ELSE 0 END"
    for i, w in enumerate(_EWMA_W)
)

_EWMA_ORACLE = f"""
SELECT event_id, user_id, ts, value,
       CAST(CASE WHEN den > 0 THEN CAST(num AS DOUBLE) / den END AS DOUBLE) AS ewma
FROM (
  SELECT event_id, user_id, ts, value,
         {_EWMA_NUM_DUCK} AS num,
         {_EWMA_DEN_DUCK} AS den
  FROM events
  WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
"""


@register(
    "ewma_user_value",
    oracle=_EWMA_ORACLE,
    description=f"Per-user EWMA (alpha=1/4) of event values over the last {EWMA_K} "
    "events — exact rational weights, decimal accumulation, one window pass",
    tags=("timeseries", "window", "ewma", "extension"),
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One partitioned window pass (shuffle on user_id only); the K lags are
    evaluated in a single WindowExec frame scan. Weights (3/4)^i are exact
    integers after scaling by 4^(K-1); the numerator accumulates in DECIMAL
    so the only float op is the final division — order-independent, hence
    bit-identical across any executor count. NULL values contribute neither
    numerator nor denominator weight (den tracks which lags exist).
    """
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.lag("value", i).over(w) for i in range(EWMA_K)]
    num = sum(
        (F.coalesce(lag.cast("decimal(18,6)") * F.lit(wt), F.lit(0).cast("decimal(18,6)"))
         for lag, wt in zip(lags, _EWMA_W)),
        F.lit(0).cast("decimal(18,6)"),
    )
    den = sum(
        (F.when(lag.isNotNull(), F.lit(wt)).otherwise(F.lit(0)) for lag, wt in zip(lags, _EWMA_W)),
        F.lit(0),
    )
    ev = events_tbl(spark, sf_dir).filter(F.col("ts").isNotNull())
    return ev.select(
        "event_id", "user_id", "ts", "value", num.alias("num"), den.alias("den")
    ).select(
        "event_id", "user_id", "ts", "value",
        F.when(F.col("den") > 0, F.col("num").cast("double") / F.col("den"))
        .cast("double")
        .alias("ewma"),
    )
