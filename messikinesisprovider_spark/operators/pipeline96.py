"""Round 8 additions, part 6: spectral perceptual hash, DP noisy release,
Zipf tail estimation.

``image_whash_spectral_dedup`` — the SPECTRAL perceptual-hash dedup next
to ``image_ahash_dedup``'s mean threshold: a 2-D Walsh-Hadamard transform
(the ±1 integer sibling of the DCT that pHash uses — chosen precisely so
the transform is EXACT integer arithmetic and summation order cannot
matter) over the 8x8 decoded grid, 15 low-sequency AC coefficients,
median threshold, 15-bit signature. The real binary path is one
Arrow-batched mapInPandas (FIMG decode + one 15x64 integer matmul per
image); the oracle replays coefficients from ascii codes through the SAME
literal ±1 weight matrix.

``dp_noisy_count_release`` — the Laplace mechanism (Dwork et al., TCC'06)
over per-(event_type, day) counts at eps=1: seeded inverse-CDF noise
(h60 uniform, the deterministic twin of the library sampler), released
value, absolute error, and the 95% Laplace tail bound ln(20)/eps. This is
the UTILITY-AUDIT harness a team runs to pick eps — the true counts ride
along by design; a production release path would emit only noisy_count.

``token_zipf_hill`` — Hill's tail-index estimator (Hill 1975) over the
per-source token frequency ranking: alpha = k / sum_{i<=k} ln(f_i /
f_{k+1}) with k=20 (the closed synthetic vocab is ~31/source) — the measured "is this corpus Zipfian and how steep"
readout next to ``heaps_law_curve``'s vocabulary growth. Per-source top
(k+1) lists come from a window rank (never a per-group collect of the
whole vocabulary); the log-sum is the group-sorted left fold both engines
execute in rank order.

Reference parity note: the reference engine (SURVEY.md §0) has no
analytics surface; these extend the engine per the round brief.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import events_tbl, spread, tbl

_CK_MOD = 1000003

# ---------------------------------------------------------------------------
# image_whash_spectral_dedup
# ---------------------------------------------------------------------------

_GRID = 64  # 8x8 pixels, the image_ahash_dedup container contract
_WH_SIDE = 8
_WH_LOW = 4  # keep the low-sequency 4x4 block
_WH_NCOEF = _WH_LOW * _WH_LOW - 1  # minus DC -> 15


def _walsh_matrix() -> list[list[int]]:
    """8x8 Walsh matrix in SEQUENCY order (rows sorted by sign changes),
    from the natural-order Hadamard H8 = H2 (x) H2 (x) H2."""
    h = np.array([[1]])
    for _ in range(3):
        h = np.block([[h, h], [h, -h]])
    changes = [(int((np.diff(row) != 0).sum()), i) for i, row in enumerate(h)]
    order = [i for _, i in sorted(changes)]
    return [[int(v) for v in h[i]] for i in order]


def _whash_weights() -> list[list[int]]:
    """One ±1 weight row of length 64 per kept AC coefficient (u, v):
    w[8*i + j] = S[u][i] * S[v][j], coefficients ordered by (u, v)."""
    s = _walsh_matrix()
    rows = []
    for u in range(_WH_LOW):
        for v in range(_WH_LOW):
            if u == 0 and v == 0:
                continue  # DC carries the mean, aHash already covers it
            rows.append(
                [s[u][i] * s[v][j] for i in range(_WH_SIDE) for j in range(_WH_SIDE)]
            )
    return rows


_WH_W = _whash_weights()
_WH_W_DUCK = "[" + ", ".join("[" + ", ".join(str(v) for v in row) + "]" for row in _WH_W) + "]"

_WHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("whash", T.StringType(), False),
    ]
)

_WHASH_ORACLE = f"""
WITH ascii_docs AS (
  SELECT doc_id, text FROM documents
  WHERE text IS NOT NULL AND regexp_full_match(text, '[\\x20-\\x7e]*')
    AND len(text) >= {_GRID}
),
wt AS MATERIALIZED (
  -- the literal matrix unpacked ONCE into (ci, m, wv) rows; indexing it
  -- inside a per-element lambda re-built the 15x64 literal per term
  SELECT c.ci, m.m, ({_WH_W_DUCK})[c.ci + 1][m.m + 1] AS wv
  FROM UNNEST(range(0, {_WH_NCOEF})) c(ci)
  CROSS JOIN UNNEST(range(0, {_GRID})) m(m)
),
px AS MATERIALIZED (
  SELECT doc_id, t.m, ascii(substr(text, CAST(t.m + 1 AS INT), 1)) AS p
  FROM ascii_docs CROSS JOIN UNNEST(range(0, {_GRID})) t(m)
),
coef AS MATERIALIZED (
  SELECT px.doc_id, wt.ci, SUM(wt.wv * px.p) AS v
  FROM px JOIN wt ON wt.m = px.m
  GROUP BY 1, 2
),
med AS (
  SELECT doc_id, v AS m FROM (
    SELECT doc_id, v, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY v) AS rn
    FROM coef
  ) WHERE rn = {(_WH_NCOEF + 1) // 2}
),
bits AS (
  SELECT coef.doc_id,
         string_agg(CASE WHEN coef.v > med.m THEN '1' ELSE '0' END,
                    '' ORDER BY coef.ci) AS whash
  FROM coef JOIN med ON med.doc_id = coef.doc_id
  GROUP BY coef.doc_id
)
SELECT whash,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS canonical_doc,
       CAST(SUM(doc_id % {_CK_MOD}) AS BIGINT) AS member_checksum
FROM bits
GROUP BY whash
HAVING COUNT(*) > 1
"""


@register(
    "image_whash_spectral_dedup",
    oracle=_WHASH_ORACLE,
    description="Spectral perceptual-hash image dedup: 2-D Walsh-Hadamard "
    f"transform of the 8x8 decoded grid (exact ±1 integer arithmetic), "
    f"{_WH_NCOEF} low-sequency AC coefficients thresholded at their exact "
    "median, duplicate clusters with member accounting; real binary path "
    "via one mapInPandas decode+matmul stage, oracle replays the literal "
    "weight matrix from ascii codes",
    tags=("multimodal", "dedup", "spectral", "mapinpandas", "extension"),
)
def image_whash_spectral_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The transform is one 15x64 int64 matmul per image inside the Arrow
    batch (order-free because the arithmetic is integer); the only shuffle
    is the final signature groupBy. At 100 TB the signature table is the
    artifact — 15 bits here, widened by taking more coefficients."""
    from .multimodal import synthesize_image_column

    docs = (
        tbl(spark, sf_dir, "documents")
        .filter(
            F.col("text").isNotNull()
            & F.col("text").rlike(r"^[\x20-\x7e]*$")
            & (F.length("text") >= _GRID)
        )
        .select("doc_id", "text")
    )
    images = synthesize_image_column(spread(docs))
    wmat = np.asarray(_WH_W, dtype=np.int64)
    med_idx = (_WH_NCOEF - 1) // 2  # 8th smallest of 15

    def whash(batches):
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["image"]):
                px = np.frombuffer(bytes(buf)[9:], dtype=np.uint8)[:_GRID].astype(
                    np.int64
                )
                coefs = wmat @ px
                med = int(np.sort(coefs)[med_idx])
                ids.append(doc_id)
                hashes.append("".join("1" if int(c) > med else "0" for c in coefs))
            yield pd.DataFrame({"doc_id": ids, "whash": hashes})

    sigs = images.mapInPandas(whash, schema=_WHASH_SCHEMA)
    return (
        sigs.groupBy("whash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("canonical_doc"),
            F.sum(F.col("doc_id") % _CK_MOD).cast("long").alias("member_checksum"),
        )
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# dp_noisy_count_release
# ---------------------------------------------------------------------------

_DP_EPS = 1.0
_DP_T95 = "ln(20.0)"  # Laplace tail: P(|noise| > t) = exp(-eps*t) -> t95 at eps=1


def _dp_noise(u: str) -> str:
    """Inverse-CDF Laplace(1/eps) from a uniform in (0,1) — same formula
    text in both engines: -(1/eps) * sign(u-0.5) * ln(1-2*|u-0.5|)."""
    return (
        f"-(1.0/{_DP_EPS}) * CASE WHEN ({u}) >= 0.5 THEN 1.0 ELSE -1.0 END"
        f" * ln(1.0 - 2.0 * abs(({u}) - 0.5))"
    )


_DP_KEY = "CONCAT(COALESCE(event_type, '~'), ':', COALESCE(day, '~'))"  # Spark CONCAT is NULL-propagating, DuckDB's is not
_DP_U_DUCK = f"(({h60_duck(_DP_KEY)}) + 0.5) / 1152921504606846976.0"
_DP_ORACLE = f"""
WITH counts AS (
  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         CAST(COUNT(*) AS BIGINT) AS true_count
  FROM events GROUP BY 1, 2
),
noised AS (
  SELECT event_type, day, true_count,
         {_dp_noise(_DP_U_DUCK)} AS noise
  FROM counts
)
SELECT event_type, CAST(day AS TIMESTAMP) AS day,
       true_count,
       CAST(ROUND(true_count + noise, 6) AS DOUBLE) AS noisy_count,
       CAST(ROUND(abs(noise), 6) AS DOUBLE) AS abs_err,
       abs(noise) <= {_DP_T95} AS within_t95
FROM noised
"""


@register(
    "dp_noisy_count_release",
    oracle=_DP_ORACLE,
    description=f"Laplace mechanism (Dwork et al. TCC'06) at eps={_DP_EPS} "
    "over per-(event_type, day) counts: seeded inverse-CDF noise (h60 "
    "uniform), noisy release, absolute error and the ln(20)/eps 95% tail "
    "bound — the utility-vs-epsilon audit (true counts ride along BY "
    "DESIGN; a production release emits noisy_count only)",
    tags=("privacy", "differential-privacy", "extension"),
)
def dp_noisy_count_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One groupBy plus map-side noise arithmetic — nothing here grows
    with corpus scale except the count aggregation itself. The noise seed
    is the GROUP KEY hash, so re-releasing the same partition is
    idempotent (the standard replay-safety property for published stats)."""
    e = events_tbl(spark, sf_dir)
    counts = (
        e.groupBy(
            "event_type", F.col("ts").cast("date").cast("string").alias("day")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("true_count"))
    )
    u = f"(({h60_spark(_DP_KEY)}) + 0.5) / 1152921504606846976.0"
    noised = counts.withColumn("noise", F.expr(_dp_noise(u)))
    return noised.select(
        "event_type",
        F.col("day").cast("timestamp").alias("day"),
        "true_count",
        F.round(F.col("true_count") + F.col("noise"), 6)
        .cast("double")
        .alias("noisy_count"),
        F.round(F.abs("noise"), 6).cast("double").alias("abs_err"),
        (F.abs(F.col("noise")) <= F.expr(_DP_T95)).alias("within_t95"),
    )


# ---------------------------------------------------------------------------
# token_zipf_hill
# ---------------------------------------------------------------------------

_HILL_K = 20  # the synthetic corpus has a ~31-token closed vocab per source


_HILL_ORACLE = f"""
WITH words AS (
  SELECT source, UNNEST(str_split(text, ' ')) AS token FROM documents
  WHERE text IS NOT NULL
),
counts AS (
  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS n
  FROM words WHERE token <> '' GROUP BY 1, 2
),
ranked AS (
  SELECT source, n,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, token) AS rk
  FROM counts
),
topk AS (SELECT source, n, rk FROM ranked WHERE rk <= {_HILL_K + 1}),
tail AS (SELECT source, n AS f_tail FROM topk WHERE rk = {_HILL_K + 1}),
logsum AS (
  SELECT t.source,
         list_sum(list_transform(list(ln(t.n * 1.0 / x.f_tail) ORDER BY t.rk),
                                 v -> v)) AS s,
         CAST(COUNT(*) AS BIGINT) AS k_used
  FROM topk t JOIN tail x ON x.source = t.source
  WHERE t.rk <= {_HILL_K}
  GROUP BY 1
)
SELECT l.source, l.k_used, x.f_tail,
       CAST(CASE WHEN l.s > 0 THEN ROUND(l.k_used / l.s, 6) END AS DOUBLE)
         AS alpha_hill
FROM logsum l JOIN tail x ON x.source = l.source
ORDER BY l.source
"""


@register(
    "token_zipf_hill",
    oracle=_HILL_ORACLE,
    description=f"Hill tail-index estimator (Hill 1975) of the per-source "
    f"token frequency distribution: alpha = k / sum ln(f_i/f_(k+1)) over "
    f"the top k={_HILL_K} tokens (deterministic count-desc/token rank) — "
    "the 'how Zipfian is this corpus' readout next to heaps_law_curve; "
    "log-sum is the rank-ordered left fold in both engines",
    tags=("text", "statistics", "extension"),
)
def token_zipf_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-(k+1) per source comes from a window rank over the frequency
    table (shuffle by source, never a per-group collect of the whole
    vocabulary); the estimator folds 50 logs per source in rank order."""
    from pyspark.sql import Window

    d = tbl(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    words = d.select("source", F.explode(F.split("text", " ")).alias("token"))
    counts = (
        words.filter(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("n"), F.asc("token"))
    topk = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _HILL_K + 1)
        .select("source", "n", "rk")
    )
    tail = topk.filter(F.col("rk") == _HILL_K + 1).select(
        "source", F.col("n").alias("f_tail")
    )
    head = topk.filter(F.col("rk") <= _HILL_K).join(tail, "source")
    logsum = head.groupBy("source").agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(rk, "
            "ln(n / CAST(f_tail AS DOUBLE)) AS lr))), s -> s.lr), "
            "0D, (acc, x) -> acc + x)"
        ).alias("s"),
        F.count(F.lit(1)).cast("long").alias("k_used"),
    )
    return (
        logsum.join(tail, "source")
        .select(
            "source",
            "k_used",
            "f_tail",
            # a flat top-k (every f_i == f_tail, the hot-token skew shape)
            # zeroes the log-sum: alpha is undefined, not a DIVIDE_BY_ZERO
            F.when(F.col("s") > 0, F.round(F.col("k_used") / F.col("s"), 6))
            .cast("double")
            .alias("alpha_hill"),
        )
        .orderBy("source")
    )
