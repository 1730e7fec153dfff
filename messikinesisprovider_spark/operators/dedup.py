"""Deduplication operators over the `documents` table.

Scale design (100 TB): every variant is expressed as shuffle-on-key
DataFrame algebra — no cross joins, no driver-side collection.

- Exact dedup: one hash-groupBy on a normalized content fingerprint.
- N-gram Jaccard: shingle-explode + self-equi-join on shingle. At scale this
  is the *verifier* applied to LSH candidate pairs; run standalone only at
  small SF (the shingle join prunes to shared-shingle pairs, so it is
  |pairs-sharing-a-shingle|, not O(n²)).
- MinHash+LSH: 64 xxhash64 "permutations" → 16 bands × 4 rows → explode band
  buckets → self-join on (band, bucket). Candidate volume is controlled by
  band width, independent of corpus size; the signature estimate then filters.
- SimHash: 64-bit sign-aggregated token hashes, banded into 4×16-bit chunks
  (pigeonhole: hamming ≤ 3 ⇒ at least one exact chunk match) → join on chunk.

MinHash/SimHash hash tokens with a PORTABLE 60-bit hash (first 15 hex chars
of md5 parsed as a BIGINT — bit-identical in Spark `conv(substr(md5(x),1,15),
16,10)` and DuckDB `('0x' || substr(md5(x),1,15))::BIGINT`), so their DuckDB
oracles replicate the full pipeline — signatures, banding, candidate join,
rescoring — exactly, with no recall assumption. tests/test_extensions.py
additionally verifies recall/precision against the exact Jaccard operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import spread, tbl

# Word-3-gram shingles as a Spark SQL expression (0-based toks[i]).
# The token array is bound ONCE via a single-element transform: a naive
# version with `split(text, ' ')` inlined at each reference re-tokenizes the
# string 3× per lambda element (~180× per document — measured 7 s for 5k
# docs, vs <1 s bound).
_SHINGLES = (
    "transform(array(split(text, ' ')), toks -> "
    "CASE WHEN size(toks) >= 3 THEN "
    "transform(sequence(0, size(toks) - 3), "
    "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) "
    "ELSE array() END)[0]"
)

# Same shingling in DuckDB dialect (1-based list indexing; range(a,b) is [a,b)).
_SHINGLES_DUCK = (
    "CASE WHEN LEN(str_split(text, ' ')) >= 3 THEN "
    "list_transform(range(1, LEN(str_split(text, ' ')) - 1), "
    "i -> concat_ws(' ', str_split(text, ' ')[i], str_split(text, ' ')[i+1], str_split(text, ' ')[i+2])) "
    "ELSE [] END"
)

JACCARD_THRESHOLD = 0.2


def h60_spark(x: str) -> str:
    """Spark SQL: portable 60-bit hash — first 15 hex chars of md5 as BIGINT.

    Always non-negative (< 2^60), so modular arithmetic downstream agrees
    between Spark, numpy uint64, and DuckDB signed BIGINT."""
    return f"CAST(conv(substr(md5({x}), 1, 15), 16, 10) AS BIGINT)"


def h60_duck(x: str) -> str:
    """DuckDB twin of h60_spark — verified bit-identical cross-engine."""
    return f"('0x' || substr(md5({x}), 1, 15))::BIGINT"


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS fingerprint,
           MIN(doc_id) AS keeper_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    description="Exact dedup: normalized-content hash groupBy; keeper = min doc_id",
    tags=("dedup", "extension"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    return (
        d.select(
            F.md5(F.lower(F.trim(F.regexp_replace("text", " +", " ")))).alias("fingerprint"),
            "doc_id",
        )
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# Shingle document-frequency cap: shingles in more docs than this are
# dropped before candidate generation (skew guard — see dedup_ngram_jaccard).
# Chosen above any df reachable in the local test corpora (≤5k docs at
# sf0.1) so sf-scale parity is byte-identical to the uncapped oracle.
MAX_SHINGLE_DF = 10_000


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, UNNEST(list_distinct({_SHINGLES_DUCK})) AS g
      FROM documents
    ),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           CAST(ROUND(i.n_common * 1.0 / (ca.n + cb.n - i.n_common), 6) AS DOUBLE) AS jaccard
    FROM inter i
    JOIN counts ca ON ca.doc_id = i.doc_a
    JOIN counts cb ON cb.doc_id = i.doc_b
    WHERE i.n_common * 1.0 / (ca.n + cb.n - i.n_common) >= {JACCARD_THRESHOLD}
    """,
    description="Exact n-gram Jaccard near-dup pairs via shingle self-join",
    tags=("dedup", "jaccard", "extension"),
)
def dedup_ngram_jaccard(
    spark: SparkSession, sf_dir: str, max_shingle_df: int = MAX_SHINGLE_DF
) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    # Join on the shingle's 64-bit hash, not the string: ~2× cheaper shuffle
    # and compare. Collision probability at n distinct shingles is n²/2⁶⁵
    # (≈5e-9 even at 300k shingles) — immaterial to the exact-pair contract.
    sh_all = (
        spread(d)
        .select("doc_id", F.explode(F.array_distinct(F.expr(_SHINGLES))).alias("gs"))
        .select("doc_id", F.xxhash64("gs").alias("g"))
    )
    # Skew guard for the self-join: a stop-word-like shingle shared by k docs
    # contributes k² candidate rows, so one hot shingle at corpus scale makes
    # the join quadratic. Standard MinHash practice: drop shingles whose
    # document frequency exceeds a cap — they carry no dedup signal (any pair
    # actually similar shares plenty of rare shingles too). The hot set is
    # tiny by construction (≤ occurrences/cap), hence broadcast. Jaccard is
    # computed over the capped shingle space (numerator AND denominator), so
    # the operator stays self-consistent. The cap is far above any document
    # frequency in the test corpora, so oracle parity is unaffected there.
    hot = (
        sh_all.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_shingle_df)
        .select("g")
    )
    # No persist(): measured at sf0.1, recomputing the shingle pipeline per
    # scan (counts + both join sides) beats memory-caching it by ~0.7 s —
    # cache serialization costs more than the recompute at these sizes. At
    # warehouse scale the shingle set is materialized ONCE to storage and
    # every pass reads that table; memory persist is the wrong analog.
    sh = sh_all.join(F.broadcast(hot), "g", "left_anti")
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = counts.alias("ca")
    cb = counts.alias("cb")
    jac = F.col("n_common") * F.lit(1.0) / (F.col("ca.n") + F.col("cb.n") - F.col("n_common"))
    return (
        inter.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).cast("double").alias("jaccard"))
    )


# MinHash signature: sig[i] = min over shingles of xxhash64(shingle, i).
# Using the seed column as the "permutation" index is a standard trick: each
# (shingle, i) pair gets an independent 64-bit hash, and min-over-shingles of
# an independent hash family is exactly the MinHash estimator.
_N_HASHES = 64
_N_BANDS = 16
_ROWS_PER_BAND = _N_HASHES // _N_BANDS
MINHASH_EST_THRESHOLD = 0.2
# Band-bucket size cap (skew guard, see dedup_minhash_lsh). Far above any
# bucket the test corpora produce, so local results are unchanged.
MAX_BAND_BUCKET = 1_000


def bind1(value_sql: str, var: str, body_sql: str) -> str:
    """Evaluate `value_sql` ONCE and reference it as `var` inside `body_sql`.

    Catalyst's CollapseProject inlines projected expressions into every
    downstream reference, so an expression that reads a computed array k
    times recomputes it k times (measured 60× slowdown on MinHash banding).
    A single-element `transform` introduces a NamedLambdaVariable, which is
    evaluated once per element — i.e. exactly once — and cannot be inlined.
    """
    return f"transform(array({value_sql}), {var} -> {body_sql})[0]"


# Universal-hash family for the Arrow path: sig_i = min over shingles of
# (a_i * h + b_i) mod p, with h = xxhash64(shingle) (JVM-side) reduced mod
# 2^31. Deterministic (seeded), overflow-free in uint64.
_MERSENNE_P = (1 << 61) - 1
_H_MOD = 1 << 31


def _hash_family():
    rng = np.random.default_rng(2024)
    a = rng.integers(1, 1 << 29, size=_N_HASHES, dtype=np.uint64)
    b = rng.integers(0, 1 << 40, size=_N_HASHES, dtype=np.uint64)
    return a, b


def minhash_signatures(d: DataFrame) -> DataFrame:
    """doc_id, sig: array<bigint> of length 64, n_shingles.

    Hybrid plan for the hot path: string shingling + xxhash64 stay JVM-side
    (one hash per shingle); the 64-way universal-hash min runs in an
    Arrow-batched pandas UDF as one vectorized (n_shingles × 64) matrix op.
    A pure higher-order-function version was ~10× slower: Spark's lambda
    functions are interpreted per element, so 64 × |shingles| lambda
    evaluations per row dominate.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    a_coef, b_coef = _hash_family()

    @pandas_udf(ArrayType(LongType()))
    def sig_udf(hs: pd.Series) -> pd.Series:
        # One flattened (total_shingles x 64) matrix op per Arrow batch +
        # minimum.reduceat at doc boundaries — ~4x faster than a per-doc
        # loop (the loop pays numpy dispatch overhead per tiny matrix).
        lens = np.fromiter((len(h) for h in hs), dtype=np.int64, count=len(hs))
        if (lens == 0).any():
            # reduceat misaligns on empty segments; upstream filters
            # size(sh) > 0 so this is a never-taken safety path.
            out = []
            for h in hs:
                hv = (np.asarray(h, dtype=np.int64).astype(np.uint64)) % _H_MOD
                m = (a_coef[None, :] * hv[:, None] + b_coef[None, :]) % _MERSENNE_P
                out.append(
                    m.min(axis=0).astype(np.int64)
                    if len(hv)
                    else np.full(_N_HASHES, np.iinfo(np.int64).max, dtype=np.int64)
                )
            return pd.Series(out)
        flat = np.concatenate([np.asarray(h, dtype=np.int64) for h in hs]).astype(np.uint64) % _H_MOD
        m = (a_coef[None, :] * flat[:, None] + b_coef[None, :]) % _MERSENNE_P
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        mins = np.minimum.reduceat(m, starts, axis=0).astype(np.int64)
        return pd.Series(list(mins))

    shingled = spread(d).select(
        "doc_id", F.array_distinct(F.expr(_SHINGLES)).alias("sh")
    ).filter(F.size("sh") > 0)
    hashed = shingled.select(
        "doc_id",
        F.expr(f"transform(sh, s -> {h60_spark('s')})").alias("hs"),
        F.size("sh").alias("n_shingles"),
    )
    return hashed.select("doc_id", sig_udf("hs").alias("sig"), "n_shingles")


# The DuckDB oracle replicates the ENTIRE MinHash+LSH pipeline — portable
# 60-bit shingle hash, the seeded universal-hash family (embedded below as
# literal lists), 16×4 banding, candidate join, signature-estimated Jaccard —
# so the driver compare is exact with no banding-recall assumption. All
# arithmetic stays below 2^61 (hv < 2^31, a < 2^29), so numpy uint64 and
# DuckDB signed BIGINT agree bit-for-bit.
_A_LIST, _B_LIST = _hash_family()
_A_SQL = "[" + ",".join(str(int(x)) for x in _A_LIST) + "]"
_B_SQL = "[" + ",".join(str(int(x)) for x in _B_LIST) + "]"

_MINHASH_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, UNNEST(list_distinct({_SHINGLES_DUCK})) AS g FROM documents
),
hv AS (
  SELECT doc_id, {h60_duck('g')} % {_H_MOD} AS h FROM sh
),
idx AS (SELECT UNNEST(range(0, {_N_HASHES})) AS i),
sig AS (
  SELECT doc_id, idx.i,
         MIN((list_extract({_A_SQL}, idx.i + 1) * hv.h
              + list_extract({_B_SQL}, idx.i + 1)) % {_MERSENNE_P}) AS s
  FROM hv CROSS JOIN idx
  GROUP BY doc_id, idx.i
),
bandv AS (
  SELECT doc_id, i // {_ROWS_PER_BAND} AS band,
         string_agg(s::VARCHAR, ',' ORDER BY i) AS bucket
  FROM sig GROUP BY doc_id, i // {_ROWS_PER_BAND}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bandv a JOIN bandv b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
est AS (
  SELECT p.doc_a, p.doc_b,
         SUM(CASE WHEN sa.s = sb.s THEN 1 ELSE 0 END) * 1.0 / {_N_HASHES} AS e
  FROM pairs p
  JOIN sig sa ON sa.doc_id = p.doc_a
  JOIN sig sb ON sb.doc_id = p.doc_b AND sb.i = sa.i
  GROUP BY p.doc_a, p.doc_b
)
SELECT doc_a, doc_b, CAST(ROUND(e, 6) AS DOUBLE) AS est_jaccard
FROM est WHERE e >= {MINHASH_EST_THRESHOLD}
"""


@register(
    "dedup_minhash_lsh",
    oracle=_MINHASH_ORACLE,
    description="MinHash(64) + LSH(16 bands × 4) candidate pairs with signature-estimated Jaccard",
    tags=("dedup", "minhash", "lsh", "extension"),
)
def dedup_minhash_lsh(
    spark: SparkSession, sf_dir: str, max_bucket_size: int = MAX_BAND_BUCKET
) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    # Persist the signature table: the band self-join and the estimator both
    # read it, and without materialization each side would recompute the full
    # shingle+hash pipeline. At 100 TB this is exactly the production shape —
    # signatures are written out once and joined thereafter.
    sigs = minhash_signatures(d).persist()
    # Band bucket: the 4 signature slots joined into one string key — an
    # injective encoding (unlike a 64-bit hash of the slots, which could
    # collide) that the DuckDB oracle reproduces verbatim via string_agg.
    # Slim (3-column) band rows keep the self-join shuffle narrow; signatures
    # re-attach afterward only for the surviving candidate pairs.
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                bind1(
                    "sig",
                    "sg",
                    f"transform(sequence(0, {_N_BANDS - 1}), "
                    f"b -> concat_ws(',', sg[{_ROWS_PER_BAND}*b], sg[{_ROWS_PER_BAND}*b+1], "
                    f"sg[{_ROWS_PER_BAND}*b+2], sg[{_ROWS_PER_BAND}*b+3]))",
                )
            )
        ).alias("band", "bucket"),
    )
    # Skew guard for the banded self-join: a bucket of k docs yields k²/2
    # pairs, and exact-duplicate clusters share EVERY band, so one giant
    # duplicate cluster at corpus scale turns a band bucket quadratic.
    # Buckets above the cap are dropped here — their members are exact or
    # near-exact duplicates that dedup_exact already groups at hash-groupBy
    # cost. Hot-bucket set is tiny → broadcast anti-join.
    hot_buckets = (
        bands.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") > max_bucket_size)
        .select("band", "bucket")
    )
    bands = bands.join(F.broadcast(hot_buckets), ["band", "bucket"], "left_anti")
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    cand = pairs.join(sa, "doc_a").join(sb, "doc_b")
    est = (
        F.expr(
            "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))"
        )
        * F.lit(1.0)
        / F.lit(_N_HASHES)
    )
    return (
        cand.withColumn("est_jaccard", F.round(est, 6).cast("double"))
        .filter(F.col("est_jaccard") >= MINHASH_EST_THRESHOLD)
        .select("doc_a", "doc_b", "est_jaccard")
    )


# SimHash: 60 sign-summed bit positions from portable token hashes, packed
# into one BIGINT; near-dup when hamming distance <= 3. Candidate generation
# by pigeonhole banding: split the 60 bits into 4 chunks of 15; hamming <= 3
# implies >= 1 identical chunk.
SIMHASH_MAX_HAMMING = 3
_SIMHASH_BITS = 60  # the portable h60 hash has 60 usable bits
_SIMHASH_CHUNKS = 4
_CHUNK_BITS = _SIMHASH_BITS // _SIMHASH_CHUNKS  # 15
_CHUNK_MASK = (1 << _CHUNK_BITS) - 1


def simhash_bits(d: DataFrame) -> DataFrame:
    """doc_id, sim: BIGINT with the 60 sign bits packed little-endian.

    Same hybrid as MinHash: token hashing JVM-side (portable h60), the
    sign aggregation vectorized in an Arrow batch (unpack bits of all token
    hashes → column sums → sign → pack)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    shifts = np.arange(_SIMHASH_BITS, dtype=np.uint64)
    weights = np.uint64(1) << shifts

    def _pack(sums: np.ndarray) -> np.ndarray:
        bits = (sums > 0).astype(np.uint64)
        return (bits * weights[None, :]).sum(axis=1).astype(np.int64)

    @pandas_udf(LongType())
    def sim_udf(ths: pd.Series) -> pd.Series:
        # Flattened batch + add.reduceat per doc boundary (see sig_udf).
        lens = np.fromiter((len(t) for t in ths), dtype=np.int64, count=len(ths))
        if len(lens) == 0:
            return pd.Series([], dtype="int64")
        if lens.sum() == 0 or (lens == 0).any():
            out = np.empty(len(ths), dtype=np.int64)
            for j, th in enumerate(ths):
                h = np.asarray(th, dtype=np.int64).astype(np.uint64)
                bits01 = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
                out[j] = _pack((bits01 * 2 - 1).sum(axis=0)[None, :])[0]
            return pd.Series(out)
        flat = np.concatenate([np.asarray(t, dtype=np.int64) for t in ths]).astype(np.uint64)
        bits01 = ((flat[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64) * 2 - 1
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        sums = np.add.reduceat(bits01, starts, axis=0)
        return pd.Series(_pack(sums))

    # text IS NOT NULL mirrors the oracle's UNNEST(str_split(text, ' ')),
    # which emits no rows for NULL text — NULL-text docs have no signature
    # in either engine (and split(NULL) would hand the UDF a None).
    hashed = spread(d.filter(F.col("text").isNotNull())).select(
        "doc_id", F.expr(f"transform(split(text, ' '), t -> {h60_spark('t')})").alias("th")
    )
    return hashed.select("doc_id", sim_udf("th").alias("sim"))


# Full-pipeline DuckDB oracle: identical token hash, sign aggregation, bit
# packing, 4×15 pigeonhole banding and bit_count hamming — exact compare.
_SIMHASH_ORACLE = f"""
WITH tok AS (SELECT doc_id, UNNEST(str_split(text, ' ')) AS t FROM documents),
th AS (SELECT doc_id, {h60_duck('t')} AS h FROM tok),
bitsum AS (
  SELECT doc_id, r.i, SUM(CASE WHEN (h >> r.i) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM th CROSS JOIN (SELECT UNNEST(range(0, {_SIMHASH_BITS})) AS i) r
  GROUP BY doc_id, r.i
),
sim AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS sim
  FROM bitsum GROUP BY doc_id
),
chunks AS (
  SELECT doc_id, sim, r.c, (sim >> ({_CHUNK_BITS} * r.c)) & {_CHUNK_MASK} AS v
  FROM sim CROSS JOIN (SELECT UNNEST(range(0, {_SIMHASH_CHUNKS})) AS c) r
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.sim AS sim_a, b.sim AS sim_b
  FROM chunks a JOIN chunks b
    ON a.c = b.c AND a.v = b.v AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= {SIMHASH_MAX_HAMMING}
"""


@register(
    "dedup_simhash",
    oracle=_SIMHASH_ORACLE,
    description="SimHash(60-bit, portable hash) near-dup pairs, banded candidate join, hamming <= 3",
    tags=("dedup", "simhash", "extension"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    sigs = simhash_bits(d).persist()  # both join sides + hamming read it
    chunks = sigs.select(
        "doc_id",
        "sim",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {_SIMHASH_CHUNKS - 1}), "
                f"c -> shiftright(sim, {_CHUNK_BITS} * c) & {_CHUNK_MASK})"
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sim").alias("sim_a"),
            F.col("b.sim").alias("sim_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.expr("bit_count(sim_a ^ sim_b)")
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
    )


# The synthetic embeddings are near-isotropic (max pairwise cosine ≈ 0.51),
# so the "near-dup" bar is calibrated to the top ~0.1% of pairs.
EMBED_COS_THRESHOLD = 0.38

# All-pairs guard: the exact cosine baseline is O(n²) by construction and
# must never run standalone on a production-scale table.
DEDUP_COSINE_MAX_ROWS = 200_000


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH e0 AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
      FROM embeddings
    ),
    -- zero-norm vectors have no defined cosine; excluded in BOTH engines
    e AS (SELECT * FROM e0 WHERE nrm > 0)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(ROUND(list_sum(list_transform(range(1, 65),
                      i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 6) AS DOUBLE) AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm)
          >= {EMBED_COS_THRESHOLD}
    """,
    description="Embedding near-dup pairs: pairwise cosine >= threshold (exact baseline)",
    tags=("dedup", "embedding", "extension"),
)
def dedup_embedding_cosine(
    spark: SparkSession, sf_dir: str, max_rows: int | None = DEDUP_COSINE_MAX_ROWS
) -> DataFrame:
    e = tbl(spark, sf_dir, "embeddings")
    if max_rows is not None:
        # Parquet row count comes from file footers — metadata-only, no scan.
        n = e.count()
        if n > max_rows:
            raise ValueError(
                f"dedup_embedding_cosine is the O(n²) exact baseline; {n} rows "
                f"exceeds the {max_rows}-row guard. Use dedup_minhash_lsh / "
                "sim_ann_lsh / sim_ann_ivf for corpus-scale near-dup detection, "
                "or pass max_rows=None to force the quadratic plan."
            )
    withn = spread(e).select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
        F.expr(
            "sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (acc, x) -> acc + x))"
        ).alias("nrm"),
    ).filter(F.col("nrm") > 0)  # cosine undefined for zero-norm vectors
    a = withn.alias("a")
    b = withn.alias("b")
    # zip_with references each vector ONCE (an indexed fold would re-inline
    # the projection per element); fold order matches the DuckDB oracle's
    # sequential list_sum, so the doubles agree bitwise.
    dot = F.expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D, (acc, p) -> acc + p)")
    cos = dot / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(cos >= EMBED_COS_THRESHOLD)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 6).cast("double").alias("cos_sim"),
        )
    )
