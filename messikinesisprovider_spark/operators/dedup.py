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

MinHash/SimHash use Spark's xxhash64 — no SQL-portable twin exists, so their
oracle is rows-only; tests/test_dedup.py verifies them against the exact
Jaccard operator (recall/precision) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import tbl

# Word-3-gram shingles as a Spark SQL expression (0-based toks[i]).
_SHINGLES = (
    "CASE WHEN size(split(text, ' ')) >= 3 THEN "
    "transform(sequence(0, size(split(text, ' ')) - 3), "
    "i -> concat_ws(' ', split(text, ' ')[i], split(text, ' ')[i+1], split(text, ' ')[i+2])) "
    "ELSE array() END"
)

# Same shingling in DuckDB dialect (1-based list indexing; range(a,b) is [a,b)).
_SHINGLES_DUCK = (
    "CASE WHEN LEN(str_split(text, ' ')) >= 3 THEN "
    "list_transform(range(1, LEN(str_split(text, ' ')) - 1), "
    "i -> concat_ws(' ', str_split(text, ' ')[i], str_split(text, ' ')[i+1], str_split(text, ' ')[i+2])) "
    "ELSE [] END"
)

JACCARD_THRESHOLD = 0.2


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
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    sh = d.select("doc_id", F.explode(F.array_distinct(F.expr(_SHINGLES))).alias("g"))
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


def bind1(value_sql: str, var: str, body_sql: str) -> str:
    """Evaluate `value_sql` ONCE and reference it as `var` inside `body_sql`.

    Catalyst's CollapseProject inlines projected expressions into every
    downstream reference, so an expression that reads a computed array k
    times recomputes it k times (measured 60× slowdown on MinHash banding).
    A single-element `transform` introduces a NamedLambdaVariable, which is
    evaluated once per element — i.e. exactly once — and cannot be inlined.
    """
    return f"transform(array({value_sql}), {var} -> {body_sql})[0]"


def minhash_signatures(d: DataFrame) -> DataFrame:
    """doc_id, sig: array<bigint> of length 64, n_shingles."""
    shingled = d.select(
        "doc_id", F.array_distinct(F.expr(_SHINGLES)).alias("sh")
    ).filter(F.size("sh") > 0)
    return shingled.select(
        "doc_id",
        F.expr(
            bind1(
                "sh",
                "shv",
                f"transform(sequence(0, {_N_HASHES - 1}), "
                f"i -> array_min(transform(shv, s -> xxhash64(s, i))))",
            )
        ).alias("sig"),
        F.size("sh").alias("n_shingles"),
    )


@register(
    "dedup_minhash_lsh",
    oracle=None,  # xxhash64 has no DuckDB twin; verified against dedup_ngram_jaccard in tests
    description="MinHash(64) + LSH(16 bands × 4) candidate pairs with signature-estimated Jaccard",
    tags=("dedup", "minhash", "lsh", "extension"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    sigs = minhash_signatures(d)
    # Band hash: one 64-bit hash of the 4 signature slots in the band.
    bands = sigs.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.expr(
                bind1(
                    "sig",
                    "sg",
                    f"transform(sequence(0, {_N_BANDS - 1}), "
                    f"b -> xxhash64(sg[{_ROWS_PER_BAND}*b], sg[{_ROWS_PER_BAND}*b+1], "
                    f"sg[{_ROWS_PER_BAND}*b+2], sg[{_ROWS_PER_BAND}*b+3]))",
                )
            )
        ).alias("band", "bucket"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
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


# SimHash: 64 sign-summed bit positions from token hashes; near-dup when
# hamming distance <= 3. Candidate generation by pigeonhole banding: split
# the 64 bits into 4 chunks of 16; hamming <= 3 implies >= 1 identical chunk.
SIMHASH_MAX_HAMMING = 3


def simhash_bits(d: DataFrame) -> DataFrame:
    # Hash each token once (bind1: the 64 per-bit folds all read the same
    # materialized hash array instead of re-hashing the tokens 64×).
    return d.select(
        "doc_id",
        F.expr(
            bind1(
                "transform(split(text, ' '), t -> xxhash64(t))",
                "th",
                # shiftright() fn form: the `>>` operator mis-parses inside
                # nested lambdas in Spark 4.1's SQL parser
                "transform(sequence(0, 63), b -> "
                "CASE WHEN aggregate(th, 0L, "
                "(acc, h) -> acc + CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END) > 0 "
                "THEN 1 ELSE 0 END)",
            )
        ).alias("bits"),
    )


@register(
    "dedup_simhash",
    oracle=None,  # xxhash64-based; verified structurally in tests
    description="SimHash(64-bit) near-dup pairs, banded candidate join, hamming <= 3",
    tags=("dedup", "simhash", "extension"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    sigs = simhash_bits(d)
    chunks = sigs.select(
        "doc_id",
        "bits",
        F.posexplode(
            F.expr(
                bind1(
                    "bits",
                    "bv",
                    "transform(sequence(0, 3), c -> "
                    "aggregate(sequence(0, 15), 0L, (acc, i) -> acc * 2 + bv[c*16 + i]))",
                )
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
            F.col("a.bits").alias("bits_a"),
            F.col("b.bits").alias("bits_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.expr("aggregate(zip_with(bits_a, bits_b, (x, y) -> abs(x - y)), 0, (acc, v) -> acc + v)")
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
    )


# The synthetic embeddings are near-isotropic (max pairwise cosine ≈ 0.51),
# so the "near-dup" bar is calibrated to the top ~0.1% of pairs.
EMBED_COS_THRESHOLD = 0.38


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
      FROM embeddings
    )
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
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "embeddings")
    withn = e.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
        F.expr(
            "sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (acc, x) -> acc + x))"
        ).alias("nrm"),
    )
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
