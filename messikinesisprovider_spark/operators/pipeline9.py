"""Exact interpolated percentiles and binary-media dedup, round 3i.

- ``percentile_cont_exact``: distributed PERCENTILE_CONT with NO floating
  interpolation drift: the interpolated value at p = k/100 is expressed as
  a weighted sum of the two rank-selected order statistics
  (``(100-r)*lo + r*hi`` with integer weights, summed in DECIMAL, ONE
  final double division). Engines differ at ulp level on float
  interpolation arithmetic; a decimal-weighted selection cannot. This
  completes the percentile family: discrete selection
  (percentile_bands_hourly, anomaly_mad_flags) + continuous interpolation
  (here) + sketched estimation (approx_percentile_sketch).
- ``multimodal_dedup_binary``: byte-identical media dedup — the first
  dedup stage of any image/audio corpus: hash the binary payload, group,
  keep the smallest doc id as canonical, account reclaimable bytes.
  Spark groups on the REAL binary column (sha2 over the synthesized FIMG
  container); the oracle groups on the portable md5-of-text key, which is
  bijective with the container bytes because the container is a pure
  function of the text (multimodal.synthesize_image_column) — DuckDB 1.0
  has no BLOB sha256 to replicate the binary hash directly.

Reference parity note: the reference (SURVEY.md §0) has no relational or
media surface; these extend the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .multimodal import synthesize_image_column
from .relational import tbl

# ---------------------------------------------------------------------------
# percentile_cont_exact
# ---------------------------------------------------------------------------

PCTL_KS = (25, 50, 75, 90)  # percentiles, in integer percent


@register(
    "percentile_cont_exact",
    oracle=f"""
    WITH vals AS (
      SELECT l_returnflag AS flag,
             CAST(l_extendedprice AS DECIMAL(18,6)) AS v, l_orderkey, l_linenumber
      FROM lineitem
    ),
    ranked AS (
      SELECT flag, v,
             ROW_NUMBER() OVER (PARTITION BY flag
                                ORDER BY v, l_orderkey, l_linenumber) AS rn
      FROM vals
    ),
    counts AS (SELECT flag, COUNT(*) AS n FROM vals GROUP BY flag),
    spec AS (
      SELECT flag, n, k, k * (n - 1) AS pos
      FROM counts, (SELECT UNNEST([{", ".join(map(str, PCTL_KS))}]) AS k)
    ),
    needed AS (
      SELECT flag, k, n, pos // 100 + 1 AS need_rank, 100 - pos % 100 AS w FROM spec
      UNION ALL
      SELECT flag, k, n, pos // 100 + 2, pos % 100 FROM spec WHERE pos % 100 > 0
    ),
    agg AS (
      SELECT nd.flag, nd.k, MIN(nd.n) AS n, SUM(nd.w * r.v) AS num
      FROM needed nd JOIN ranked r ON r.flag = nd.flag AND r.rn = nd.need_rank
      GROUP BY nd.flag, nd.k
    )
    SELECT flag, CAST(k AS INTEGER) AS percentile, n,
           CAST(num AS DOUBLE) / 100 AS value_cont
    FROM agg
    """,
    description=f"Exact PERCENTILE_CONT at p={PCTL_KS} per return flag: "
    "integer-weighted rank selection, decimal sum, one double division",
    tags=("percentile", "statistics", "extension"),
)
def percentile_cont_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_CONT as weighted rank selection — exact and distributed.

    pos = k*(n-1) (in percent-hundredths); the interpolated value is
    ((100-r)*value@lo + r*value@hi)/100 with r = pos mod 100 — expressed as
    1-2 (rank, weight) rows per percentile joined against the ranked
    values, so interpolation becomes a DECIMAL-exact weighted aggregate.

    Scale plan: ONE shuffle on the group key for the ranking window. The
    sort leads with the VALUE, so the result is robust even though this
    testdata's (l_orderkey, l_linenumber) is NOT unique (the fuzzer found
    ~1.1k duplicate line keys): rows tied on the full sort key are tied on
    v, and the value selected at a rank is the same whichever tied row an
    engine puts there. Counts reuse that partitioning; the needed-rank
    spec is |groups| x |percentiles| x 2 rows — broadcast into an equi-join
    on (flag, rank). No global sort, no single-partition window, no float
    accumulation.
    """
    li = tbl(spark, sf_dir, "lineitem")
    vals = li.select(
        F.col("l_returnflag").alias("flag"),
        # The registry-wide decimal-sum convention: quantize the double to
        # DECIMAL(18,6) so the weighted sum is exact and order-independent
        # in BOTH engines (see registry.py docstring).
        F.col("l_extendedprice").cast("decimal(18,6)").alias("v"),
        "l_orderkey",
        "l_linenumber",
    )
    wr = W.partitionBy("flag").orderBy("v", "l_orderkey", "l_linenumber")
    ranked = vals.withColumn("rn", F.row_number().over(wr)).select("flag", "v", "rn")
    counts = vals.groupBy("flag").agg(F.count(F.lit(1)).alias("n"))
    spec = (
        counts.select(
            "flag", "n", F.explode(F.array(*[F.lit(k) for k in PCTL_KS])).alias("k")
        )
        .withColumn("pos", F.col("k").cast("long") * (F.col("n") - 1))
    )
    lo = spec.select(
        "flag",
        "k",
        "n",
        (F.expr("pos div 100") + 1).alias("need_rank"),
        (F.lit(100) - F.col("pos") % 100).alias("w"),
    )
    hi = spec.filter(F.col("pos") % 100 > 0).select(
        "flag",
        "k",
        "n",
        (F.expr("pos div 100") + 2).alias("need_rank"),
        (F.col("pos") % 100).alias("w"),
    )
    needed = lo.unionAll(hi)
    agg = (
        ranked.join(
            F.broadcast(needed),
            (ranked.flag == needed.flag) & (ranked.rn == needed.need_rank),
        )
        .drop(needed.flag)
        .groupBy("flag", "k")
        .agg(F.min("n").alias("n"), F.sum(F.col("w") * F.col("v")).alias("num"))
    )
    return agg.select(
        "flag",
        F.col("k").cast("int").alias("percentile"),
        "n",
        (F.col("num").cast("double") / 100).alias("value_cont"),
    )


# ---------------------------------------------------------------------------
# multimodal_dedup_binary
# ---------------------------------------------------------------------------


@register(
    "multimodal_dedup_binary",
    oracle="""
    WITH imgs AS (
      SELECT doc_id, md5(text) AS content_key,
             9 + octet_length(encode(text)) AS n_bytes
      FROM documents WHERE text IS NOT NULL
    )
    SELECT content_key,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS canonical_doc_id,
           CAST(MIN(n_bytes) AS BIGINT) AS n_bytes_each,
           CAST((COUNT(*) - 1) * MIN(n_bytes) AS BIGINT) AS bytes_reclaimable
    FROM imgs
    GROUP BY content_key
    HAVING COUNT(*) > 1
    """,
    description="Byte-identical media dedup: hash the binary payload, keep "
    "the smallest doc id, account reclaimable bytes",
    tags=("multimodal", "dedup", "binary", "extension"),
)
def multimodal_dedup_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One hash-groupBy over the binary column — the media-corpus first pass.

    Scale plan: sha2 over the payload computes map-side (JVM expression,
    no decode); the groupBy key is the 64-char digest, not the payload
    bytes, so shuffle volume is hash + metadata per file regardless of
    media size. The portable md5-of-text key rides along only to give the
    single-node oracle an equivalent group key (bijective with the
    container bytes — the FIMG container is a pure function of text);
    production output would carry the binary digest itself.
    """
    d = tbl(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    imgs = synthesize_image_column(d).join(
        d.select("doc_id", F.md5(F.col("text").cast("binary")).alias("content_key")),
        "doc_id",
    )
    groups = (
        imgs.select(
            F.sha2("image", 256).alias("bin_digest"),
            "content_key",
            "doc_id",
            F.length("image").cast("long").alias("n_bytes"),
        )
        .groupBy("bin_digest")
        .agg(
            F.min("content_key").alias("content_key"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
            F.min("n_bytes").alias("n_bytes_each"),
        )
    )
    return groups.filter(F.col("n_copies") > 1).select(
        "content_key",
        "n_copies",
        "canonical_doc_id",
        "n_bytes_each",
        ((F.col("n_copies") - 1) * F.col("n_bytes_each")).alias("bytes_reclaimable"),
    )
