"""Training-data pipeline operators, part 2: PII scrubbing, stratified
sampling, eval-set decontamination, and repetition-based quality filtering.

These extend the dedup/similarity/text families with the remaining stages a
large-scale corpus pipeline runs between "raw crawl" and "training shards".
All four are pure Catalyst (no Python UDFs) and each documents its 100 TB
plan in the docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from .dedup import _SHINGLES, _SHINGLES_DUCK
from .relational import tbl


# Deterministic synthetic PII: the corpus is synthetic and contains none, so
# the scrub operator plants its own (one fake email or phone per selected
# doc, derived from doc_id) and then removes it — exercising the real regex
# path with verifiable nonzero work.
_EMAIL_RE = r"[a-z0-9._]+@[a-z0-9]+\.[a-z]{2,4}"
_PHONE_RE = r"\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"


@register(
    "text_pii_scrub",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
                  WHEN doc_id % 3 = 1
                  THEN text || ' call +1-555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-0199 today'
                  ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
           LENGTH(text) - LENGTH(regexp_replace(regexp_replace(text,
                 '{_EMAIL_RE}', '', 'g'), '{_PHONE_RE}', '', 'g')) AS n_pii_chars,
           LENGTH(regexp_replace(regexp_replace(text,
                 '{_EMAIL_RE}', '[EMAIL]', 'g'), '{_PHONE_RE}', '[PHONE]', 'g')) AS scrubbed_len
    FROM planted
    WHERE doc_id % 5 = 0
    """,
    description="PII scrub: email/phone regex redaction with per-doc removed-char counts",
    tags=("text", "pii", "extension"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex redaction entirely in whole-stage codegen — the scrub itself is
    a per-row map, so at 100 TB it is embarrassingly parallel with zero
    shuffle; only the scan and write matter."""
    d = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    planted = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.col("text"),
                F.lit(" call +1-555-"),
                F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                F.lit("-0199 today"),
            ),
        )
        .otherwise(F.col("text")),
    )
    stripped = F.regexp_replace(F.regexp_replace("text", _EMAIL_RE, ""), _PHONE_RE, "")
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    return planted.select(
        "doc_id",
        (F.length("text") - F.length(stripped)).cast("bigint").alias("n_pii_chars"),
        F.length(scrubbed).cast("bigint").alias("scrubbed_len"),
    )


# Per-language keep rates: downsample the dominant language, keep the tail.
_STRATA_RATES = {"en": 0.5, "zh": 1.0, "es": 1.0, "de": 1.0, "fr": 0.25}


@register(
    "sample_stratified",
    oracle=f"""
    WITH tagged AS (
      SELECT lang,
             CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':strat'), 1, 8) AS INT64)
                  AS DOUBLE) / 4294967296.0 AS u
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_total,
           COUNT(CASE WHEN u < CASE lang WHEN 'en' THEN 0.5 WHEN 'fr' THEN 0.25 ELSE 1.0 END
                 THEN 1 END) AS n_kept
    FROM tagged
    GROUP BY lang
    """,
    description="Stratified sampling: per-language keep rates via salted content hash "
    "(reproducible across engines, runs, and repartitions)",
    tags=("sample", "stratified", "extension"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing downsample, the way corpus pipelines actually do
    it: membership is a pure function of (id, salt), so the sample is
    reproducible shard-independently and re-runs don't churn the corpus.
    No shuffle at all for the sampling itself (the groupBy here is only the
    report); at 100 TB the kept rows stream straight to the writer.
    """
    d = tbl(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":strat"))), 1, 8), 16, 10)
        .cast("bigint")
        .cast("double")
        / F.lit(4294967296.0)
    )
    rate = F.when(F.col("lang") == "en", 0.5).when(F.col("lang") == "fr", 0.25).otherwise(1.0)
    return (
        d.withColumn("u", u)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(F.col("u") < rate, 1)).alias("n_kept"),
        )
    )


CONTAMINATION_MIN_SHARED = 8


@register(
    "contamination_check",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, source, UNNEST(list_distinct({_SHINGLES_DUCK})) AS g
      FROM documents
    ),
    eval_sh AS (SELECT doc_id, g FROM sh WHERE source = 'src0'),
    train_sh AS (SELECT doc_id, source, g FROM sh WHERE source <> 'src0'),
    hits AS (
      SELECT t.source, t.doc_id AS train_doc, e.doc_id AS eval_doc, COUNT(*) AS n_shared
      FROM train_sh t JOIN eval_sh e ON t.g = e.g
      GROUP BY t.source, t.doc_id, e.doc_id
      HAVING COUNT(*) >= {CONTAMINATION_MIN_SHARED}
    )
    SELECT source,
           COUNT(*) AS n_contaminated_pairs,
           COUNT(DISTINCT train_doc) AS n_train_docs,
           COUNT(DISTINCT eval_doc) AS n_eval_docs
    FROM hits
    GROUP BY source
    """,
    description="Eval-set decontamination: train docs sharing >= K shingles with a "
    "held-out source, reported per training source",
    tags=("dedup", "contamination", "extension"),
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-overlap detection (the decontamination pass every training
    corpus runs before sharding).

    Scale shape: the eval set is benchmarks — thousands of docs against a
    100 TB corpus — so its shingle table is BROADCAST and the corpus-side
    scan joins against it with no shuffle of the corpus at all; only the
    (tiny) hit set aggregates. This asymmetry is what makes the operator
    different from the symmetric self-join dedups in dedup.py.
    """
    d = tbl(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", "source", F.explode(F.array_distinct(F.expr(_SHINGLES))).alias("gs")
    ).select("doc_id", "source", F.xxhash64("gs").alias("g"))
    # xxhash64 on both sides of the join only (never surfaced): the oracle
    # joins on raw shingle strings — identical pair semantics, narrower
    # shuffle rows here.
    eval_sh = sh.filter(F.col("source") == "src0").select(
        F.col("doc_id").alias("eval_doc"), "g"
    )
    train_sh = sh.filter(F.col("source") != "src0").select(
        F.col("doc_id").alias("train_doc"), "source", "g"
    )
    hits = (
        train_sh.join(F.broadcast(eval_sh), "g")
        .groupBy("source", "train_doc", "eval_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= CONTAMINATION_MIN_SHARED)
    )
    return hits.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_contaminated_pairs"),
        F.count_distinct("train_doc").alias("n_train_docs"),
        F.count_distinct("eval_doc").alias("n_eval_docs"),
    )


REPETITION_MAX_RATIO = 0.2


@register(
    "text_repetition_ratio",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, UNNEST({_SHINGLES_DUCK}) AS g
      FROM documents WHERE doc_id % 4 = 0
    ),
    freq AS (
      SELECT doc_id, g, COUNT(*) AS f
      FROM sh GROUP BY doc_id, g
    ),
    per_doc AS (
      SELECT doc_id,
             MAX(f) AS top_gram_count,
             CAST(SUM(f) AS BIGINT) AS n_grams
      FROM freq GROUP BY doc_id
    )
    SELECT doc_id, top_gram_count, n_grams,
           CAST(ROUND(top_gram_count * 1.0 / n_grams, 6) AS DOUBLE) AS repetition_ratio,
           top_gram_count * 1.0 / n_grams > {REPETITION_MAX_RATIO} AS flagged
    FROM per_doc
    """,
    description="Repetition quality filter: top-trigram share of all trigrams per doc "
    "(Gopher-style repetition rule)",
    tags=("text", "quality", "extension"),
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signal: a document whose single most frequent
    trigram covers more than 20% of its trigrams is boilerplate or spam.

    Plan: explode → two aggregations, both keyed by doc_id, so the second
    reuses the first's partitioning (one shuffle total). At 100 TB the
    explode inflates rows ~|words| per doc but never leaves its partition
    until the doc_id-keyed aggregate — no wide intermediate state.
    """
    d = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
    sh = d.select("doc_id", F.explode(F.expr(_SHINGLES)).alias("g"))
    freq = sh.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("f"))
    per_doc = freq.groupBy("doc_id").agg(
        F.max("f").alias("top_gram_count"), F.sum("f").alias("n_grams")
    )
    ratio = F.col("top_gram_count") * F.lit(1.0) / F.col("n_grams")
    return per_doc.select(
        "doc_id",
        "top_gram_count",
        "n_grams",
        F.round(ratio, 6).cast("double").alias("repetition_ratio"),
        (ratio > REPETITION_MAX_RATIO).alias("flagged"),
    )


CHUNK_TOKENS = 32


@register(
    "text_chunk_udtf",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, str_split(text, ' ') AS t
      FROM documents WHERE doc_id % 6 = 0
    )
    SELECT doc_id,
           CAST(g AS INT) AS chunk_idx,
           array_to_string(t[g*{CHUNK_TOKENS}+1 : LEAST((g+1)*{CHUNK_TOKENS}, LEN(t))], ' ') AS chunk,
           CAST(LEAST((g+1)*{CHUNK_TOKENS}, LEN(t)) - g*{CHUNK_TOKENS} AS INT) AS n_tokens
    FROM toks, UNNEST(range(0, CAST(CEIL(LEN(t) / {CHUNK_TOKENS}.0) AS BIGINT))) AS u(g)
    """,
    description=f"Context-window chunking ({CHUNK_TOKENS} tokens) via a Python UDTF "
    "lateral join — the UDTF API surface, oracle-checked",
    tags=("text", "udtf", "extension"),
)
def text_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one operator here that is deliberately a Python UDTF: one input
    row → N output rows with per-row Python logic, the shape Spark's lateral
    UDTF API exists for. Chunking itself could be an SQL explode — the point
    is exercising the UDTF surface (SURVEY §2.5's UDF/UDAF/UDTF row) with an
    oracle-checked example. Row-at-a-time Python is the slow path; for a
    100 TB chunker you'd use the equivalent explode/sequence SQL, and this
    docstring says so.
    """
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="chunk_idx int, chunk string, n_tokens int")
    class ChunkText:
        def eval(self, text: str, chunk_size: int):
            toks = text.split(" ")
            for i in range(0, len(toks), chunk_size):
                part = toks[i : i + chunk_size]
                yield i // chunk_size, " ".join(part), len(part)

    spark.udtf.register("chunk_text", ChunkText)
    tbl(spark, sf_dir, "documents").filter(F.col("doc_id") % 6 == 0).createOrReplaceTempView(
        "_docs_for_chunking"
    )
    return spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_idx, c.chunk, c.n_tokens
        FROM _docs_for_chunking d, LATERAL chunk_text(d.text, {CHUNK_TOKENS}) c
        """
    )


@register(
    "pandas_udaf_weighted_mean",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,6)) * (user_id % 5 + 1)) AS DOUBLE)
           / SUM(user_id % 5 + 1) AS weighted_mean_value
    FROM events
    WHERE value IS NOT NULL AND user_id IS NOT NULL
    GROUP BY event_type
    """,
    description="Grouped-agg pandas UDAF: weighted mean with exact integer-micro "
    "accumulation (UDAF API surface, oracle-checked)",
    tags=("udaf", "pandas", "extension"),
)
def pandas_udaf_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDAF leg of the UDF/UDAF/UDTF surface: a grouped-aggregate pandas
    UDF. Accumulation converts values to integer micro-units so the sum is
    exact and order-independent — the same trick the engine's decimal-sum
    convention uses — making the result bit-identical to the oracle despite
    arbitrary row order reaching the UDF. Note grouped-agg UDFs skip
    map-side partial aggregation (whole groups shuffle); the built-in
    decimal-sum aggregates elsewhere in the registry are the 100 TB path.
    """
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    from .relational import events_tbl

    # functionType given explicitly: this module's postponed annotations
    # (`from __future__ import annotations`) turn type hints into strings,
    # which pandas_udf's hint-based inference cannot read.
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def wmean(v, w):
        # drop rows where either side is NULL — matches the SQL convention
        # (and None -> NaN -> astype(int64) is garbage, not an error)
        mask = v.notna() & w.notna()
        vi = np.rint(v[mask].to_numpy(dtype=np.float64) * 1e6).astype(np.int64)
        wi = w[mask].to_numpy(dtype=np.int64)
        if len(wi) == 0 or wi.sum() == 0:
            return None
        return float((vi * wi).sum() / 1e6) / float(wi.sum())

    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("value").isNotNull() & F.col("user_id").isNotNull())
        .select("event_type", "value", (F.col("user_id") % 5 + 1).alias("w"))
    )
    return ev.groupBy("event_type").agg(
        wmean("value", "w").alias("weighted_mean_value")
    )


@register(
    "sketch_distinct_rollup",
    # HLL registers are engine-internal, so the portable output is the exact
    # distinct count plus a boolean asserting the sketch estimate (per source
    # AND the merged global rollup) landed within tolerance; the oracle
    # reproduces exact + TRUE. Default lgConfigK=12 → rsd ≈ 1.6%, so a 10%
    # band is ~6 sigma.
    oracle="""
    SELECT source, CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct_exact,
           TRUE AS hll_within_tol
    FROM documents GROUP BY source
    UNION ALL
    SELECT '__all__', CAST(COUNT(DISTINCT text) AS BIGINT), TRUE FROM documents
    """,
    description="Mergeable distinct-count sketches: per-source HLL built once, "
    "unioned to a global estimate without rescanning; verified in-plan "
    "against the exact distinct counts",
    tags=("sketch", "hll", "extension"),
)
def sketch_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-summary pattern every 100 TB pipeline leans on: build a
    compact HLL sketch per partition-of-interest (here per source), then
    UNION the sketches for any coarser rollup — the global distinct-user
    estimate comes from merging 20 sketches, not rescanning the corpus.
    At scale the per-source sketch table is a tiny materialized artifact
    refreshed incrementally; every rollup after that is sketch algebra.
    The exact distinct count rides along so the sketch (and the merge!) is
    verified in-plan, not trusted.
    """
    from pyspark.sql.functions import hll_sketch_agg, hll_sketch_estimate, hll_union_agg

    d = tbl(spark, sf_dir, "documents")

    def within(est, exact):
        # absolute floor of 2: a relative-only band is unsatisfiable at
        # exact=0 and brittle for tiny groups
        return (
            F.abs(est - exact) <= F.greatest(F.lit(2.0), exact * F.lit(0.10))
        ).alias("hll_within_tol")

    per_source = d.groupBy("source").agg(
        F.countDistinct("text").alias("n_distinct_exact"),
        # hash only non-null texts: xxhash64(NULL) is the seed hash (not
        # NULL), which would put a phantom item in the sketch while
        # countDistinct skips NULLs
        hll_sketch_agg(
            F.when(F.col("text").isNotNull(), F.xxhash64("text").cast("string"))
        ).alias("sk"),
    )
    per = per_source.select(
        "source",
        "n_distinct_exact",
        within(hll_sketch_estimate("sk"), F.col("n_distinct_exact")),
    )
    merged = per_source.agg(
        hll_sketch_estimate(hll_union_agg("sk")).alias("est_all")
    )
    exact_all = d.agg(F.countDistinct("text").alias("n_distinct_exact"))
    total = exact_all.crossJoin(F.broadcast(merged)).select(
        F.lit("__all__").alias("source"),
        "n_distinct_exact",
        within(F.col("est_all"), F.col("n_distinct_exact")),
    )
    return per.unionByName(total).select("source", "n_distinct_exact", "hll_within_tol")
