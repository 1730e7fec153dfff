"""Exact-substring dedup + Bloom-filter join pruning, round 3 (appended).

``dedup_exact_substring``: the Lee et al. 2022 ("Deduplicating Training Data
Makes Language Models Better", arXiv:2107.06499) removal-list shape — find
every OVERLAPPING W-token span that occurs more than once corpus-wide, then
report, per document, the exact number of duplicated tokens after merging
overlapping duplicated spans into maximal intervals. This is substring-level
exact dedup: it catches boilerplate shared between otherwise-distinct
documents, which whole-document hashing (`dedup_exact`) misses, and unlike
the non-overlapping-chunk audit (`dedup_chunk_fraction`) it produces the
exact token spans a removal pass would cut.

The reference paper builds a corpus suffix array; the Spark-native
equivalent for fixed minimum match length W is the sliding W-gram hash
table: a span of length >= W is duplicated iff all of its W-grams are
duplicated, so the merged duplicated-W-gram intervals are exactly the
maximal duplicated substrings of length >= W (at W-token resolution).

Scale: this never joins document pairs — span hashes go through one
map-side-combined groupBy (frequency) and one re-join on the hash key (at
most one frequency row per hash), so a hot span costs one shuffled count,
not a candidate explosion. The interval merge is a per-document window.
At 100 TB, W-gram hashing is the standard production approach for exactly
this reason (suffix arrays don't distribute; see the paper's own
ExactSubstr implementation notes).

``bloom_semi_filter``: the runtime-filter / bloom-pruned semi-join pattern
(what Spark's own `spark.sql.optimizer.runtime.bloomFilter.enabled` injects,
and Trino/Snowflake call runtime filters) made explicit and verifiable: a
bounded bit-array built from the dimension side's join keys is broadcast to
the fact side, which drops rows that cannot join BEFORE the shuffle. The
filter is built over the portable 60-bit hash so the DuckDB oracle
reproduces the bit array, the probe verdicts, and the false-positive
accounting bit-for-bit; the no-false-negative invariant is part of the
emitted report (violations would show as n_missed > 0 and fail parity).

Reference parity note: the reference (SURVEY.md §0) has no relational
surface; these extend the engine per the round brief (LLM-pipeline dedup +
scale join patterns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import spread, tbl

# Minimum duplicated-substring length in tokens. The paper uses 50 BPE
# tokens against web-scale corpora; the synthetic docs average ~55 words, so
# W=8 keeps the operator's interesting regime (partial overlap between
# near-duplicate docs) populated at test SF. W is a constant fold in both
# engines — changing it changes no plan shape.
SUBSTR_W = 8

_W = SUBSTR_W


@register(
    "dedup_exact_substring",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk
      FROM documents WHERE text IS NOT NULL
    ),
    eligible AS (
      SELECT doc_id, tk, LEN(tk) AS n_tokens FROM toks WHERE LEN(tk) >= {_W}
    ),
    spans0 AS (
      SELECT doc_id, n_tokens,
             UNNEST(list_transform(range(0, n_tokens - {_W - 1}),
                    i -> {{'pos': i,
                          'gh': {h60_duck(f"array_to_string(tk[i+1:i+{_W}], ' ')")}}})) AS u
      FROM eligible
    ),
    spans AS (SELECT doc_id, n_tokens, u.pos AS pos, u.gh AS gh FROM spans0),
    freq AS (SELECT gh, COUNT(*) AS n FROM spans GROUP BY gh),
    dup AS (SELECT s.doc_id, s.pos FROM spans s JOIN freq f USING (gh) WHERE f.n > 1),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN MAX(pos + {_W}) OVER w IS NULL OR pos > MAX(pos + {_W}) OVER w
                  THEN 1 ELSE 0 END AS brk
      FROM dup
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    isl2 AS (SELECT doc_id, pos,
                    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
             FROM isl),
    cov AS (SELECT doc_id, island, MAX(pos) + {_W} - MIN(pos) AS c
            FROM isl2 GROUP BY doc_id, island),
    covdoc AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS dup_tokens
               FROM cov GROUP BY doc_id),
    report AS (
      SELECT s.doc_id, ANY_VALUE(s.n_tokens) AS n_tokens, COUNT(*) AS n_spans,
             COUNT(CASE WHEN f.n > 1 THEN 1 END) AS n_dup_spans
      FROM spans s JOIN freq f USING (gh)
      GROUP BY s.doc_id
    )
    SELECT r.doc_id, r.n_tokens, r.n_spans, r.n_dup_spans,
           COALESCE(c.dup_tokens, 0) AS dup_tokens,
           CAST(COALESCE(c.dup_tokens, 0) AS DOUBLE) / r.n_tokens AS dup_frac
    FROM report r LEFT JOIN covdoc c USING (doc_id)
    """,
    description=f"Exact duplicated-substring audit (Lee et al. 2022 shape): "
    f"overlapping {_W}-token span hashes duplicated corpus-wide, merged into "
    f"maximal intervals; per-doc exact duplicated-token count",
    tags=("dedup", "substring", "extension"),
)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup via sliding W-gram hashing (see module doc).

    Plan: tokenize -> explode (pos, h60(W-gram)) structs -> groupBy hash for
    corpus frequency (map-side combined) -> re-join on hash -> per-doc
    interval merge in a doc-partitioned window -> per-doc report. One
    shuffle on the span hash, one on doc_id; no doc-pair join anywhere.
    """
    # spread(): the per-position md5 span hashing is CPU-bound map work and
    # the single-file test table scans as ONE partition (gated: skipped at real
    # split counts).
    d = spread(tbl(spark, sf_dir, "documents")).where(F.col("text").isNotNull())
    t = (
        d.select("doc_id", F.split("text", " ").alias("tk"))
        .withColumn("n_tokens", F.size("tk").cast("bigint"))  # size() is INT32; oracle LEN() is BIGINT
        .where(F.col("n_tokens") >= _W)
    )
    gram = h60_spark(f"concat_ws(' ', slice(tk, i + 1, {_W}))")
    # Persist the hashed spans: the corpus-frequency aggregate, both report
    # branches and the island chain each re-evaluate this subtree otherwise
    # (the md5 span explode appears FOUR times in the unpersisted physical
    # plan — no exchange is reusable across the differently-shaped
    # consumers). Same production shape as MinHash signatures: fingerprints
    # are materialized once, joined thereafter.
    spans = t.select(
        "doc_id",
        "n_tokens",
        F.explode(
            F.expr(f"transform(sequence(0, n_tokens - {_W}), i -> struct(i AS pos, {gram} AS gh))")
        ).alias("u"),
    ).select("doc_id", "n_tokens", F.col("u.pos").alias("pos"), F.col("u.gh").alias("gh")).persist()

    freq = spans.groupBy("gh").agg(F.count(F.lit(1)).alias("n"))
    joined = spans.join(freq, "gh")

    report = joined.groupBy("doc_id").agg(
        F.max("n_tokens").alias("n_tokens"),  # constant per doc
        F.count(F.lit(1)).alias("n_spans"),
        F.count(F.when(F.col("n") > 1, F.lit(1))).alias("n_dup_spans"),
    )

    dup = joined.where(F.col("n") > 1).select("doc_id", "pos")
    w_prev = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(Window.unboundedPreceding, -1)
    prev_end = F.max(F.col("pos") + _W).over(w_prev)
    isl = dup.select(
        "doc_id",
        "pos",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), F.lit(1)).otherwise(F.lit(0)).alias("brk"),
    )
    w_run = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    isl2 = isl.select("doc_id", "pos", F.sum("brk").over(w_run).alias("island"))
    cov = isl2.groupBy("doc_id", "island").agg((F.max("pos") + _W - F.min("pos")).alias("c"))
    covdoc = cov.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("dup_tokens"))

    return report.join(covdoc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "n_spans",
        "n_dup_spans",
        F.coalesce("dup_tokens", F.lit(0).cast("bigint")).alias("dup_tokens"),
        (F.coalesce("dup_tokens", F.lit(0).cast("bigint")).cast("double") / F.col("n_tokens")).alias(
            "dup_frac"
        ),
    )


# Bloom geometry. 63 usable bits per BIGINT word keeps every mask positive
# (bit 63 would flip the sign — defined identically in both engines, but the
# positive range needs no reasoning about it). 4 words x 63 bits with ~100
# set bits puts the filter in a measurable false-positive regime at test SF
# (fill ~1/3, fp ~= fill^3 ~= 4%); production sizes m for the target fp rate
# (m/n ~= 14 bits/key for 0.1%) — geometry is three constants, the plan
# shape never changes.
BLOOM_WORDS = 4
BLOOM_BPW = 63
BLOOM_K = 3
_M = BLOOM_WORDS * BLOOM_BPW


# Entity-resolution parameters: part names are short (7-12 chars), so the
# Ed-Join bound runs at q=2 / lev<=1 — signature = 3 rarest bigrams, bound
# vacuous below 4 chars. Exact-duplicate names never reach the quadratic
# stage at all: records canonicalize to distinct names first (the
# production-scale trick — candidate generation runs on |distinct names|,
# not |records|).
ER_Q = 2
ER_LEV = 1
ER_SIG = ER_LEV * ER_Q + 1
ER_MIN_LEN = ER_Q + ER_LEV * ER_Q


@register(
    "entity_resolution_e2e",
    oracle=f"""
    WITH RECURSIVE names AS (SELECT p_partkey AS key, p_name AS name FROM part),
    dn AS (SELECT name, MIN(key) AS rep FROM names GROUP BY name),
    eligible AS (SELECT * FROM dn WHERE length(name) >= {ER_MIN_LEN}),
    grams AS (
      SELECT DISTINCT rep, g FROM (
        SELECT rep, UNNEST(list_transform(range(1, length(name)),
               i -> substr(name, i, {ER_Q}))) AS g
        FROM eligible
      ) t(rep, g)
    ),
    freq AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY g),
    sig AS (
      SELECT rep, g FROM (
        SELECT gr.rep, gr.g,
               ROW_NUMBER() OVER (PARTITION BY gr.rep ORDER BY f.df, gr.g) AS rn
        FROM grams gr JOIN freq f USING (g)
      ) WHERE rn <= {ER_SIG}
    ),
    cand AS (SELECT DISTINCT a.rep AS ra, b.rep AS rb
             FROM sig a JOIN sig b ON a.g = b.g AND a.rep < b.rep),
    ver AS (
      SELECT c.ra, c.rb
      FROM cand c JOIN eligible ea ON ea.rep = c.ra
                  JOIN eligible eb ON eb.rep = c.rb
      WHERE abs(length(ea.name) - length(eb.name)) <= {ER_LEV}
        AND levenshtein(ea.name, eb.name) <= {ER_LEV}
    ),
    sym AS (SELECT ra AS u, rb AS v FROM ver UNION SELECT rb, ra FROM ver),
    reach(node, label) AS (
      SELECT u, u FROM sym
      UNION
      SELECT s.u, r.label FROM sym s JOIN reach r ON s.v = r.node
    ),
    comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
    ent AS (SELECT d.name, COALESCE(c.component, d.rep) AS entity_id
            FROM dn d LEFT JOIN comp c ON c.node = d.rep),
    recs AS (SELECT n.key, e.entity_id FROM names n JOIN ent e USING (name)),
    sizes AS (SELECT entity_id, COUNT(*) AS n_members FROM recs GROUP BY entity_id)
    SELECT r.key, r.entity_id, p.p_name AS canonical_name, s.n_members
    FROM recs r JOIN sizes s USING (entity_id)
    JOIN part p ON p.p_partkey = r.entity_id
    """,
    description="Record-linkage pipeline e2e over part records: canonicalize "
    "to distinct names -> Ed-Join bigram-signature candidates -> exact "
    "levenshtein<=1 verify -> connected components -> canonical entity + "
    "member count propagated back to every record",
    tags=("linkage", "clustering", "pipeline", "extension"),
)
def entity_resolution_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full entity-resolution shape every master-data pipeline runs:
    canonicalization, guaranteed-recall candidate generation (Ed-Join
    pigeonhole: one edit destroys at most Q bigrams, so names within
    ER_LEV edits share one of the ER_SIG rarest bigrams), exact
    verification, transitive closure into entities (the SoCC'14 star
    algorithm via `clusters.connected_components`), and propagation of the
    entity verdict back onto the record table.

    Scale: the quadratic candidate stage runs on DISTINCT names (64 here;
    dedup-before-block is the standard production reduction) while the
    record table only ever does keyed joins; closure is O(log n) rounds;
    the rarest-bigram signature keeps candidate blocks small as the name
    universe grows.
    """
    from .clusters import connected_components

    names = tbl(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("key"), F.col("p_name").alias("name")
    )
    dn = names.groupBy("name").agg(F.min("key").alias("rep"))
    eligible = dn.filter(F.length("name") >= ER_MIN_LEN)
    grams = eligible.select(
        "rep",
        F.explode(
            F.expr(
                f"transform(sequence(1, length(name) - {ER_Q - 1}), "
                f"i -> substring(name, i, {ER_Q}))"
            )
        ).alias("g"),
    ).distinct()
    freq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    sig = (
        grams.join(freq, "g")
        .withColumn("rn", F.row_number().over(Window.partitionBy("rep").orderBy("df", "g")))
        .filter(F.col("rn") <= ER_SIG)
        .select("rep", "g")
    )
    cand = (
        sig.select(F.col("rep").alias("ra"), "g")
        .join(sig.select(F.col("rep").alias("rb"), "g"), "g")
        .filter(F.col("ra") < F.col("rb"))
        .select("ra", "rb")
        .distinct()
    )
    ea = eligible.select(F.col("rep").alias("ra"), F.col("name").alias("name_a"))
    eb = eligible.select(F.col("rep").alias("rb"), F.col("name").alias("name_b"))
    ver = (
        cand.join(ea, "ra")
        .join(eb, "rb")
        .filter(F.abs(F.length("name_a") - F.length("name_b")) <= ER_LEV)
        .filter(F.levenshtein("name_a", "name_b") <= ER_LEV)
        .select("ra", "rb")
    )
    comp = connected_components(ver, src="ra", dst="rb")
    ent = dn.join(comp, dn.rep == comp.node, "left").select(
        "name", F.coalesce("component", "rep").alias("entity_id")
    )
    recs = names.join(ent, "name").select("key", "entity_id")
    sizes = recs.groupBy("entity_id").agg(F.count(F.lit(1)).alias("n_members"))
    canon = tbl(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("entity_id"), F.col("p_name").alias("canonical_name")
    )
    return (
        recs.join(sizes, "entity_id")
        .join(canon, "entity_id")
        .select("key", "entity_id", "canonical_name", "n_members")
    )


@register(
    "bloom_semi_filter",
    oracle=f"""
    WITH dim AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
    dimbits AS (
      SELECT ({h60_duck("CAST(k AS VARCHAR) || ':' || CAST(j AS VARCHAR)")}) % {_M} AS bitpos
      FROM dim, (SELECT UNNEST(range(0, {BLOOM_K})) AS j)
    ),
    bloom AS (
      SELECT bitpos // {BLOOM_BPW} AS word,
             BIT_OR(1::BIGINT << (bitpos % {BLOOM_BPW})) AS bits
      FROM dimbits GROUP BY 1
    ),
    probe AS (SELECT DISTINCT o_custkey AS k FROM orders),
    probebits AS (
      SELECT k, ({h60_duck("CAST(k AS VARCHAR) || ':' || CAST(j AS VARCHAR)")}) % {_M} AS bitpos
      FROM probe, (SELECT UNNEST(range(0, {BLOOM_K})) AS j)
    ),
    checks AS (
      SELECT p.k,
             CASE WHEN b.bits IS NOT NULL
                   AND (b.bits & (1::BIGINT << (p.bitpos % {BLOOM_BPW}))) != 0
                  THEN 1 ELSE 0 END AS hit
      FROM probebits p LEFT JOIN bloom b ON b.word = p.bitpos // {BLOOM_BPW}
    ),
    verdict AS (SELECT k, MIN(hit) AS pass FROM checks GROUP BY k),
    truth AS (SELECT p.k, CASE WHEN d.k IS NOT NULL THEN 1 ELSE 0 END AS member
              FROM probe p LEFT JOIN (SELECT DISTINCT k FROM dim) d USING (k))
    SELECT COUNT(*) AS n_probed,
           CAST(SUM(t.member) AS BIGINT) AS n_true,
           CAST(SUM(v.pass) AS BIGINT) AS n_pass_bloom,
           CAST(SUM(CASE WHEN v.pass = 1 AND t.member = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
           CAST(SUM(CASE WHEN v.pass = 0 AND t.member = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_missed,
           CASE WHEN COUNT(*) - SUM(t.member) > 0
                THEN CAST(SUM(CASE WHEN v.pass = 1 AND t.member = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(COUNT(*) - SUM(t.member) AS BIGINT)
                ELSE NULL END AS fp_rate
    FROM verdict v JOIN truth t USING (k)
    HAVING COUNT(*) > 0
    """,
    description="Runtime-filter pattern made verifiable: a 252-bit Bloom "
    "filter built from the dim side's join keys, broadcast-probed by the "
    "fact side; emits pass/true/false-positive/missed accounting (missed "
    "must be 0 — the no-false-negative invariant is part of the compare)",
    tags=("join", "bloom", "runtime-filter", "extension"),
)
def bloom_semi_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned semi-join (see module doc).

    Plan: the dim side's keys fold into <=4 (word, bits) rows via bit_or
    (map-side combined); the probe side joins that table BROADCAST on the
    word index, so the pre-shuffle pruning costs no exchange at all — the
    exact shape Spark's own runtime bloom filter injects, here explicit and
    cross-engine verified. At 100 TB the filter stays a few KB regardless
    of fact-side size; only n_bits scales with dim cardinality.
    """
    cust = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders")
    js = F.explode(F.expr(f"sequence(0, {BLOOM_K - 1})")).alias("j")
    _salted = "concat(CAST(k AS STRING), ':', CAST(j AS STRING))"
    bitpos = F.expr(f"{h60_spark(_salted)} % {_M}").alias("bitpos")

    dim = cust.where(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("k"))
    dimbits = dim.select("k", js).select(bitpos)
    bloom = dimbits.groupBy(F.expr(f"bitpos div {BLOOM_BPW}").alias("word")).agg(
        F.expr(f"bit_or(shiftleft(CAST(1 AS BIGINT), CAST(bitpos % {BLOOM_BPW} AS INT)))").alias("bits")
    )

    probe = orders.select(F.col("o_custkey").alias("k")).distinct()
    probebits = probe.select("k", js).select("k", bitpos)
    checks = probebits.join(
        F.broadcast(bloom), F.expr(f"word = bitpos div {BLOOM_BPW}"), "left"
    ).select(
        "k",
        F.when(
            F.col("bits").isNotNull()
            & (
                F.col("bits").bitwiseAND(
                    F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(bitpos % {BLOOM_BPW} AS INT))")
                )
                != 0
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("hit"),
    )
    verdict = checks.groupBy("k").agg(F.min("hit").alias("pass"))
    truth = probe.join(F.broadcast(dim.distinct().withColumn("member", F.lit(1))), "k", "left").select(
        "k", F.coalesce("member", F.lit(0)).alias("member")
    )
    joined = verdict.join(truth, "k")
    return joined.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum("member").alias("n_true"),
        F.sum("pass").alias("n_pass_bloom"),
        F.sum(F.when((F.col("pass") == 1) & (F.col("member") == 0), 1).otherwise(0)).alias(
            "n_false_pos"
        ),
        F.sum(F.when((F.col("pass") == 0) & (F.col("member") == 1), 1).otherwise(0)).alias(
            "n_missed"
        ),
        F.when(
            F.count(F.lit(1)) - F.sum("member") > 0,
            F.sum(F.when((F.col("pass") == 1) & (F.col("member") == 0), 1).otherwise(0)).cast(
                "double"
            )
            / (F.count(F.lit(1)) - F.sum("member")),
        ).alias("fp_rate"),
    ).where(F.col("n_probed") > 0)
