"""Round 4 additions, part 9: t-closeness privacy audit, model-calibration
ECE, corpus BPE encoding with a fixed trained vocabulary.

- ``t_closeness_audit`` — completes the privacy-audit trio beside
  ``k_anonymity_audit`` and ``l_diversity_audit``: per quasi-identifier
  group (mktsegment × nation), the total-variation distance between the
  group's sensitive-attribute distribution (account-balance bucket) and
  the global one. TVD is computed as an EXACT INTEGER numerator
  Σ_s |n_gs·n − n_s·n_g| (missing sensitive values contribute n_s·n_g via
  a micro-table cross of the group and sensitive totals), divided once:
  tvd = num / (2·n_g·n) — a single double op, bit-identical cross-engine.

- ``eval_calibration_ece`` — reliability diagram + expected calibration
  error for a scored classifier (hash-derived scores in 0..999/1000 and
  labels): 10 confidence bins, per-bin count/confidence/accuracy, and the
  global ECE folded to ONE division by the common-denominator identity
  ECE = Σ_b |1000·pos_b − Σscore_b| / (1000·N) — the per-bin numerators
  are exact BIGINTs, so no float accumulation order exists at all.

- ``bpe_encode_corpus`` — the APPLY side of the BPE story (trainer:
  ``bpe_train_rounds``; single step: ``bpe_merge_step``): encode every
  document with a FIXED 4-merge trained vocabulary (literal pairs — the
  deployed tokenizer artifact), via the proven doubled-separator replace
  chain (tokenizer4), then per-source token accounting: tokens before /
  after, merges applied, compression permille. Pure codegen string ops;
  the corpus never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import tbl
from .retrieval3 import _TOKS_DUCK, _TOKS_SPARK
from .tokenizer4 import _D_RS, _D_S, _D_SS, _RS, _S

# ---------------------------------------------------------------------------
# t_closeness_audit
# ---------------------------------------------------------------------------

_T_PERMILLE = 250  # flag groups farther than t = 0.25 from the global dist

# sensitive attribute: account-balance bucket (fixed thresholds)
_SENS_DUCK = "CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END"

_TCLOSE_ORACLE = f"""
WITH c AS (
  SELECT c_mktsegment AS seg, c_nationkey AS nat, {_SENS_DUCK} AS s
  FROM customer
  WHERE c_mktsegment IS NOT NULL AND c_nationkey IS NOT NULL AND c_acctbal IS NOT NULL
),
gs AS (SELECT seg, nat, s, COUNT(*) AS n_gs FROM c GROUP BY 1, 2, 3),
g AS (SELECT seg, nat, COUNT(*) AS n_g FROM c GROUP BY 1, 2),
sv AS (SELECT s, COUNT(*) AS n_s FROM c GROUP BY 1),
tot AS (SELECT COUNT(*) AS n FROM c),
grid AS (
  SELECT g.seg, g.nat, g.n_g, sv.s, sv.n_s, COALESCE(gs.n_gs, 0) AS n_gs
  FROM g CROSS JOIN sv
  LEFT JOIN gs ON gs.seg = g.seg AND gs.nat = g.nat AND gs.s = sv.s
)
SELECT seg, CAST(nat AS BIGINT) AS nat,
       CAST(MIN(n_g) AS BIGINT) AS n_g,
       CAST(SUM(ABS(n_gs * tot.n - n_s * n_g)) AS BIGINT) AS tvd_num,
       CAST(SUM(ABS(n_gs * tot.n - n_s * n_g)) AS DOUBLE)
         / (2.0 * MIN(n_g) * MIN(tot.n)) AS tvd,
       (1000 * SUM(ABS(n_gs * tot.n - n_s * n_g)))
         <= ({_T_PERMILLE} * 2 * MIN(n_g) * MIN(tot.n)) AS within_t
FROM grid CROSS JOIN tot
GROUP BY 1, 2
"""


@register(
    "t_closeness_audit",
    oracle=_TCLOSE_ORACLE,
    description="t-closeness privacy audit (completes k-anonymity / "
    "l-diversity): per QI group, total-variation distance of the sensitive "
    "balance-bucket distribution vs global — exact integer numerator over a "
    "micro-table grid, one double division, integer-arithmetic t flag",
    tags=("privacy", "audit", "statistics", "extension"),
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    sens = F.when(F.col("c_acctbal") < 0, "neg").when(
        F.col("c_acctbal") < 5000, "low"
    ).otherwise("high")
    c = (
        tbl(spark, sf_dir, "customer")
        .filter(
            F.col("c_mktsegment").isNotNull()
            & F.col("c_nationkey").isNotNull()
            & F.col("c_acctbal").isNotNull()
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.col("c_nationkey").alias("nat"),
            sens.alias("s"),
        )
    )
    gs = c.groupBy("seg", "nat", "s").agg(F.count(F.lit(1)).alias("n_gs"))
    g = c.groupBy("seg", "nat").agg(F.count(F.lit(1)).alias("n_g"))
    sv = c.groupBy("s").agg(F.count(F.lit(1)).alias("n_s"))
    tot = c.agg(F.count(F.lit(1)).alias("n"))
    grid = (
        g.crossJoin(F.broadcast(sv))
        .join(gs, ["seg", "nat", "s"], "left")
        .withColumn("n_gs", F.coalesce(F.col("n_gs"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    term = F.abs(F.col("n_gs") * F.col("n") - F.col("n_s") * F.col("n_g"))
    return grid.groupBy("seg", F.col("nat").cast("long").alias("nat")).agg(
        F.min("n_g").cast("long").alias("n_g"),
        F.sum(term).cast("long").alias("tvd_num"),
        (
            F.sum(term).cast("double")
            / (F.lit(2.0) * F.min("n_g") * F.min("n"))
        ).alias("tvd"),
        (
            (F.lit(1000) * F.sum(term))
            <= (F.lit(_T_PERMILLE) * 2 * F.min("n_g") * F.min("n"))
        ).alias("within_t"),
    )


# ---------------------------------------------------------------------------
# eval_calibration_ece
# ---------------------------------------------------------------------------

_ECE_ORACLE = f"""
WITH preds AS (
  SELECT doc_id,
         {h60_duck("CAST(doc_id AS VARCHAR) || '|s'")} % 1000 AS score_m,
         CASE WHEN {h60_duck("CAST(doc_id AS VARCHAR) || '|l'")} % 3 = 0
              THEN 1 ELSE 0 END AS label
  FROM documents
),
bins AS (
  SELECT score_m // 100 AS bin, COUNT(*) AS n,
         SUM(score_m) AS s_sum, SUM(label) AS pos,
         ABS(1000 * SUM(label) - SUM(score_m)) AS gap_num
  FROM preds GROUP BY 1
),
tot AS (SELECT SUM(n) AS nn, SUM(gap_num) AS gn FROM bins)
SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n_preds,
       CAST(s_sum AS DOUBLE) / (1000 * n) AS confidence,
       CAST(pos AS DOUBLE) / n AS accuracy,
       CAST(gap_num AS BIGINT) AS gap_num,
       CAST(gn AS DOUBLE) / (1000 * nn) AS ece
FROM bins CROSS JOIN tot
"""


@register(
    "eval_calibration_ece",
    oracle=_ECE_ORACLE,
    description="Reliability diagram + expected calibration error: 10 "
    "confidence bins over hash-derived scores/labels; ECE folded to one "
    "double division via the common-denominator identity "
    "sum|1000*pos_b - sum_score_b| / (1000*N) — exact integer numerators",
    tags=("evaluation", "calibration", "statistics", "extension"),
)
def eval_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    preds = tbl(spark, sf_dir, "documents").select(
        (F.expr(h60_spark("CAST(doc_id AS STRING) || '|s'")) % 1000).alias("score_m"),
        F.when(
            F.expr(h60_spark("CAST(doc_id AS STRING) || '|l'")) % 3 == 0, 1
        )
        .otherwise(0)
        .alias("label"),
    )
    bins = preds.groupBy(F.expr("score_m div 100").alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("score_m").alias("s_sum"),
        F.sum("label").alias("pos"),
        F.abs(F.lit(1000) * F.sum("label") - F.sum("score_m")).alias("gap_num"),
    )
    tot = bins.agg(F.sum("n").alias("nn"), F.sum("gap_num").alias("gn"))
    return bins.crossJoin(F.broadcast(tot)).select(
        F.col("bin").cast("long").alias("bin"),
        F.col("n").cast("long").alias("n_preds"),
        (F.col("s_sum").cast("double") / (F.lit(1000) * F.col("n"))).alias("confidence"),
        (F.col("pos").cast("double") / F.col("n")).alias("accuracy"),
        F.col("gap_num").cast("long").alias("gap_num"),
        (F.col("gn").cast("double") / (F.lit(1000) * F.col("nn"))).alias("ece"),
    )


# ---------------------------------------------------------------------------
# bpe_encode_corpus
# ---------------------------------------------------------------------------

# The deployed tokenizer artifact: a fixed, ordered merge list (word-level
# symbols; the corpus vocabulary is word tokens, so merges join adjacent
# words exactly as bpe_train_rounds' learned winners do).
_MERGES = [("part", "filter"), ("order", "order"), ("data", "slow"), ("window", "join")]


def _encode_oracle() -> str:
    seq = f"{_D_SS} || array_to_string({_TOKS_DUCK}, {_D_SS}) || {_D_SS}"
    chain = "seq0"
    ctes = [
        f"d AS (SELECT COALESCE(source, '') AS source, len({_TOKS_DUCK}) AS n_before, "
        f"{seq} AS seq0 FROM documents WHERE text IS NOT NULL)"
    ]
    for i, (a, b) in enumerate(_MERGES, 1):
        ctes.append(
            f"m{i} AS (SELECT source, n_before, replace({chain}, "
            f"{_D_S} || '{a}' || {_D_SS} || '{b}' || {_D_S}, "
            f"{_D_S} || '{a}' || {_D_RS} || '{b}' || {_D_S}) AS seq{i} FROM "
            + (f"m{i - 1}" if i > 1 else "d")
            + ")"
        )
        chain = f"seq{i}"
    return (
        "WITH "
        + ", ".join(ctes)
        + f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_before) AS BIGINT) AS tokens_before,
       CAST(SUM(len({_duck_tokens_final()})) AS BIGINT) AS tokens_after,
       CAST(SUM(n_before) - SUM(len({_duck_tokens_final()})) AS BIGINT) AS merges_applied,
       CAST((1000 * SUM(len({_duck_tokens_final()}))) // SUM(n_before) AS BIGINT) AS compression_permille
FROM m{len(_MERGES)}
GROUP BY 1
HAVING SUM(n_before) > 0
"""
    )


def _duck_tokens_final() -> str:
    return f"list_filter(string_split(seq{len(_MERGES)}, {_D_S} || {_D_S}), t -> t <> '')"


@register(
    "bpe_encode_corpus",
    oracle=_encode_oracle(),
    description="BPE ENCODE with a fixed 4-merge trained vocabulary via the "
    "doubled-separator replace chain (tokenizer4's proven greedy-merge "
    "equivalence): per-source tokens before/after, merges applied, "
    "compression permille — pure codegen, the corpus never shuffles",
    tags=("tokenizer", "text", "llm", "extension"),
)
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        tbl(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            F.coalesce(F.col("source"), F.lit("")).alias("source"),
            F.size(F.expr(_TOKS_SPARK)).alias("n_before"),
            F.concat(
                F.lit(_S + _S),
                F.array_join(F.expr(_TOKS_SPARK), _S + _S),
                F.lit(_S + _S),
            ).alias("seq"),
        )
    )
    for a, b in _MERGES:
        d = d.withColumn(
            "seq",
            F.expr(
                f"replace(seq, '{_S}{a}{_S}{_S}{b}{_S}', '{_S}{a}{_RS}{b}{_S}')"
            ),
        )
    after = F.size(F.expr(f"filter(split(seq, '{_S}{_S}'), t -> t <> '')"))
    per_doc = d.select("source", "n_before", after.alias("n_after"))
    out = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_before").cast("long").alias("tokens_before"),
        F.sum("n_after").cast("long").alias("tokens_after"),
        (F.sum("n_before") - F.sum("n_after")).cast("long").alias("merges_applied"),
        F.expr("CAST((1000 * SUM(n_after)) div SUM(n_before) AS BIGINT)").alias(
            "compression_permille"
        ),
    )
    return out.filter(F.col("tokens_before") > 0)
