"""Multi-round BPE trainer, round 4 (appended).

``bpe_train_rounds`` runs THREE byte-pair-encoding trainer iterations
end-to-end — the iterative-text twin of ``kmeans_lloyd_rounds``: every
round's winning pair is DERIVED from the previous round's merged corpus,
so nondeterminism would compound, and the whole trajectory is verified
cross-engine (the oracle unrolls the rounds as CTEs).

The hard part is APPLYING a merge: greedy left-to-right non-overlapping
substitution over every document's token sequence, identically in Spark
and DuckDB. Neither engine has a list-building fold, but both have
leftmost-non-overlapping literal `replace`. Encoding the sequence with
DOUBLED separators makes string replace exactly equal greedy BPE:

    seq  = SS + t1 + SS + t2 + ... + SS        (SS = two U+001F chars)
    pat  = S + a + SS + b + S                  (one S from each boundary)
    repl = S + a + RS + b + S                  (RS = U+001E joins the pair)

Consecutive matches share a boundary PAIR, and the pattern consumes only
one separator from each side, so back-to-back (a,b) occurrences all merge
— including the repeated-token run case ('a a a a' merges floor(n/2)
times), matching the greedy scan. Merged symbols contain RS, so they are
new tokens that can participate in later rounds but never false-match.
(If a document token itself contained U+001F/U+001E both engines run the
IDENTICAL string algorithm, so parity still holds; the tokens come from a
space-split, making that practically impossible.)

Per round: one map-side pair explode + one map-side-combined count, a
1-row winner reduce (count DESC, pair lexicographic — the bpe_merge_step
tiebreak), and one broadcast-join + codegen replace over the corpus.
State per doc is one string; rounds never shuffle the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import tbl
from .retrieval3 import _TOKS_DUCK, _TOKS_SPARK

_ROUNDS = 3
_S = "\x1f"  # token separator (unit separator)
_RS = "\x1e"  # merged-symbol joiner (record separator)

# ---- DuckDB oracle: rounds unrolled as CTEs --------------------------------

_D_S = "chr(31)"
_D_RS = "chr(30)"
_D_SS = f"({_D_S} || {_D_S})"


def _duck_tokens(seq: str) -> str:
    return f"list_filter(string_split({seq}, {_D_S} || {_D_S}), t -> t <> '')"


def _duck_pairs_cte(src: str, n: int) -> str:
    """Per-doc adjacent pairs of round n from the seq column of CTE src."""
    return f"""p{n} AS (
  SELECT t.a AS a, t.b AS b FROM (
    SELECT UNNEST(list_transform(range(1, len(ts)),
                  i -> {{'a': ts[i], 'b': ts[i + 1]}})) AS t
    FROM (SELECT {_duck_tokens('seq')} AS ts FROM {src})
  )
),
w{n} AS (
  SELECT a, b, COUNT(*) AS c FROM p{n} GROUP BY a, b
  ORDER BY c DESC, a, b LIMIT 1
),
s{n} AS (
  SELECT doc_id,
         replace(seq, {_D_S} || w.a || {_D_SS} || w.b || {_D_S},
                      {_D_S} || w.a || {_D_RS} || w.b || {_D_S}) AS seq
  FROM {src} CROSS JOIN w{n} w
)"""


def _bpe_oracle() -> str:
    ctes = [
        f"""s0 AS (
  SELECT doc_id,
         {_D_SS} || list_aggregate(ts, 'string_agg', {_D_S} || {_D_S}) || {_D_SS} AS seq
  FROM (SELECT doc_id, {_TOKS_DUCK} AS ts FROM documents WHERE text IS NOT NULL)
  WHERE len(ts) > 0
)"""
    ]
    selects = []
    for r in range(1, _ROUNDS + 1):
        ctes.append(_duck_pairs_cte(f"s{r - 1}", r))
        selects.append(
            f"""SELECT {r} AS round, w.a AS merge_a, w.b AS merge_b,
       CAST(w.c AS BIGINT) AS pair_count,
       (SELECT CAST(SUM(len({_duck_tokens('seq')})) AS BIGINT) FROM s{r}) AS tokens_after
FROM w{r} w"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT * FROM (\n"
        + "\nUNION ALL\n".join(selects)
        + "\n) ORDER BY round"
    )


# ---- Spark implementation ---------------------------------------------------

_SS = _S + _S


def _spark_tokens(seq_col: str) -> str:
    return f"filter(split({seq_col}, '{_SS}'), t -> t <> '')"


@register(
    "bpe_train_rounds",
    oracle=_bpe_oracle(),
    description=f"{_ROUNDS}-round BPE trainer loop: each round's winning pair "
    "derived from the previous round's MERGED corpus (doubled-separator "
    "string replace == greedy non-overlapping merge, both engines); "
    "trajectory of (pair, count, corpus tokens) oracle-verified",
    tags=("text", "tokenizer", "iterative", "extension"),
)
def bpe_train_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE training (see module doc)."""
    docs = (
        tbl(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", F.expr(_TOKS_SPARK).alias("ts"))
        .where(F.size("ts") > 0)
    )
    state = docs.select(
        "doc_id",
        F.concat(
            F.lit(_SS), F.array_join("ts", _SS), F.lit(_SS)
        ).alias("seq"),
    )
    out = None
    for r in range(1, _ROUNDS + 1):
        toks = state.select(F.expr(_spark_tokens("seq")).alias("ts"))
        pairs = toks.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(ts) >= 2 THEN transform(sequence(1, size(ts) - 1), "
                    "i -> named_struct('a', ts[i - 1], 'b', ts[i])) END"
                )
            ).alias("p")
        ).select("p.a", "p.b")
        winner = (
            pairs.groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.col("c").desc(), "a", "b")
            .limit(1)
        )
        state = (
            state.crossJoin(F.broadcast(winner))
            .select(
                "doc_id",
                F.expr(
                    f"replace(seq, concat('{_S}', a, '{_SS}', b, '{_S}'), "
                    f"concat('{_S}', a, '{_RS}', b, '{_S}'))"
                ).alias("seq"),
                "a",
                "b",
                "c",
            )
        )
        # the per-round report row: winner + merged-corpus token count
        report = (
            state.agg(
                F.lit(r).alias("round"),
                F.first("a").alias("merge_a"),
                F.first("b").alias("merge_b"),
                F.first("c").cast("long").alias("pair_count"),
                F.sum(F.expr(f"size({_spark_tokens('seq')})"))
                .cast("long")
                .alias("tokens_after"),
            )
        )
        out = report if out is None else out.unionByName(report)
        state = state.select("doc_id", "seq")
        if r < _ROUNDS:
            # cut lineage growth across rounds (the clusters.py discipline)
            state = state.localCheckpoint(eager=False)
    return out.where(F.col("merge_a").isNotNull())
