"""Containment (subset-duplicate) detection, round 3 (appended).

``dedup_containment_kmv``: the third near-dup geometry, after symmetric
Jaccard (MinHash) and contiguous overlap (winnowing/exact-substring):
CONTAINMENT C(A→B) = |A∩B|/|A| finds documents swallowed by a larger
one (quote-plus-commentary, boilerplate-wrapped reposts) that Jaccard
misses — a small doc inside a big one has tiny Jaccard but containment
≈ 1. Pipeline, every stage hash-deterministic and oracle-replicated:

1. informative token sets: per-doc DISTINCT tokens, minus tokens whose
   document frequency exceeds ``CONT_DF_CAP`` (broadcast anti-join — the
   same hot-key guard family as the shingle/band caps; stopwords both
   blow up candidate generation and carry no containment signal);
2. bottom-k signature: each doc's ``CONT_K`` smallest tokens by portable
   hash (per-doc window — partitioned, bounded);
3. candidate generation: a signature token of A found in B's full token
   set (inverted-index join on the token key) with the per-pair match
   count m — cost ∝ K·df, never |A|·|B|;
4. estimate: m/k_eff (k_eff = min(K, |A|)) — the bottom-k containment
   estimator; pairs above half the final threshold go to
5. exact verify: |A∩B| by joining the two capped token sets, emit pairs
   with exact containment ≥ ``CONT_THRESH_PM``.

Direction matters and is preserved: (small_doc → big_doc) and its
reverse are independent rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import tbl
from .retrieval3 import _TOKS_DUCK, _TOKS_SPARK

CONT_K = 16  # bottom-k signature size
CONT_DF_CAP = 100  # tokens in more docs than this are uninformative
CONT_THRESH_PM = 800  # exact containment >= 0.8 to emit
_PRE_PM = CONT_THRESH_PM // 2  # estimator pre-filter at half threshold

_CONT_ORACLE = f"""
WITH toks0 AS (
  SELECT DISTINCT doc_id, UNNEST({_TOKS_DUCK}) AS tok
  FROM documents WHERE text IS NOT NULL
),
hot AS (
  SELECT tok FROM toks0 GROUP BY tok HAVING COUNT(*) > {CONT_DF_CAP}
),
toks AS (
  SELECT * FROM toks0 WHERE tok NOT IN (SELECT tok FROM hot)
),
sized AS (SELECT doc_id, COUNT(*) AS n_toks FROM toks GROUP BY doc_id),
sig AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, tok,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY {h60_duck('tok')}, tok) AS rn
    FROM toks
  ) WHERE rn <= {CONT_K}
),
m AS (
  SELECT s.doc_id AS a, t.doc_id AS b, COUNT(*) AS n_match
  FROM sig s JOIN toks t ON t.tok = s.tok AND t.doc_id <> s.doc_id
  GROUP BY s.doc_id, t.doc_id
),
est AS (
  SELECT m.a, m.b, n_match,
         LEAST({CONT_K}, sa.n_toks) AS k_eff
  FROM m JOIN sized sa ON sa.doc_id = m.a
  WHERE (1000 * n_match) // LEAST({CONT_K}, sa.n_toks) >= {_PRE_PM}
),
inter AS (
  SELECT e.a, e.b, COUNT(*) AS n_common
  FROM est e
  JOIN toks ta ON ta.doc_id = e.a
  JOIN toks tb ON tb.doc_id = e.b AND tb.tok = ta.tok
  GROUP BY e.a, e.b
)
SELECT i.a AS contained_doc, i.b AS container_doc,
       CAST(sa.n_toks AS BIGINT) AS n_toks_a,
       CAST(i.n_common AS BIGINT) AS n_common,
       CAST((1000 * i.n_common) // sa.n_toks AS BIGINT) AS containment_pm
FROM inter i JOIN sized sa ON sa.doc_id = i.a
WHERE (1000 * i.n_common) // sa.n_toks >= {CONT_THRESH_PM}
"""


@register(
    "dedup_containment_kmv",
    oracle=_CONT_ORACLE,
    description=f"Directional containment dedup (|A∩B|/|A| >= {CONT_THRESH_PM} pm): "
    f"bottom-{CONT_K} signature candidates + exact verify over DF-capped tokens",
    tags=("dedup", "containment", "text", "extension"),
)
def dedup_containment_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset-duplicate detection (see module doc). Scale: the candidate
    join fans out K signature rows per doc against the DF-capped inverted
    index (each token's posting list is <= CONT_DF_CAP docs), the exact
    intersection touches only surviving pairs, and both the hot-token drop
    and the estimator pre-filter are the quadratic guards — the same cap
    family every dedup operator here uses."""
    toks0 = (
        tbl(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", F.explode(F.expr(_TOKS_SPARK)).alias("tok"))
        .distinct()
    )
    hot = (
        toks0.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > CONT_DF_CAP)
        .select("tok")
    )
    toks = toks0.join(F.broadcast(hot), "tok", "left_anti")
    sized = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_toks"))
    sig = (
        toks.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("doc_id").orderBy(F.expr(h60_spark("tok")), "tok")
            ),
        )
        .filter(F.col("rn") <= CONT_K)
        .select("doc_id", "tok")
    )
    m = (
        sig.alias("s")
        .join(
            toks.alias("t"),
            (F.col("t.tok") == F.col("s.tok")) & (F.col("t.doc_id") != F.col("s.doc_id")),
        )
        .groupBy(F.col("s.doc_id").alias("a"), F.col("t.doc_id").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_match"))
    )
    # `sized` is one row PER DOCUMENT — unbounded in corpus size, so it must
    # not carry a broadcast hint (AQE picks broadcast at test scale and a
    # shuffled join at warehouse scale on its own).
    est = (
        m.join(sized.withColumnRenamed("doc_id", "a"), "a")
        .withColumn("k_eff", F.least(F.lit(CONT_K), F.col("n_toks")))
        .filter(F.expr(f"(1000 * n_match) div k_eff >= {_PRE_PM}"))
        .select("a", "b")
    )
    ta = toks.select(F.col("doc_id").alias("a"), F.col("tok"))
    tb = toks.select(F.col("doc_id").alias("b"), F.col("tok"))
    inter = (
        est.join(ta, "a")
        .join(tb, ["b", "tok"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    out = (
        inter.join(sized.withColumnRenamed("doc_id", "a"), "a")
        .filter(F.expr(f"(1000 * n_common) div n_toks >= {CONT_THRESH_PM}"))
        .select(
            F.col("a").alias("contained_doc"),
            F.col("b").alias("container_doc"),
            F.col("n_toks").cast("long").alias("n_toks_a"),
            F.col("n_common").cast("long").alias("n_common"),
            F.expr("CAST((1000 * n_common) div n_toks AS BIGINT)").alias("containment_pm"),
        )
    )
    return out
