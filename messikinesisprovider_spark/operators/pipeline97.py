"""Round 8 additions, part 7: weighted sampling without replacement.

``sample_weighted_topk_es`` (Efraimidis & Spirakis, IPL 2006 "Weighted
random sampling with a reservoir"): draw k=5 documents per source WITHOUT
replacement with probability proportional to weight (n_chars), via the
one-pass key trick — key_i = ln(u_i)/w_i with u_i uniform in (0,1), take
the k LARGEST keys. This is THE distributed weighted-sampling shape: the
key is computed map-side per row, the selection is a per-group top-k
window, partial top-ks merge associatively — no sequential reservoir, no
driver loop. The registry's ``sample_weighted_bernoulli`` is the
with-INDEPENDENT-inclusion twin; this one delivers exactly k per stratum.

u_i comes from the h60 hash of the doc_id (the deterministic-sampler
convention), so both engines draw the identical sample and the oracle
replays key computation, ranking and tiebreak bit-for-bit.

Reference parity note: the reference engine (SURVEY.md §0) has no
analytics surface; this extends the engine per the round brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .dedup import h60_duck, h60_spark
from .relational import tbl

_ES_K = 5
_ES_U_SCALE = "1152921504606846976.0"  # 2^60, the h60 range


def _es_key(u: str, w: str) -> str:
    """ln(u)/w — monotone transform of u^(1/w); larger is better."""
    return f"ln({u}) / ({w})"


_ES_SEED = "CONCAT('es:', doc_id)"
_ES_SPARK_U = f"(({h60_spark(_ES_SEED)}) + 0.5) / {_ES_U_SCALE}"
_ES_DUCK_U = f"(({h60_duck(_ES_SEED)}) + 0.5) / {_ES_U_SCALE}"

_ES_ORACLE = f"""
WITH keyed AS (
  SELECT source, doc_id, n_chars AS weight,
         {_es_key(_ES_DUCK_U, 'n_chars')} AS es_key
  FROM documents WHERE n_chars > 0
),
ranked AS (
  SELECT source, doc_id, weight, es_key,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY es_key DESC, doc_id) AS rk
  FROM keyed
)
SELECT source, doc_id, CAST(weight AS BIGINT) AS weight,
       CAST(ROUND(es_key, 6) AS DOUBLE) AS es_key, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= {_ES_K}
ORDER BY source, rk
"""


@register(
    "sample_weighted_topk_es",
    oracle=_ES_ORACLE,
    description=f"Efraimidis-Spirakis (IPL 2006) weighted sampling WITHOUT "
    f"replacement: exactly k={_ES_K} docs per source with inclusion "
    "proportional to n_chars, via the map-side key ln(u)/w and a per-group "
    "top-k window — the one-pass, merge-associative shape that replaces a "
    "sequential weighted reservoir at scale; h60-seeded so both engines "
    "draw the identical sample",
    tags=("sampling", "weighted", "extension"),
)
def sample_weighted_topk_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key computation is map-side codegen; the only shuffle is the
    per-source top-k window (at 100 TB: partial per-partition top-k via
    the same key merges associatively — Spark's window already prunes with
    a rank filter pushdown on the sort)."""
    from pyspark.sql import Window

    d = tbl(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    keyed = d.select(
        "source",
        "doc_id",
        F.col("n_chars").alias("weight"),
        F.expr(_es_key(_ES_SPARK_U, "n_chars")).alias("es_key"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("es_key"), F.asc("doc_id"))
    return (
        keyed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _ES_K)
        .select(
            "source",
            "doc_id",
            F.col("weight").cast("long").alias("weight"),
            F.round("es_key", 6).cast("double").alias("es_key"),
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("source", "rk")
    )
