"""Round 4 additions, part 23: malformed-record quarantine and the
late-arriving dimension pattern.

- ``ingest_jsonl_quarantine`` — the ingestion contract no earlier format
  query exercised: MALFORMED input.  A JSONL export is written with a
  deterministic fraction of lines corrupted (doc_id % 13 == 0 becomes an
  unterminated object that still embeds the id), then read back in
  PERMISSIVE mode with ``columnNameOfCorruptRecord``: good rows verify
  per-source integrity as usual, corrupt rows land in the quarantine
  bucket with their ids RECOVERED from the raw corrupt text — so the
  oracle (on the original parquet) can verify exactly which rows were
  quarantined, not just how many.  One scan, one groupBy; the quarantine
  key is derived per-row (a NULL-source valid doc is NOT confused with a
  corrupt row — membership is decided by ``_corrupt_record``, not by
  field nullness).

- ``late_arriving_dim_resolution`` — the warehouse early-arriving-fact
  pattern: facts join a dimension where ~10% of members arrive in a
  later batch and a subset never arrives.  Phase 1 left-joins the
  on-time dimension and synthesizes inferred members for misses; phase 2
  re-resolves against the late batch.  Per-priority accounting (facts,
  resolved-initial, inferred, recovered-late, never-resolved + inferred-
  key checksum) verifies every transition.  Both joins are shuffled
  equi-joins — a 10%-of-dimension miss set must not be assumed
  broadcastable at 100 TB (the gdpr_delete_propagation rule).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import tbl

# ---------------------------------------------------------------------------
# ingest_jsonl_quarantine
# ---------------------------------------------------------------------------

_CORRUPT_MOD = 13
_QUAR_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint, "
    "_corrupt_record string"
)

_QUAR: dict[tuple[int, str], str] = {}


def ensure_jsonl_corrupted(spark: SparkSession, sf_dir: str) -> str:
    """Export (once per session+sf) documents as JSONL with every
    (doc_id % 13 == 0) line replaced by an unterminated JSON object that
    still embeds the id — the deterministic malformed fixture."""
    key = (id(spark), sf_dir)
    if key in _QUAR and os.path.isdir(_QUAR[key]):
        return _QUAR[key]
    out = os.path.join(tempfile.mkdtemp(prefix="docs_jsonl_bad_"), "documents")
    d = tbl(spark, sf_dir, "documents")
    line = F.when(
        F.col("doc_id") % _CORRUPT_MOD == 0,
        F.concat(F.lit('{"broken": '), F.col("doc_id").cast("string")),
    ).otherwise(F.to_json(F.struct("doc_id", "text", "lang", "source", "n_chars")))
    d.select(line.alias("value")).write.mode("overwrite").text(out)
    _QUAR[key] = out
    return out


_QUAR_ORACLE = f"""
SELECT CASE WHEN doc_id % {_CORRUPT_MOD} = 0 THEN '<quarantine>'
            ELSE COALESCE(source, '<null>') END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
       CAST(SUM(CASE WHEN doc_id % {_CORRUPT_MOD} = 0 THEN 0
                     ELSE COALESCE(length(text), 0) END) AS BIGINT) AS char_checksum
FROM documents
GROUP BY 1
"""


@register(
    "ingest_jsonl_quarantine",
    oracle=_QUAR_ORACLE,
    description="Malformed-record quarantine: JSONL with a deterministic "
    "corrupt fraction read in PERMISSIVE mode with a corrupt-record "
    "column; quarantined ids are RECOVERED from the raw corrupt text so "
    "the oracle verifies WHICH rows failed, not just how many; one scan, "
    "one groupBy, corrupt membership decided by _corrupt_record (never "
    "confused with valid NULL-field rows)",
    tags=("ingest", "dq", "jsonl", "extension"),
)
def ingest_jsonl_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = ensure_jsonl_corrupted(spark, sf_dir)
    docs = (
        spark.read.schema(_QUAR_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(root)
    )
    bad = F.col("_corrupt_record").isNotNull()
    bucket = F.when(bad, F.lit("<quarantine>")).otherwise(
        F.coalesce(F.col("source"), F.lit("<null>"))
    )
    # the corrupt line is '{"broken": <id>' — recover the id from char 12
    recovered = F.expr("CAST(substr(_corrupt_record, 12) AS BIGINT)")
    return docs.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(bad, recovered).otherwise(F.col("doc_id")))
        .cast("long")
        .alias("id_checksum"),
        F.sum(F.when(bad, 0).otherwise(F.coalesce(F.length("text"), F.lit(0))))
        .cast("long")
        .alias("char_checksum"),
    )


# ---------------------------------------------------------------------------
# late_arriving_dim_resolution
# ---------------------------------------------------------------------------

# dimension arrival split: custkey % 10 == 3 arrives late, and of those
# the % 3 == 0 subset never arrives at all
_LATE_PRED = "c_custkey % 10 = 3"
_NEVER_PRED = "c_custkey % 10 = 3 AND c_custkey % 3 = 0"

_LATE_ORACLE = f"""
WITH ontime AS (SELECT c_custkey FROM customer WHERE NOT ({_LATE_PRED})),
late AS (SELECT c_custkey FROM customer WHERE ({_LATE_PRED}) AND NOT ({_NEVER_PRED})),
facts AS (
  SELECT o_orderpriority AS priority, o_custkey,
         EXISTS (SELECT 1 FROM ontime d WHERE d.c_custkey = o_custkey) AS hit1
  FROM orders
),
phase2 AS (
  SELECT priority, o_custkey, hit1,
         (NOT hit1) AND EXISTS (SELECT 1 FROM late d WHERE d.c_custkey = o_custkey) AS hit2
  FROM facts
)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n_facts,
       CAST(COUNT(*) FILTER (WHERE hit1) AS BIGINT) AS n_resolved_initial,
       CAST(COUNT(*) FILTER (WHERE NOT hit1) AS BIGINT) AS n_inferred,
       CAST(COUNT(*) FILTER (WHERE hit2) AS BIGINT) AS n_recovered_late,
       CAST(COUNT(*) FILTER (WHERE NOT hit1 AND NOT hit2) AS BIGINT) AS n_never_resolved,
       CAST(COALESCE(SUM(o_custkey) FILTER (WHERE NOT hit1), 0) AS BIGINT) AS inferred_key_checksum
FROM phase2
GROUP BY priority
"""


@register(
    "late_arriving_dim_resolution",
    oracle=_LATE_ORACLE,
    description="Late-arriving dimension (early-arriving fact) pattern: "
    "phase-1 left join against the on-time dimension synthesizes inferred "
    "members, phase-2 re-resolves against the late batch, a never-arriving "
    "subset stays inferred; per-priority transition accounting + inferred-"
    "key checksum; both joins shuffled equi-joins (a 10% miss set is not "
    "broadcastable at 100 TB)",
    tags=("lakeops", "warehouse", "join", "extension"),
)
def late_arriving_dim_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tbl(spark, sf_dir, "customer")
    ontime = cust.filter(~F.expr(_LATE_PRED)).select("c_custkey")
    late = cust.filter(F.expr(_LATE_PRED) & ~F.expr(_NEVER_PRED)).select(
        F.col("c_custkey").alias("late_key")
    )
    facts = tbl(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"), "o_custkey"
    )
    p1 = facts.join(
        ontime.withColumn("hit1", F.lit(True)),
        facts.o_custkey == ontime.c_custkey,
        "left",
    ).select("priority", "o_custkey", F.coalesce(F.col("hit1"), F.lit(False)).alias("hit1"))
    p2 = p1.join(
        late.withColumn("hit2x", F.lit(True)),
        p1.o_custkey == late.late_key,
        "left",
    ).select(
        "priority",
        "o_custkey",
        "hit1",
        (~F.col("hit1") & F.coalesce(F.col("hit2x"), F.lit(False))).alias("hit2"),
    )
    return p2.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_facts"),
        F.count(F.when(F.col("hit1"), 1)).cast("long").alias("n_resolved_initial"),
        F.count(F.when(~F.col("hit1"), 1)).cast("long").alias("n_inferred"),
        F.count(F.when(F.col("hit2"), 1)).cast("long").alias("n_recovered_late"),
        F.count(F.when(~F.col("hit1") & ~F.col("hit2"), 1)).cast("long").alias(
            "n_never_resolved"
        ),
        F.coalesce(F.sum(F.when(~F.col("hit1"), F.col("o_custkey"))), F.lit(0))
        .cast("long")
        .alias("inferred_key_checksum"),
    )
