"""Round 4 additions, part 11: SPC control chart, Arrow-native batch stage.

- ``spc_control_chart`` — the classic XmR (individuals + moving range)
  statistical-process-control chart per event type over the DAILY TOTAL
  series: moving range MR_d = |x_d - x_{d-1}| (lag window PARTITIONED by
  type), control limits mean(x) ± 2.66 · mean(MR) (the standard XmR
  constant), and the out-of-control count. Daily totals and moving
  ranges stay DECIMAL-exact end-to-end; the only doubles are the two
  mean divisions and the limit comparisons — a shared IEEE tree.
  Complements the anomaly family (MAD flags an observation against a
  robust global; CUSUM detects level shifts; XmR pins the process-control
  limits practitioners actually chart).

- ``arrow_batch_hash`` — the ``mapInArrow`` twin of the mapInPandas
  decode stages: per-document digest of the raw payload bytes computed in
  Python over zero-copy Arrow RecordBatches (the lowest-overhead Python
  hook Spark has — no pandas materialization), then reduced to per-source
  accounting with an order-free digest checksum (portable 60-bit prefix
  sum). The oracle hashes the same utf-8 bytes with DuckDB's md5, so the
  compare proves batch boundaries never leak into row results.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import register
from .relational import events_tbl, spread, tbl

# ---------------------------------------------------------------------------
# spc_control_chart
# ---------------------------------------------------------------------------

_XMR_K = "2.66"  # the XmR individuals-chart constant (d2 = 1.128 based)

_SPC_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(18,6))) AS x
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
),
mr AS (
  SELECT event_type, day, x,
         ABS(x - LAG(x) OVER (PARTITION BY event_type ORDER BY day)) AS mrange
  FROM daily
),
lim AS (
  SELECT event_type,
         COUNT(*) AS n_days,
         CAST(SUM(x) AS DOUBLE) / COUNT(*) AS mean_x,
         CASE WHEN COUNT(mrange) > 0
              THEN CAST(SUM(mrange) AS DOUBLE) / COUNT(mrange) END AS mean_mr
  FROM mr GROUP BY 1
)
SELECT m.event_type,
       CAST(MIN(l.n_days) AS BIGINT) AS n_days,
       MIN(l.mean_x) AS mean_x,
       MIN(l.mean_mr) AS mean_mr,
       MIN(l.mean_x + {_XMR_K} * l.mean_mr) AS ucl,
       MIN(l.mean_x - {_XMR_K} * l.mean_mr) AS lcl,
       CAST(SUM(CASE WHEN l.mean_mr IS NOT NULL
                AND (CAST(m.x AS DOUBLE) > l.mean_x + {_XMR_K} * l.mean_mr
                     OR CAST(m.x AS DOUBLE) < l.mean_x - {_XMR_K} * l.mean_mr)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM mr m JOIN lim l ON l.event_type = m.event_type
GROUP BY 1
"""


@register(
    "spc_control_chart",
    oracle=_SPC_ORACLE,
    description="XmR statistical-process-control chart per event type over "
    "daily decimal-exact totals: moving range via a partitioned lag window, "
    "limits mean(x) +/- 2.66*mean(MR), out-of-control count — the process-"
    "control complement to the MAD/CUSUM anomaly family",
    tags=("timeseries", "anomaly", "spc", "extension"),
)
def spc_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        events_tbl(spark, sf_dir)
        .filter(
            F.col("ts").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("value").isNotNull()
        )
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("x"))
    )
    w = W.partitionBy("event_type").orderBy("day")
    mr = daily.withColumn("mrange", F.abs(F.col("x") - F.lag("x").over(w)))
    lim = mr.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        (F.sum("x").cast("double") / F.count(F.lit(1))).alias("mean_x"),
        F.when(
            F.count("mrange") > 0,
            F.sum("mrange").cast("double") / F.count("mrange"),
        ).alias("mean_mr"),
    )
    k = F.expr(_XMR_K)
    joined = mr.join(F.broadcast(lim), "event_type")
    viol = F.when(
        F.col("mean_mr").isNotNull()
        & (
            (F.col("x").cast("double") > F.col("mean_x") + k * F.col("mean_mr"))
            | (F.col("x").cast("double") < F.col("mean_x") - k * F.col("mean_mr"))
        ),
        1,
    ).otherwise(0)
    return joined.groupBy("event_type").agg(
        F.min("n_days").cast("long").alias("n_days"),
        F.min("mean_x").alias("mean_x"),
        F.min("mean_mr").alias("mean_mr"),
        F.min(F.col("mean_x") + k * F.col("mean_mr")).alias("ucl"),
        F.min(F.col("mean_x") - k * F.col("mean_mr")).alias("lcl"),
        F.sum(viol).cast("long").alias("n_violations"),
    )


# ---------------------------------------------------------------------------
# arrow_batch_hash
# ---------------------------------------------------------------------------

_ARROW_SCHEMA = "source string, doc_id bigint, digest string, n_bytes bigint"


def _arrow_hash_batches(batches):  # Iterator[pa.RecordBatch] -> same
    import pyarrow as pa

    for batch in batches:
        sources = batch.column("source").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        digests = [hashlib.md5(p).hexdigest() for p in payloads]
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(sources, pa.string()),
                pa.array(ids, pa.int64()),
                pa.array(digests, pa.string()),
                pa.array([len(p) for p in payloads], pa.int64()),
            ],
            names=["source", "doc_id", "digest", "n_bytes"],
        )


_ARROW_ORACLE = """
SELECT COALESCE(source, '') AS source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_digests,
       CAST(SUM(('0x' || substr(md5(text), 1, 15))::BIGINT % 1000003) AS BIGINT) AS digest_checksum
FROM documents
WHERE text IS NOT NULL
GROUP BY 1
"""


@register(
    "arrow_batch_hash",
    oracle=_ARROW_ORACLE,
    description="mapInArrow payload digest stage (zero-copy Arrow batches, "
    "no pandas materialization): per-doc md5 of the utf-8 bytes, reduced to "
    "per-source counts, byte totals and an order-free modular digest "
    "checksum — proves Arrow batch boundaries never leak into row results",
    tags=("multimodal", "arrow", "udf-surface", "extension"),
)
def arrow_batch_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(
        tbl(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    ).select(
        F.coalesce(F.col("source"), F.lit("")).alias("source"),
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
    )
    hashed = d.mapInArrow(_arrow_hash_batches, schema=_ARROW_SCHEMA)
    return hashed.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.count_distinct("digest").cast("long").alias("n_distinct_digests"),
        F.sum(F.expr("CAST(conv(substr(digest, 1, 15), 16, 10) AS BIGINT) % 1000003"))
        .cast("long")
        .alias("digest_checksum"),
    )
