"""Round 4 additions, part 37: perceptual image dedup and quantile-loss
forecast evaluation.

- ``image_ahash_dedup`` — the perceptual average-hash (aHash) image dedup
  a multimodal pipeline runs where exact byte equality is too strict:
  decode the FIMG clip, take the first 64 pixels as the 8x8 grid, set
  bit i iff 64*pixel_i > sum(pixels) (the mean comparison without a
  division), group by the 64-bit signature.  The REAL binary path — one
  Arrow-batched mapInPandas stage does decode + vectorized hash — while
  the INTEGER hash rule lets the DuckDB oracle replay the signature from
  ascii codes (docs pre-filtered to printable ASCII and >= 64 chars on
  both sides, the multimodal_audio_vad convention).  The signature is
  emitted as a 64-char bitstring (no BIGINT sign games); output is the
  duplicate clusters with member accounting — near-dup templates that
  differ only below the mean threshold collapse together, which is the
  point of a perceptual hash.

- ``forecast_pinball_loss`` — the quantile-loss readout that belongs
  next to ``forecast_backtest_snaive``'s point errors: pinball loss at
  q = 0.5 and q = 0.9 for the seasonal-naive per-(type, hour) forecast
  of the last day.  With q as the rational k/10, the per-cell loss
  scaled by 10 is max(k*(a-f), (k-10)*(a-f)) — EXACT integers in
  milli-events (the forecast is already integer-milli), so both quantile
  rows aggregate without a single float until the final display
  division.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from .relational import events_tbl, spread, tbl

_CK_MOD = 1000003

# ---------------------------------------------------------------------------
# image_ahash_dedup
# ---------------------------------------------------------------------------

_GRID = 64  # 8x8 pixels

_AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("ahash", T.StringType(), False),
    ]
)

_AHASH_ORACLE = f"""
WITH ascii_docs AS (
  SELECT doc_id, text FROM documents
  WHERE text IS NOT NULL AND regexp_full_match(text, '[\\x20-\\x7e]*')
    AND len(text) >= {_GRID}
),
px AS (
  SELECT doc_id, j, ascii(substr(text, CAST(j AS INT), 1)) AS p
  FROM ascii_docs CROSS JOIN UNNEST(range(1, {_GRID} + 1)) t(j)
),
tot AS (SELECT doc_id, SUM(p) AS s FROM px GROUP BY doc_id),
bits AS (
  SELECT px.doc_id,
         string_agg(CASE WHEN {_GRID} * px.p > t.s THEN '1' ELSE '0' END,
                    '' ORDER BY px.j) AS ahash
  FROM px JOIN tot t ON t.doc_id = px.doc_id
  GROUP BY px.doc_id
)
SELECT ahash,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS canonical_doc,
       CAST(SUM(doc_id % {_CK_MOD}) AS BIGINT) AS member_checksum
FROM bits
GROUP BY ahash
HAVING COUNT(*) > 1
"""


@register(
    "image_ahash_dedup",
    oracle=_AHASH_ORACLE,
    description="Perceptual average-hash image dedup over the REAL binary "
    "path: FIMG decode + vectorized 8x8 aHash in one mapInPandas stage; "
    "bit i = 64*pixel_i > sum(pixels) — the mean comparison as exact "
    "integers, so the oracle replays the signature from ascii codes; "
    "64-char bitstring signature, duplicate clusters with member "
    "accounting",
    tags=("multimodal", "dedup", "mapinpandas", "extension"),
)
def image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .multimodal import synthesize_image_column

    docs = (
        tbl(spark, sf_dir, "documents")
        .filter(
            F.col("text").isNotNull()
            & F.col("text").rlike(r"^[\x20-\x7e]*$")
            & (F.length("text") >= _GRID)
        )
        .select("doc_id", "text")
    )
    images = synthesize_image_column(spread(docs))

    def ahash(batches):
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["image"]):
                px = np.frombuffer(bytes(buf)[9:], dtype=np.uint8)[:_GRID].astype(np.int64)
                s = int(px.sum())
                bits = (_GRID * px > s).astype(np.uint8)
                ids.append(doc_id)
                hashes.append("".join("1" if b else "0" for b in bits))
            yield pd.DataFrame({"doc_id": ids, "ahash": hashes})

    sigs = images.mapInPandas(ahash, schema=_AHASH_SCHEMA)
    return (
        sigs.groupBy("ahash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("canonical_doc"),
            F.sum(F.col("doc_id") % _CK_MOD).cast("long").alias("member_checksum"),
        )
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# forecast_pinball_loss
# ---------------------------------------------------------------------------

_PINBALL_ORACLE = """
WITH ev AS (
  SELECT event_type, hour(ts) AS hr, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events WHERE ts IS NOT NULL
),
bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
cells AS (
  SELECT event_type, hr,
         SUM(CASE WHEN day < d1 THEN 1 ELSE 0 END) AS hist_total,
         SUM(CASE WHEN day = d1 THEN 1 ELSE 0 END) AS actual,
         datediff('day', d0, d1) AS n_hist_days
  FROM ev CROSS JOIN bounds
  GROUP BY event_type, hr, datediff('day', d0, d1)
),
scored AS (
  SELECT event_type, hr,
         (1000 * hist_total) // n_hist_days AS f_milli,
         1000 * actual AS a_milli
  FROM cells WHERE n_hist_days > 0
),
q AS (SELECT UNNEST([5, 9]) AS k),
losses AS (
  SELECT q.k, s.event_type,
         GREATEST(q.k * (a_milli - f_milli), (q.k - 10) * (a_milli - f_milli))
           AS loss_x10_milli
  FROM scored s CROSS JOIN q
)
SELECT CAST(k AS BIGINT) AS quantile_x10,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(loss_x10_milli) AS BIGINT) AS pinball_x10_milli,
       CAST(SUM(loss_x10_milli) AS DOUBLE) / (10000.0 * COUNT(*)) AS mean_pinball
FROM losses
GROUP BY k, event_type
"""


@register(
    "forecast_pinball_loss",
    oracle=_PINBALL_ORACLE,
    description="Pinball (quantile) loss at q=0.5 and q=0.9 for the "
    "seasonal-naive per-(type,hour) forecast of the last day: with q the "
    "rational k/10 the loss scaled by 10 is max(k*(a-f), (k-10)*(a-f)) — "
    "exact integers in milli-events end to end, one display division; "
    "the quantile-eval companion to forecast_backtest_snaive",
    tags=("analytics", "forecast", "evaluation", "extension"),
)
def forecast_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        events_tbl(spark, sf_dir)
        .filter(F.col("ts").isNotNull())
        .select(
            "event_type",
            F.hour("ts").alias("hr"),
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
    )
    bounds = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cells = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("event_type", "hr", F.datediff("d1", "d0").alias("n_hist_days"))
        .agg(
            F.sum(F.when(F.col("day") < F.col("d1"), 1).otherwise(0)).alias("hist_total"),
            F.sum(F.when(F.col("day") == F.col("d1"), 1).otherwise(0)).alias("actual"),
        )
        .filter(F.col("n_hist_days") > 0)
    )
    scored = cells.select(
        "event_type",
        "hr",
        F.expr("(1000 * hist_total) DIV n_hist_days").alias("f_milli"),
        (1000 * F.col("actual")).alias("a_milli"),
    )
    losses = scored.select(
        "event_type",
        F.explode(F.array(F.lit(5), F.lit(9))).alias("k"),
        "f_milli",
        "a_milli",
    ).select(
        "k",
        "event_type",
        F.greatest(
            F.col("k") * (F.col("a_milli") - F.col("f_milli")),
            (F.col("k") - 10) * (F.col("a_milli") - F.col("f_milli")),
        ).alias("loss_x10_milli"),
    )
    return losses.groupBy(
        F.col("k").cast("long").alias("quantile_x10"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("loss_x10_milli").cast("long").alias("pinball_x10_milli"),
        (F.sum("loss_x10_milli").cast("double") / (10000.0 * F.count(F.lit(1)))).alias(
            "mean_pinball"
        ),
    )
