"""Round 4 additions, part 3: lakehouse compaction planning and
frame-level multimodal dedup.

- ``small_file_compaction_plan`` — the table-maintenance planner every
  lakehouse runs nightly: the day-partitioned event counts (a |days|-row
  micro-table after one map-side-combined aggregate) are greedily packed
  into compaction groups of ~``_TARGET_ROWS`` rows by an exclusive
  running sum (day-level theta join — the `user_growth_curve` shape, no
  global-ordered window), and the output is the plan a compactor would
  execute: per group, its day range, file/day count and row total. The
  expensive part (counting) is one scan; the planning arithmetic runs on
  the micro-table.

- ``multimodal_frame_dedup`` — frame-level dedup across the video corpus:
  the REAL binary pipeline (synthesize_video_column → mapInPandas
  sample_frames, frame_len chosen so frames repeat with period 4 within a
  doc — intra-doc duplication is present by construction) feeds an exact
  hash-groupBy dedup; the top duplicated frames come back as hex. The
  oracle derives every frame's hex directly from the container arithmetic
  (substrings of repeat(md5(text))), so the whole mapInPandas + dedup
  path is hash-verified. The production analog: frame fingerprints from
  decoded video, deduplicated corpus-wide before feature extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import events_tbl, tbl

# ---------------------------------------------------------------------------
# small_file_compaction_plan
# ---------------------------------------------------------------------------

_TARGET_ROWS = 4000  # compaction group target (~one healthy file at test SF)

_COMPACT_ORACLE = f"""
WITH days AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_rows
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1
),
run AS (
  SELECT a.day, a.n_rows,
         COALESCE((SELECT SUM(b.n_rows) FROM days b WHERE b.day < a.day), 0) AS before
  FROM days a
),
grp AS (
  SELECT day, n_rows, before // {_TARGET_ROWS} AS group_id FROM run
)
SELECT CAST(group_id AS BIGINT) AS group_id,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(MIN(day) AS TIMESTAMP) AS first_day,
       CAST(MAX(day) AS TIMESTAMP) AS last_day,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows
FROM grp GROUP BY group_id
"""


@register(
    "small_file_compaction_plan",
    oracle=_COMPACT_ORACLE,
    description=f"Small-file compaction planner: day-partition row counts "
    f"packed into ~{_TARGET_ROWS}-row groups by exclusive running sum "
    "(micro-table theta join, no global window); per-group day range + totals",
    tags=("lakeops", "maintenance", "planning", "extension"),
)
def small_file_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = (
        events_tbl(spark, sf_dir)
        .filter(F.col("ts").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    a = days.alias("a")
    b = days.alias("b")
    run = (
        a.join(b, F.col("b.day") < F.col("a.day"), "left")
        .groupBy(F.col("a.day").alias("day"), F.col("a.n_rows").alias("n_rows"))
        .agg(F.coalesce(F.sum("b.n_rows"), F.lit(0)).alias("before"))
    )
    grp = run.withColumn("group_id", F.expr(f"before div {_TARGET_ROWS}"))
    return grp.groupBy(F.col("group_id").cast("long").alias("group_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.min("day").cast("timestamp").alias("first_day"),
        F.max("day").cast("timestamp").alias("last_day"),
        F.sum("n_rows").cast("long").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# multimodal_frame_dedup
# ---------------------------------------------------------------------------

_N_FRAMES = 12
_FRAME_LEN = 12  # NOT the 16-byte md5 period: frames cycle with period
# lcm(12,16)/12 = 4, so each doc contributes 4 distinct frames x3 — intra-doc
# duplication exists by construction and the dedup is non-vacuous
_FRAME_TOPK = 20

# frame i (0-based) covers body bytes [i*12, (i+1)*12) = hex chars
# [i*24+1, i*24+24] of repeat(md5(text), ceil(144/16)=9)
_FRAME_ORACLE = f"""
WITH frames AS (
  SELECT doc_id, upper(substr(repeat(md5(text), 9), i * 24 + 1, 24)) AS frame_hex
  FROM documents
  CROSS JOIN (SELECT UNNEST(range(0, {_N_FRAMES})) AS i)
  WHERE text IS NOT NULL
)
SELECT frame_hex,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM frames
GROUP BY frame_hex
HAVING COUNT(*) > 1
ORDER BY n_frames DESC, frame_hex
LIMIT {_FRAME_TOPK}
"""


@register(
    "multimodal_frame_dedup",
    oracle=_FRAME_ORACLE,
    description="Frame-level video dedup: binary frame sampling "
    "(mapInPandas) -> exact frame groupBy -> top duplicated frames as hex; "
    "oracle derives frames from the container arithmetic, verifying the "
    "whole Arrow sampling path",
    tags=("multimodal", "dedup", "mapinpandas", "extension"),
)
def multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real binary path: synthesize videos, sample EVERY frame via the
    Arrow-batched sampler, dedup on frame bytes (see module doc)."""
    from .multimodal import sample_frames, synthesize_video_column
    from .relational import spread

    d = spread(tbl(spark, sf_dir, "documents").filter(F.col("text").isNotNull()))
    frames = sample_frames(
        synthesize_video_column(d, n_frames=_N_FRAMES, frame_len=_FRAME_LEN),
        every_k=1,
    )
    return (
        frames.groupBy(F.hex("frame").alias("frame_hex"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_frames"),
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
        )
        .filter(F.col("n_frames") > 1)
        .orderBy(F.col("n_frames").desc(), "frame_hex")
        .limit(_FRAME_TOPK)
    )
