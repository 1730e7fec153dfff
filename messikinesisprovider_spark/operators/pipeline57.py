"""Round 4 additions, part 32: voice-activity segmentation over the
binary audio path.

``multimodal_audio_vad_segments`` — the classic VAD (voice-activity
detection) framing stage a speech-data pipeline runs before ASR or
audio-quality filtering: decode the clip, split into fixed-length
frames, mark frames whose energy clears a threshold, and merge
consecutive active frames into segments.

The Spark side is the REAL multimodal shape: synthesize the FAUD binary
clip (4-byte magic, u32be sample rate, 8-bit PCM), decode and frame it
inside ONE Arrow-batched mapInPandas stage (numpy reshape + integer
energy per frame + run-length encoding per clip — per-clip state never
crosses rows, so the stage parallelizes per batch).  Frame energy is the
INTEGER sum of squared deviations sum((b-128)^2) over 64 samples — no
floats anywhere, so the DuckDB oracle can replay the identical framing
from the text's ascii codes (docs are pre-filtered to printable ASCII on
BOTH sides: utf-8 multi-byte text would make SQL char codes diverge from
the byte stream; the multimodal family's unicode coverage lives in
multimodal_binary_meta/decode_pipeline).

Output per clip: frame counts, active frames, segment count, longest
segment — the exact integers a segment-level training-data filter
consumes ("keep clips with >= 2 voiced segments").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from .relational import spread, tbl

_FRAME = 64  # samples per frame
# integer energy threshold per frame (sum of (b-128)^2 over 64 samples);
# 2000/sample puts typical letter frames below and space-heavy frames above,
# yielding a genuine mix of voiced/unvoiced and multi-segment clips
_THRESH = _FRAME * 2000

_VAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_frames", T.LongType(), False),
        T.StructField("active_frames", T.LongType(), False),
        T.StructField("n_segments", T.LongType(), False),
        T.StructField("longest_segment", T.LongType(), False),
    ]
)

_VAD_ORACLE = f"""
WITH ascii_docs AS (
  SELECT doc_id, text FROM documents
  WHERE text IS NOT NULL AND regexp_full_match(text, '[\\x20-\\x7e]*')
    AND len(text) >= {_FRAME}
),
codes AS (
  SELECT doc_id, (j - 1) // {_FRAME} AS frame,
         ascii(substr(text, CAST(j AS INT), 1)) AS c
  FROM ascii_docs
  CROSS JOIN UNNEST(range(1, len(text) + 1)) t(j)
  WHERE (j - 1) // {_FRAME} < len(text) // {_FRAME}
),
frames AS (
  SELECT doc_id, frame,
         CASE WHEN SUM((c - 128) * (c - 128)) > {_THRESH} THEN 1 ELSE 0 END AS active
  FROM codes GROUP BY doc_id, frame
),
islands AS (
  SELECT doc_id, frame, active,
         frame - ROW_NUMBER() OVER (PARTITION BY doc_id, active ORDER BY frame) AS isl
  FROM frames
),
segs AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS seg_len
  FROM islands WHERE active = 1
  GROUP BY doc_id, isl
)
SELECT f.doc_id,
       CAST(f.n_frames AS BIGINT) AS n_frames,
       CAST(f.active_frames AS BIGINT) AS active_frames,
       CAST(COALESCE(s.n_segments, 0) AS BIGINT) AS n_segments,
       CAST(COALESCE(s.longest, 0) AS BIGINT) AS longest_segment
FROM (SELECT doc_id, COUNT(*) AS n_frames, SUM(active) AS active_frames
      FROM frames GROUP BY doc_id) f
LEFT JOIN (SELECT doc_id, COUNT(*) AS n_segments, MAX(seg_len) AS longest
           FROM segs GROUP BY doc_id) s
  ON s.doc_id = f.doc_id
"""


@register(
    "multimodal_audio_vad_segments",
    oracle=_VAD_ORACLE,
    description="Voice-activity segmentation over the REAL binary audio "
    "path: FAUD clip synthesized, decoded, framed (64 samples) and "
    "run-length segmented inside one Arrow-batched mapInPandas stage; "
    "frame energy is the INTEGER sum((b-128)^2) so the oracle replays the "
    "identical framing from ascii codes; per-clip frame/active/segment/"
    "longest-run integers — the segment-level filter statistic",
    tags=("multimodal", "mapinpandas", "audio", "extension"),
)
def multimodal_audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .multimodal import synthesize_audio_column

    docs = (
        tbl(spark, sf_dir, "documents")
        .filter(
            F.col("text").isNotNull()
            & F.col("text").rlike(r"^[\x20-\x7e]*$")
            & (F.length("text") >= _FRAME)
        )
        .select("doc_id", "text")
    )
    audio = synthesize_audio_column(spread(docs))

    def vad(batches):
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["audio"]):
                pcm = np.frombuffer(bytes(buf)[8:], dtype=np.uint8)
                n_frames = len(pcm) // _FRAME
                if n_frames == 0:
                    rows.append((doc_id, 0, 0, 0, 0))
                    continue
                frames = pcm[: n_frames * _FRAME].reshape(n_frames, _FRAME)
                dev = frames.astype(np.int64) - 128
                energy = (dev * dev).sum(axis=1)
                active = energy > _THRESH
                # run-length encode the active mask
                n_segments = 0
                longest = 0
                run = 0
                for a in active:
                    if a:
                        run += 1
                        if run == 1:
                            n_segments += 1
                        longest = max(longest, run)
                    else:
                        run = 0
                rows.append(
                    (doc_id, n_frames, int(active.sum()), n_segments, longest)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_frames",
                    "active_frames",
                    "n_segments",
                    "longest_segment",
                ],
            )

    return audio.mapInPandas(vad, schema=_VAD_SCHEMA)
