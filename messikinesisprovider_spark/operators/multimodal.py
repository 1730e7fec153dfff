"""Multimodal column handling: opaque binary payloads + typed metadata.

The MessiMessage data model carries named binary payloads
(`data: map<string, binary>` — reference evidence MessiClientTck.java:78-79),
which is exactly how a multimodal training pipeline treats image/audio/video:
bytes + metadata columns, decoded only inside vectorized UDF stages.

This module makes the Spark-side plumbing real — schema, Arrow batching,
mapInPandas signatures, partition shape. The decode step handles, in order:

1. the synthetic FIMG container (the deterministic oracle format every
   registered query uses — parity needs a decode DuckDB can replicate),
2. genuine PNG (signature + IHDR parse, pure stdlib — real dims/channels
   from real PNG bytes, no library needed),
3. anything else via PIL when installed (import-gated like boto3 in
   sources/kinesis.py — absent in this container, active in deployment),
4. otherwise NotImplementedError → a decode_ok=False row.

Audio mirrors it: the FAUD stub container plus genuine RIFF/WAVE decode
through the stdlib `wave` module (real PCM samples → real RMS /
zero-crossing features).
"""

from __future__ import annotations

import io
import struct

import numpy as np
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from .relational import spread, tbl

try:  # pragma: no cover - exercised only with Pillow present
    from PIL import Image as _PIL_Image  # type: ignore

    HAVE_PIL = True
except ImportError:  # pragma: no cover
    _PIL_Image = None
    HAVE_PIL = False


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS content_sha256
    FROM documents
    """,
    description="Binary payload metadata: byte length + content hash (JVM-side, no decode)",
    tags=("multimodal", "binary", "extension"),
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.sha2(payload, 256).alias("content_sha256"),
    )


# ---- Fake media payloads + stubbed decoder (real plumbing, fake codec) ----

_MAGIC = b"FIMG"  # fake image format: FIMG | u16 width | u16 height | u8 channels

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def synthesize_image_column(d: DataFrame) -> DataFrame:
    """Deterministically wrap each doc in a fake image container.

    width/height derive from the content hash so tests are reproducible;
    the payload is the utf-8 text (stands in for pixel data).
    """
    return d.select(
        "doc_id",
        F.concat(
            F.lit(_MAGIC),
            # u16be width, u16be height, u8 channels — from hash bytes
            F.expr("substring(unhex(md5(text)), 1, 2)"),
            F.expr("substring(unhex(md5(text)), 3, 2)"),
            F.lit(bytearray([3])),
            F.encode("text", "utf-8"),
        ).alias("image"),
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> sample channels (spec §11.2.2; palette indexes are 1)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _decode_one(buf: bytes):
    """Decode one image payload to (format, width, height, channels, n_bytes).

    FIMG (the synthetic oracle container) and genuine PNG decode with zero
    dependencies; everything else goes through PIL when it's installed
    (import-gated — see module doc). Raises NotImplementedError for bytes
    nothing can decode; callers map that to a decode_ok=False row.
    """
    if buf is None or len(buf) < 9:
        raise NotImplementedError("real media decode not available in this container")
    if buf[:4] == _MAGIC:
        width, height = struct.unpack(">HH", buf[4:8])
        channels = buf[8]
        return "fimg", 1 + width % 2048, 1 + height % 2048, channels, len(buf)
    if buf[:8] == _PNG_SIG and len(buf) >= 33 and buf[12:16] == b"IHDR":
        # IHDR is required first chunk: 8-byte sig, 4-byte len, 4-byte type,
        # then u32be width, u32be height, u8 bit depth, u8 color type
        width, height = struct.unpack(">II", buf[16:24])
        channels = _PNG_CHANNELS.get(buf[25])
        if channels is not None and width > 0 and height > 0:
            return "png", width, height, channels, len(buf)
    if _PIL_Image is not None:  # pragma: no cover - needs Pillow installed
        try:
            img = _PIL_Image.open(io.BytesIO(buf))
            return (
                (img.format or "img").lower(),
                img.width,
                img.height,
                len(img.getbands()),
                len(buf),
            )
        except Exception:
            pass
    raise NotImplementedError("real media decode not available in this container")


def decode_image_meta(images: DataFrame) -> DataFrame:
    """mapInPandas decode stage: binary image column → typed metadata rows.

    Arrow-batched; scales linearly with partitions, no shuffle. This is the
    canonical shape for any per-row media op (resize, frame-sample,
    feature-extract): same signature, different `_decode_one`.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["image"]):
                try:
                    fmt, w, h, ch, nb = _decode_one(b"" if buf is None else bytes(buf))
                    rows.append((doc_id, fmt, w, h, ch, nb, True))
                except NotImplementedError:
                    rows.append((doc_id, None, None, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in IMAGE_META_SCHEMA.fields],
            )

    return images.mapInPandas(decode, schema=IMAGE_META_SCHEMA)


@register(
    "multimodal_decode_pipeline",
    # The synthesized FIMG container is deterministic from `text` (header
    # dims come from md5(text) bytes; payload is the utf-8 text), so DuckDB
    # can derive every decoded-metadata aggregate without running the decoder:
    # width = 1 + u16be(md5 hex 1..4) % 2048, height = same over hex 5..8,
    # n_bytes = 9-byte header + utf-8 length, and every row decodes ok.
    oracle="""
    SELECT 'fimg' AS format, 3 AS channels, TRUE AS decode_ok,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(SUM(9 + octet_length(encode(text))) AS BIGINT) AS total_bytes,
           MAX(1 + (('0x' || substr(md5(text), 1, 4))::INT % 2048)) AS max_width,
           MAX(1 + (('0x' || substr(md5(text), 5, 4))::INT % 2048)) AS max_height
    FROM documents
    WHERE text IS NOT NULL
    -- suppress the SQL grand-total row on empty input (Spark groupBy emits none)
    HAVING COUNT(*) > 0
    """,
    description="Synthesize binary image column → Arrow-batched mapInPandas decode → metadata agg",
    tags=("multimodal", "mapinpandas", "extension"),
)
def multimodal_decode_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-text docs have no media payload to synthesize — excluded in both
    # engines (synthesizing from NULL would fabricate a decode-failure row)
    d = spread(tbl(spark, sf_dir, "documents").filter(F.col("text").isNotNull()))
    meta = decode_image_meta(synthesize_image_column(d))
    return (
        meta.groupBy("format", "channels", "decode_ok")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("width").alias("max_width"),
            F.max("height").alias("max_height"),
        )
    )


# ---- resize stage (same mapInPandas shape, writes new binary payloads) ----

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("image", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("was_resized", T.BooleanType(), False),
    ]
)


def resize_image_meta(images: DataFrame, max_dim: int = 256) -> DataFrame:
    """Clamp each image's dimensions to max_dim, rewriting the container
    header (the stub's "resample"). Identical plumbing to a real
    PIL.Image.resize stage: binary in, binary out, no shuffle."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["image"]):
                try:
                    _, w, h, ch, _ = _decode_one(bytes(buf))
                except NotImplementedError:
                    rows.append((doc_id, None, None, None, False))
                    continue
                scale = max_dim / max(w, h)
                if scale >= 1.0:
                    rows.append((doc_id, bytes(buf), w, h, False))
                    continue
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                body = bytes(buf)[9:]
                header = _MAGIC + struct.pack(">HH", (nw - 1) % 65536, (nh - 1) % 65536) + bytes([ch])
                rows.append((doc_id, header + body, nw, nh, True))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return images.mapInPandas(resize, schema=RESIZED_SCHEMA)


# ---- fake video + frame sampling (explode shape) --------------------------

_VMAGIC = b"FVID"  # FVID | u16 n_frames | u16 frame_len | frames...

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def synthesize_video_column(d: DataFrame, n_frames: int = 12, frame_len: int = 16) -> DataFrame:
    """Wrap each doc's hash-stream into a fake fixed-frame-length video."""
    # md5 hex is 32 chars = 16 bytes after unhex; repeat to cover all frames
    reps = -(-(n_frames * frame_len) // 16)
    body_full = F.expr(
        f"substring(unhex(repeat(md5(text), {reps})), 1, {n_frames * frame_len})"
    )
    header = F.concat(
        F.lit(_VMAGIC),
        F.lit(struct.pack(">HH", n_frames, frame_len)),
        body_full,
    )
    return d.select("doc_id", header.alias("video"))


def sample_frames(videos: DataFrame, every_k: int = 3) -> DataFrame:
    """Every k-th frame as its own row — the video twin of frame-level
    training-data extraction. Arrow-batched; output fans out rows (explode
    shape), still shuffle-free."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["video"]):
                b = bytes(buf)
                if len(b) < 8 or b[:4] != _VMAGIC:
                    continue
                n_frames, frame_len = struct.unpack(">HH", b[4:8])
                frames = b[8:]
                for i in range(0, n_frames, every_k):
                    rows.append((doc_id, i, frames[i * frame_len : (i + 1) * frame_len]))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return videos.mapInPandas(sample, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Audio: fake PCM container + vectorized feature extraction.
# ---------------------------------------------------------------------------

_AUDIO_MAGIC = b"FAUD"

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zero_crossing_rate", T.DoubleType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def synthesize_audio_column(d: DataFrame, sample_rate: int = 16_000) -> DataFrame:
    """Deterministic fake audio: FAUD magic, u32be sample rate, then the
    utf-8 text bytes standing in for 8-bit PCM samples."""
    sr = struct.pack(">I", sample_rate)
    return d.select(
        "doc_id",
        F.concat(F.lit(_AUDIO_MAGIC), F.lit(sr), F.encode("text", "utf-8")).alias("audio"),
    )


def _decode_wav(b: bytes):
    """Genuine WAV decode via the stdlib `wave` module: returns
    (sample_rate, mono float64 samples in [-1, 1]) or None if unparseable."""
    import wave

    try:
        with wave.open(io.BytesIO(b)) as w:
            sr = w.getframerate()
            n_frames = w.getnframes()
            sw = w.getsampwidth()
            nch = w.getnchannels()
            raw = w.readframes(n_frames)
    except Exception:
        return None
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
    if dtype is None or sr <= 0 or nch <= 0:
        return None
    samples = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if sw == 1:  # 8-bit WAV is unsigned
        samples = (samples - 128.0) / 128.0
    else:
        samples = samples / float(2 ** (8 * sw - 1))
    if nch > 1:
        samples = samples[: (len(samples) // nch) * nch].reshape(-1, nch).mean(axis=1)
    return sr, samples


def extract_audio_features(audio: DataFrame) -> DataFrame:
    """mapInPandas feature-extract stage: binary audio → per-clip features.

    Decodes the FAUD stub container AND genuine RIFF/WAVE files (stdlib
    `wave` module — real PCM frames, 8/16/32-bit, channels averaged); the
    FEATURE math — RMS energy and zero-crossing rate — is real vectorized
    numpy over the decoded sample array, i.e. the exact compute shape a
    production extractor has. Arrow-batched, no shuffle, linear in
    partitions.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["audio"]):
                b = bytes(buf) if buf is not None else b""
                if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    decoded = _decode_wav(b)
                    if decoded is None:
                        rows.append((doc_id, None, None, None, None, None, False))
                        continue
                    sr, samples = decoded
                elif len(b) < 9 or b[:4] != _AUDIO_MAGIC:
                    rows.append((doc_id, None, None, None, None, None, False))
                    continue
                else:
                    sr = struct.unpack(">I", b[4:8])[0]
                    samples = np.frombuffer(b[8:], dtype=np.uint8).astype(np.float64)
                    samples = (samples - 128.0) / 128.0  # center 8-bit PCM
                n = len(samples)
                rms = float(np.sqrt(np.mean(samples**2))) if n else 0.0
                zc = (
                    float(np.mean(np.signbit(samples[1:]) != np.signbit(samples[:-1])))
                    if n > 1
                    else 0.0
                )
                rows.append((doc_id, sr, n, n / sr, rms, zc, True))
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    return audio.mapInPandas(extract, schema=AUDIO_FEATURES_SCHEMA)
