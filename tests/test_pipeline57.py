"""Python reference for pipeline57 (round 4): audio VAD segmentation."""

from __future__ import annotations

import numpy as np
import pandas as pd

from messikinesisprovider_spark.operators import pipeline57

SF = "/root/testdata/sf0.001"


def _reference(text: str):
    pcm = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    n_frames = len(pcm) // pipeline57._FRAME
    frames = pcm[: n_frames * pipeline57._FRAME].reshape(n_frames, pipeline57._FRAME)
    dev = frames.astype(np.int64) - 128
    active = (dev * dev).sum(axis=1) > pipeline57._THRESH
    n_seg = longest = run = 0
    for a in active:
        run = run + 1 if a else 0
        if run == 1:
            n_seg += 1
        longest = max(longest, run)
    return n_frames, int(active.sum()), n_seg, longest


def test_vad_matches_numpy_replay(spark):
    got = {r["doc_id"]: r for r in pipeline57.multimodal_audio_vad_segments(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs["text"].notna()]
    checked = active_docs = segmented = 0
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        if not all(0x20 <= ord(c) <= 0x7E for c in text) or len(text) < pipeline57._FRAME:
            assert doc_id not in got
            continue
        nf, af, ns, lg = _reference(text)
        r = got[doc_id]
        assert (r["n_frames"], r["active_frames"], r["n_segments"], r["longest_segment"]) == (
            nf, af, ns, lg,
        )
        checked += 1
        active_docs += af > 0
        segmented += ns > 1
    assert checked == len(got)
    # the threshold yields a real mix: some clips voiced, some not, and at
    # least one clip with multiple segments (the run-length path is live)
    assert 0 < active_docs < checked
    assert segmented > 0
