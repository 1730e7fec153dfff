"""Python references for pipeline29 (round 4): compaction planning and
frame-level dedup."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import pandas as pd

from messikinesisprovider_spark.operators import pipeline29

SF = "/root/testdata/sf0.001"


def test_compaction_plan_matches_greedy_replay(spark):
    got = {
        r["group_id"]: (r["n_days"], r["n_rows"], pd.Timestamp(r["first_day"]), pd.Timestamp(r["last_day"]))
        for r in pipeline29.small_file_compaction_plan(spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["ts"].notna()]
    days = ev.groupby(pd.to_datetime(ev["ts"]).dt.date).size().sort_index()
    groups = defaultdict(lambda: [0, 0, None, None])  # n_days, n_rows, first, last
    before = 0
    for day, n in days.items():
        g = before // pipeline29._TARGET_ROWS
        rec = groups[g]
        rec[0] += 1
        rec[1] += n
        rec[2] = day if rec[2] is None else min(rec[2], day)
        rec[3] = day if rec[3] is None else max(rec[3], day)
        before += n
    expect = {
        g: (r[0], r[1], pd.Timestamp(r[2]), pd.Timestamp(r[3])) for g, r in groups.items()
    }
    assert got == expect
    # every group except possibly the last is filled to >= target
    gids = sorted(expect)
    for g in gids[:-1]:
        assert expect[g][1] >= pipeline29._TARGET_ROWS
    assert sum(v[1] for v in expect.values()) == len(ev)  # row conservation


def test_frame_dedup_matches_container_arithmetic(spark):
    rows = [
        (r["frame_hex"], r["n_frames"], r["n_docs"])
        for r in pipeline29.multimodal_frame_dedup(spark, SF).collect()
    ]
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    frames = Counter()
    docs_per = defaultdict(set)
    for doc_id, t in zip(docs["doc_id"], docs["text"]):
        if t is None:
            continue
        hexstream = hashlib.md5(t.encode()).hexdigest() * 9
        for i in range(pipeline29._N_FRAMES):
            fh = hexstream[i * 24 : i * 24 + 24].upper()
            frames[fh] += 1
            docs_per[fh].add(doc_id)
    dup = [
        (fh, n, len(docs_per[fh])) for fh, n in frames.items() if n > 1
    ]
    dup.sort(key=lambda x: (-x[1], x[0]))
    assert rows == dup[: pipeline29._FRAME_TOPK]
    # intra-doc duplication exists by construction (frame period 4 < 12)
    assert rows and rows[0][1] >= 3
