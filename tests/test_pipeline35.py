"""Python-reference tests for pipeline35: resize clamp math and the DPP
dimension join."""

from __future__ import annotations

import hashlib

import pandas as pd

from messikinesisprovider_spark.operators.pipeline35 import (
    _DPP_DOWS,
    _MAX_DIM,
    dpp_dim_filter_join,
    multimodal_resize_pipeline,
)

SF = "/root/testdata/sf0.001"


def _dims(text: str) -> tuple[int, int]:
    h = hashlib.md5(text.encode()).hexdigest()
    return 1 + int(h[0:4], 16) % 2048, 1 + int(h[4:8], 16) % 2048


def test_resize_matches_python_clamp(spark):
    out = {r["was_resized"]: r for r in multimodal_resize_pipeline(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    ref: dict[bool, list[tuple[int, int, int]]] = {True: [], False: []}
    for text in docs["text"].dropna():
        w0, h0 = _dims(text)
        mx = max(w0, h0)
        nb = 9 + len(text.encode())
        if mx <= _MAX_DIM:
            ref[False].append((w0, h0, nb))
        else:
            scale = _MAX_DIM / mx
            ref[True].append((max(1, int(w0 * scale)), max(1, int(h0 * scale)), nb))
    for flag, items in ref.items():
        if not items:
            assert flag not in out
            continue
        got = out[flag]
        assert got["n_images"] == len(items)
        assert got["width_sum"] == sum(w for w, _, _ in items)
        assert got["height_sum"] == sum(h for _, h, _ in items)
        assert got["total_bytes"] == sum(b for _, _, b in items)
    # clamp invariant: every resized image fits in the box
    if True in out:
        assert out[True]["max_width"] <= _MAX_DIM
        assert out[True]["max_height"] <= _MAX_DIM


def test_dpp_join_matches_pandas(spark):
    rows = {r["dow"]: r for r in dpp_dim_filter_join(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["ts"].notna() & ev["value"].notna()].copy()
    ev["dow"] = ev["ts"].dt.dayofweek  # Monday=0
    # Spark dayofweek: Sunday=1..Saturday=7 -> pandas Monday=0 maps to 2
    ev["dow"] = (ev["dow"] + 2 - 1) % 7 + 1
    sel = ev[ev["dow"].isin(_DPP_DOWS)]
    for dow, grp in sel.groupby("dow"):
        got = rows[dow]
        assert got["n_events"] == len(grp)
        assert got["n_days"] == grp["ts"].dt.date.nunique()
    assert set(rows) == set(sel["dow"].unique())
