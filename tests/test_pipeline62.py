"""Python references for pipeline62 (round 4): aHash dedup and pinball loss."""

from __future__ import annotations

import numpy as np
import pandas as pd

from messikinesisprovider_spark.operators import pipeline62

SF = "/root/testdata/sf0.001"


def _ahash(text: str) -> str:
    px = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)[: pipeline62._GRID].astype(int)
    s = int(px.sum())
    return "".join("1" if pipeline62._GRID * p > s else "0" for p in px)


def test_ahash_clusters_match_numpy(spark):
    got = {r["ahash"]: r for r in pipeline62.image_ahash_dedup(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs["text"].notna()]
    clusters: dict[str, list[int]] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        if len(text) < pipeline62._GRID or not all(0x20 <= ord(c) <= 0x7E for c in text):
            continue
        clusters.setdefault(_ahash(text), []).append(int(doc_id))
    expect = {h: m for h, m in clusters.items() if len(m) > 1}
    assert set(got) == set(expect)
    for h, members in expect.items():
        r = got[h]
        assert r["n_docs"] == len(members)
        assert r["canonical_doc"] == min(members)
        assert r["member_checksum"] == sum(d % pipeline62._CK_MOD for d in members)
    # perceptual grouping is non-vacuous AND coarser than exact dedup:
    # at least one cluster joins docs with DIFFERENT texts
    texts = dict(zip(docs["doc_id"], docs["text"]))
    assert any(
        len({texts[d] for d in m}) > 1 for m in expect.values()
    ), "aHash only found exact duplicates"


def test_pinball_loss_matches_pandas(spark):
    got = {(r["quantile_x10"], r["event_type"]): r for r in
           pipeline62.forecast_pinball_loss(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["ts"].notna()].copy()
    ev["day"] = ev["ts"].dt.date
    ev["hr"] = ev["ts"].dt.hour
    d0, d1 = ev["day"].min(), ev["day"].max()
    n_hist = (d1 - d0).days
    assert n_hist > 0
    expect: dict[tuple, list[int]] = {}
    for (etype, hr), grp in ev.groupby(["event_type", "hr"]):
        hist = int((grp["day"] < d1).sum())
        actual = int((grp["day"] == d1).sum())
        f_milli = (1000 * hist) // n_hist
        a_milli = 1000 * actual
        for k in (5, 9):
            d = a_milli - f_milli
            loss = max(k * d, (k - 10) * d)
            a = expect.setdefault((k, etype), [0, 0])
            a[0] += 1
            a[1] += loss
    assert set(got) == set(expect)
    for key, (n, loss) in expect.items():
        r = got[key]
        assert (r["n_cells"], r["pinball_x10_milli"]) == (n, loss)
        assert abs(r["mean_pinball"] - loss / (10000.0 * n)) < 1e-12
        assert r["pinball_x10_milli"] >= 0  # pinball loss is nonnegative
