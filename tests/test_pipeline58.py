"""Python references for pipeline58 (round 4): position-based attribution
and golden-record survivorship."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from messikinesisprovider_spark.operators import pipeline58

SF = "/root/testdata/sf0.001"


def _u_credit(n: int, pos: int) -> int:
    if n == 1:
        return 1000
    if n == 2:
        return 500
    if pos == 1 or pos == n:
        return 400
    base, rem = divmod(200, n - 2)
    return base + (1 if pos - 1 <= rem else 0)


def test_u_credits_conserve_1000_for_any_path_length():
    for n in range(1, 60):
        assert sum(_u_credit(n, p) for p in range(1, n + 1)) == 1000


def test_attribution_position_matches_pandas(spark):
    got = {r["click_hour"]: r for r in
           pipeline58.attribution_position_based(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["user_id"].notna() & ev["ts"].notna()]
    win = pipeline58._ATTR_WINDOW_US
    clicks = ev[ev["event_type"] == "click"]
    purch = ev[ev["event_type"] == "purchase"]
    by_hour: dict[int, list[int]] = {}
    for _, p in purch.iterrows():
        tp = p["ts"].value // 1000
        cs = clicks[clicks["user_id"] == p["user_id"]].copy()
        # Timestamp.value is always ns regardless of the column's unit
        cs["tc"] = cs["ts"].map(lambda t: t.value // 1000)
        cs = cs[(cs["tc"] <= tp) & (tp - cs["tc"] <= win)]
        cs = cs.sort_values(["tc", "event_id"]).reset_index(drop=True)
        n = len(cs)
        for pos, (_, c) in enumerate(cs.iterrows(), start=1):
            hr = c["ts"].hour
            a = by_hour.setdefault(hr, [0, 0, 0])
            a[0] += 1
            a[1] += _u_credit(n, pos)
            a[2] += (int(p["event_id"]) * 31 + int(c["event_id"])) % pipeline58._CK_MOD
    assert set(got) == set(by_hour)
    for hr, (nt, credit, ck) in by_hour.items():
        r = got[hr]
        assert (r["n_touches"], r["credit_permille"], r["touch_checksum"]) == (nt, credit, ck)


def test_survivorship_matches_pandas(spark):
    import hashlib
    import re

    rows = {r["survivor_doc_id"]: r for r in
            pipeline58.survivorship_golden_record(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs["text"].notna()]
    clusters: dict[str, list] = {}
    for _, d in docs.iterrows():
        fp = hashlib.md5(
            "|".join(sorted(set(re.findall(r"[a-z]+", d["text"].lower())))).encode()
        ).hexdigest()
        clusters.setdefault(fp, []).append(d)
    expect = {}
    for fp, members in clusters.items():
        if len(members) < 2:
            continue
        survivor = min(members, key=lambda d: (-d["n_chars"], d["doc_id"]))
        langs = Counter(d["lang"] for d in members if d["lang"] is not None)
        mode_lang = min(langs, key=lambda l: (-langs[l], l)) if langs else None
        expect[int(survivor["doc_id"])] = (
            len(members),
            mode_lang,
            max(int(d["n_chars"]) for d in members),
            sum(int(d["doc_id"]) % pipeline58._CK_MOD for d in members),
        )
    assert set(rows) == set(expect)
    for doc_id, (n, lang, mx, ck) in expect.items():
        r = rows[doc_id]
        assert (r["n_members"], r["mode_lang"], r["max_chars"], r["member_checksum"]) == (
            n, lang, mx, ck,
        )
    assert len(expect) > 0  # clusters exist on the stock corpus
