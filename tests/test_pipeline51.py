"""Python references for pipeline51 (round 4): FIFO lot matching (vs a
literal queue simulation) and DBSCAN core points."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict, deque

import pandas as pd

from messikinesisprovider_spark.operators import pipeline43, pipeline51

SF = "/root/testdata/sf0.001"


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_fifo_matches_literal_queue_simulation(spark):
    got = {r["user_id"]: r for r in pipeline51.fifo_lot_matching(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna() & ev["user_id"].notna()]
    ev = ev[ev["event_type"].isin(["purchase", "signup", "click"])]
    ev = ev.sort_values(["ts", "event_id"])
    partial_matched = False
    for uid, grp in ev.groupby("user_id"):
        # literal FIFO queue simulation — the semantics the interval
        # intersection is claimed to equal
        buys: deque = deque()
        sells: deque = deque()
        for _, r in grp.iterrows():
            # SQL ROUND is half-away-from-zero; python round() is banker's
            qty = max(1, int(math.floor(r["value"] + 0.5)))
            side = "sell" if r["event_type"] == "click" else "buy"
            (sells if side == "sell" else buys).append([int(r["event_id"]), qty])
        pairs = []
        bq = deque([list(x) for x in buys])
        for sid, sqty in [list(x) for x in sells]:
            need = sqty
            while need > 0 and bq:
                bid, avail = bq[0]
                take = min(need, avail)
                pairs.append((bid, sid, take))
                need -= take
                bq[0][1] -= take
                if bq[0][1] == 0:
                    bq.popleft()
        total_b = sum(q for _, q in buys)
        total_s = sum(q for _, q in sells)
        if uid not in got:
            assert not pairs, uid
            continue
        r = got[uid]
        assert r["n_matched_pairs"] == len(pairs), uid
        assert r["matched_qty"] == sum(m for _, _, m in pairs) == min(total_b, total_s)
        assert r["pair_checksum"] == sum(
            (b * 31 + s) % pipeline51._CK_MOD for b, s, _ in pairs
        )
        if 0 < min(total_b, total_s) < max(total_b, total_s):
            partial_matched = True
    assert partial_matched  # supply/demand imbalance exercised


def test_dbscan_core_points_match_python(spark):
    rows = {r["n_neighbors"]: r for r in pipeline51.dbscan_core_points(spark, SF).collect()}
    cust = pd.read_parquet(f"{SF}/customer.parquet")["c_custkey"].tolist()
    dom = pipeline43._GRID_DOMAIN
    w = max(1, dom // max(1, math.floor(math.sqrt(len(cust) / pipeline43._GRID_OCCUPANCY))))
    pts = {c: (h60(f"x|{c}") % dom, h60(f"y|{c}") % dom) for c in cust}
    by_cell = defaultdict(list)
    for c, (x, y) in pts.items():
        by_cell[(x // w, y // w)].append(c)
    counts = defaultdict(lambda: [0, 0])
    for c, (x, y) in pts.items():
        n = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for o in by_cell.get((x // w + dx, y // w + dy), []):
                    if o == c:
                        continue
                    ox, oy = pts[o]
                    if (x - ox) ** 2 + (y - oy) ** 2 <= w * w:
                        n += 1
        counts[n][0] += 1
        counts[n][1] += c
    assert {k: (r["n_points"], r["id_checksum"]) for k, r in rows.items()} == {
        k: tuple(v) for k, v in counts.items()
    }
    for k, r in rows.items():
        assert r["is_core"] == (k >= pipeline51._DBSCAN_MINPTS)
    # both classes populated — the threshold separates real mass
    assert any(k >= pipeline51._DBSCAN_MINPTS for k in counts)
    assert any(k < pipeline51._DBSCAN_MINPTS for k in counts)
