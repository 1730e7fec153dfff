"""TCK for streaming_quantile_digest_maintenance (round 8): the merged
per-microbatch digest equals a python replay of the 3-stage construction,
and the tolerance assertion genuinely holds (the oracle hardcodes TRUE)."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from messikinesisprovider_spark.operators.pipeline91 import _QD_K1, _QD_K2, _QD_PCTS
from messikinesisprovider_spark.streaming.verified16 import (
    _N_STAGES,
    _RANK_EPS_PCT,
    streaming_quantile_digest_maintenance,
)

SF = "/root/testdata/sf0.001"

_SIX = Decimal("1.000000")


def _dec6(x: float) -> Decimal:
    return Decimal(x).quantize(_SIX, rounding=ROUND_HALF_UP)


def test_streaming_digest_matches_replay_and_tolerance(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev["value"].notna() & ev["event_id"].notna() & ev["event_type"].notna()]
    got = {
        r["event_type"]: r
        for r in streaming_quantile_digest_maintenance(spark, SF).collect()
    }
    assert set(got) == set(ev["event_type"].unique())
    for g, gdf in ev.groupby("event_type"):
        row = got[g]
        assert row["n_rows"] == len(gdf)
        cents = []
        gdf = gdf.assign(s=(gdf["event_id"].astype(int) % _N_STAGES) + 1)
        for s, sdf in gdf.groupby("s"):
            vals = sdf.sort_values(["value", "event_id"])["value"].tolist()
            n = len(vals)
            d: dict[int, tuple[int, Decimal]] = {}
            for rn0, x in enumerate(vals):
                cl = _QD_K1 * rn0 // n
                c, t = d.get(cl, (0, Decimal(0)))
                d[cl] = (c + 1, t + _dec6(x))
            for cl, (cnt, tot) in d.items():
                cents.append((float(tot) / cnt, int(s), cl, cnt, tot))
        cents.sort(key=lambda c: (c[0], c[1], c[2]))
        ntot = sum(c[3] for c in cents)
        m: dict[int, tuple[int, Decimal]] = {}
        cum = 0
        for mean, s, cl, cnt, tot in cents:
            mcl = _QD_K2 * cum // ntot
            c0, t0 = m.get(mcl, (0, Decimal(0)))
            m[mcl] = (c0 + cnt, t0 + tot)
            cum += cnt
        assert row["n_centroids"] == len(m)
        mlist = sorted(((float(t) / c, c) for c, t in m.values()), key=lambda c: c[0])
        for p in _QD_PCTS:
            target = (p * ntot + 99) // 100
            cum = 0
            est = None
            for mean, cnt in mlist:
                cum += cnt
                if cum >= target:
                    est = mean
                    break
            est6 = math.floor(est * 1e6 + 0.5) / 1e6 if est >= 0 else -(
                math.floor(-est * 1e6 + 0.5) / 1e6
            )
            assert row[f"est_p{p}"] == pytest.approx(est6, abs=1e-9)
            # ε-rank guarantee really holds (the oracle hardcodes TRUE):
            # est between the order statistics at ranks target ± εn
            svals = sorted(
                zip(gdf["value"].tolist(), gdf["event_id"].astype(int).tolist())
            )
            n = len(svals)
            t = (p * n + 99) // 100
            e = (_RANK_EPS_PCT * n + 99) // 100
            lo = svals[max(1, t - e) - 1][0]
            hi = svals[min(n, t + e) - 1][0]
            assert lo <= row[f"est_p{p}"] <= hi
        assert row["within_rank_eps"] is True
