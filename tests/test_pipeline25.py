"""Semantic test for the full 3-round Lloyd loop against a sequential
python replay of the identical fold."""

import hashlib
from decimal import ROUND_HALF_UP, Decimal

from messikinesisprovider_spark.operators import pipeline25
from messikinesisprovider_spark.operators.relational import tbl

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _q6(x: float) -> int:
    return int(Decimal(x * 1000000.0).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def test_three_rounds_match_python_replay(spark):
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in tbl(spark, SF, "embeddings").collect()
        if r["embedding"] is not None and len(r["embedding"]) == 64
    }
    seeds = sorted(vecs, key=lambda i: (_h60(str(i)), i))[: pipeline25.KMR_CELLS]
    cent = {cid: list(vecs[cid]) for cid in seeds}  # round-0 centroids
    want = {}
    for rnd in range(1, pipeline25.KMR_ROUNDS + 1):
        assign = {}
        for vid, v in vecs.items():
            best = None
            for cid, cv in cent.items():
                d2 = 0.0
                for d in range(64):  # same ascending float fold
                    d2 += (v[d] - cv[d]) * (v[d] - cv[d])
                if best is None or (d2, cid) < best[:2]:
                    best = (d2, cid)
            assign[vid] = best[1]
        stats = {}
        new_cent = {}
        for cid in set(assign.values()):
            members = [vid for vid, c in assign.items() if c == cid]
            n = len(members)
            sums = [sum(_q6(vecs[vid][d]) for vid in members) for d in range(64)]
            means = [s / (n * 1000000.0) for s in sums]
            new_cent[cid] = means
            checksum = sum(
                abs(int(Decimal(s / (n * 1000000.0) * 1000000.0).quantize(
                    Decimal(1), rounding=ROUND_HALF_UP)))
                for s in sums
            )
            stats[(rnd, cid)] = (n, checksum)
        cent = new_cent
        want.update(stats)
    got = {
        (r["round"], r["cid"]): (r["n_members"], r["centroid_checksum_q6"])
        for r in pipeline25.kmeans_lloyd_rounds(spark, SF).collect()
    }
    assert got == want and len(got) > 0
    # mass conservation each round
    n_vectors = len(vecs)
    for rnd in range(1, pipeline25.KMR_ROUNDS + 1):
        assert sum(n for (r, _), (n, _) in got.items() if r == rnd) == n_vectors
