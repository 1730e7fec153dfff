"""Cross-engine portability of the 60-bit md5 hash (dedup.h60_spark /
h60_duck) — the primitive every hash-seeded oracle now rides on (MinHash,
SimHash, hashed embeddings, sampling/splits, KMV). One silent divergence
here would fail every one of those compares, so it gets direct generative
coverage: arbitrary strings must hash to the SAME BIGINT in Spark and
DuckDB, and the downstream modular arithmetic must agree too."""

import duckdb
import pytest

from messikinesisprovider_spark.operators.dedup import (
    _H_MOD,
    _MERSENNE_P,
    h60_duck,
    h60_spark,
)


def _values():
    # printable ascii, unicode, empty, whitespace runs, long strings, and
    # strings that look like the tokens/shingles the operators feed in
    vals = [
        "",
        " ",
        "  double  spaces  ",
        "hello",
        "Hello",
        "the quick brown fox",
        "naïve café résumé",
        "日本語のテキスト",
        "emoji 🙂 in 🚀 text",
        "tab\tand\nnewline",
        "0",
        "12345678901234567890",
        "a" * 500,
        "word " * 100,
        "'quoted' \"double\" back\\slash",
    ]
    vals += [f"tok{i}" for i in range(50)]
    return vals


@pytest.mark.parametrize("chunk", [0, 1])
def test_h60_identical_across_engines(spark, chunk):
    vals = _values()
    half = vals[chunk::2]
    sdf = spark.createDataFrame([(v,) for v in half], "s string")
    got_spark = {
        r["s"]: (r["h"], r["hm"], r["uh"])
        for r in sdf.selectExpr(
            "s",
            f"{h60_spark('s')} AS h",
            f"{h60_spark('s')} % {_H_MOD} AS hm",
            f"({h60_spark('s')} % {_H_MOD}) * 536870911 % {_MERSENNE_P} AS uh",
        ).collect()
    }
    con = duckdb.connect()
    for v in half:
        h, hm, uh = con.execute(
            f"SELECT {h60_duck('?::VARCHAR')}, "
            f"{h60_duck('?::VARCHAR')} % {_H_MOD}, "
            f"({h60_duck('?::VARCHAR')} % {_H_MOD}) * 536870911 % {_MERSENNE_P}",
            [v, v, v],
        ).fetchone()
        assert got_spark[v] == (h, hm, uh), f"hash diverged for {v!r}"
        assert 0 <= h < (1 << 60)
