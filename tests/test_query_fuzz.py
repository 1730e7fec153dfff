"""Generative differential test: random ANSI queries, Spark vs DuckDB.

The full sweep is `python tools/query_fuzzer.py 300` (0 divergences as of
round 3); CI pins a fixed 40-seed window so the grammar, the canonicalizer
and the two engines stay in agreement. The generator is seeded — any
failure here reproduces exactly with `python tools/query_fuzzer.py 1
<seed>`.
"""

import importlib.util
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(_REPO, "tools", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.argv, argv = [name], sys.argv
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.argv = argv
    return mod


@pytest.fixture(scope="module")
def fuzz_env(spark):
    parity = _load_tool("parity")
    fuzzer = _load_tool("query_fuzzer")
    sf = "/root/testdata/sf0.001"
    for t in ["lineitem", "orders", "documents"]:
        spark.read.parquet(f"{sf}/{t}.parquet").createOrReplaceTempView(t)
    con = parity.duck_connect(sf)
    return fuzzer, parity, con


def test_fuzz_window_has_no_divergence(spark, fuzz_env):
    fuzzer, parity, con = fuzz_env
    failures = fuzzer.run_cases(spark, con, parity, n_cases=40, seed0=0)
    assert not failures, failures[0]


def test_fuzz_grammar_is_deterministic():
    fuzzer = _load_tool("query_fuzzer")
    assert fuzzer.gen_query(123) == fuzzer.gen_query(123)
    assert fuzzer.gen_query(1) != fuzzer.gen_query(2)
