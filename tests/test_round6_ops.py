"""Python-reference and invariant tests for the round-6 operators.

The DuckDB oracles already prove cross-engine equality; these tests pin the
SEMANTICS against independent Python/numpy computations (the
test_pipeline32 pattern) and the closed-form identities the operators
claim.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from messikinesisprovider_spark.operators.pipeline81 import (
    _RESERVOIR_K,
    bit_agg_flags,
    dq_referential_orphans,
    histogram_equiwidth,
    kruskal_wallis_h,
    sample_reservoir_hash,
    values_inline_dim_join,
    welch_t_test,
    window_count_distinct,
)
from messikinesisprovider_spark.operators.pipeline82 import (
    ngram_novelty_eval,
    quality_c4_rules,
    source_mixing_temperature,
)

SF = "/root/testdata/sf0.001"


def _cents_by_group(col: str):
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=[col, "o_totalprice"]).dropna()
    cents = np.round(o["o_totalprice"].to_numpy() * 100).astype("int64")
    return o[col].to_numpy(), cents


def test_kruskal_wallis_matches_scipy_formula(spark):
    grp, cents = _cents_by_group("o_orderpriority")
    # independent implementation: average ranks via argsort on the value
    # domain, tie-corrected H
    order = np.argsort(cents, kind="stable")
    ranks = np.empty(len(cents), dtype="float64")
    sorted_c = cents[order]
    i = 0
    pos = 1
    while i < len(sorted_c):
        j = i
        while j < len(sorted_c) and sorted_c[j] == sorted_c[i]:
            j += 1
        avg = (pos + pos + (j - i) - 1) / 2.0
        ranks[order[i:j]] = avg
        pos += j - i
        i = j
    n = len(cents)
    groups = defaultdict(list)
    for g, r in zip(grp, ranks):
        groups[g].append(r)
    h = 12.0 / (n * (n + 1)) * sum(
        (sum(rs)) ** 2 / len(rs) for _, rs in sorted(groups.items())
    ) - 3 * (n + 1)
    ties = sum(t**3 - t for t in Counter(cents).values())
    h_corr = h / (1 - ties / (n**3 - n))
    row = kruskal_wallis_h(spark, SF).collect()[0]
    assert row["n_rows"] == n
    assert row["n_groups"] == len(groups)
    assert abs(row["h_stat"] - h_corr) < 1e-4


def test_welch_t_matches_numpy(spark):
    grp, cents = _cents_by_group("o_orderstatus")
    a = cents[grp == "F"].astype("float64")
    b = cents[grp == "O"].astype("float64")
    va, vb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(va + vb)
    df = (va + vb) ** 2 / (va**2 / (len(a) - 1) + vb**2 / (len(b) - 1))
    row = welch_t_test(spark, SF).collect()[0]
    assert row["n_f"] == len(a) and row["n_o"] == len(b)
    assert abs(row["t_stat"] - t) < 1e-4
    assert abs(row["welch_df"] - df) < 0.5


def test_histogram_equiwidth_partitions_everything(spark):
    rows = histogram_equiwidth(spark, SF).collect()
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_totalprice"]).dropna()
    assert sum(r["n"] for r in rows) == len(o)
    total = sum(r["total"] for r in rows)
    assert abs(total - float(o["o_totalprice"].sum())) < 1.0
    assert all(0 <= r["bucket"] < 20 for r in rows)


def test_window_count_distinct_final_equals_nunique(spark):
    out = window_count_distinct(spark, SF).toPandas()
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "event_type", "ts"]
    ).dropna()
    expect = ev.groupby("user_id")["event_type"].nunique()
    got = out.groupby("user_id")["distinct_types_so_far"].max()
    assert got.to_dict() == expect.to_dict()
    # monotone non-decreasing within each user is implied by the running sum
    assert (out.groupby("user_id")["distinct_types_so_far"].min() >= 1).all()


def test_reservoir_exact_k_per_group(spark):
    out = sample_reservoir_hash(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["source"]).dropna()
    per_group = docs.groupby("source").size()
    got = out.groupby("source").size()
    for src, n in per_group.items():
        assert got.get(src, 0) == min(_RESERVOIR_K, n)
    # deterministic: a second run returns the identical sample
    again = sample_reservoir_hash(spark, SF).toPandas()
    assert sorted(out["doc_id"]) == sorted(again["doc_id"])


def test_values_dim_join_weighted_total(spark):
    rows = {r["priority"]: r for r in values_inline_dim_join(spark, SF).collect()}
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderpriority", "o_totalprice"])
    for pri, r in rows.items():
        sub = o[o["o_orderpriority"] == pri]
        assert r["n_orders"] == len(sub)
        expect = float(np.round(sub["o_totalprice"].to_numpy() * 100).astype("int64").sum()) * r["weight"] / 100.0
        assert abs((r["weighted_total"] or 0.0) - expect) < 0.01


def test_bit_aggs_match_python_fold(spark):
    out = {r["user_id"]: r for r in bit_agg_flags(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "event_type"]).dropna(
        subset=["user_id"]
    )
    bits = {"view": 1, "click": 2, "cart": 4, "purchase": 8}
    for uid, grp in ev.groupby("user_id"):
        flags = [bits.get(t, 0) for t in grp["event_type"]]
        r = out[uid]
        acc_or = acc_and = acc_xor = flags[0]
        for f in flags[1:]:
            acc_or |= f
            acc_and &= f
            acc_xor ^= f
        assert (r["types_any"], r["types_all"], r["types_parity"]) == (
            acc_or,
            acc_and,
            acc_xor,
        )


def test_dq_orphans_zero_on_clean_fixture(spark):
    rows = dq_referential_orphans(spark, SF).collect()
    assert len(rows) == 3
    assert all(r["n_orphans"] == 0 and r["fk_intact"] for r in rows)
    assert all(r["n_child"] > 0 for r in rows)


def test_novelty_bounds_and_split(spark):
    out = ngram_novelty_eval(spark, SF).toPandas()
    assert ((out["novelty"] >= 0) & (out["novelty"] <= 1)).all()
    assert (out["n_novel"] <= out["n_shingles"]).all()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    # eval side is the ~20% hash split: every output doc is an eval doc
    assert 0 < len(out) < len(docs) * 0.5


def test_c4_rules_flags(spark):
    out = quality_c4_rules(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"]).dropna()
    assert len(out) == len(docs)
    # keep implies every contributing flag
    kept = out[out["keep"]]
    assert kept["pass_min_words"].all() and kept["pass_no_code"].all()
    short = out[out["n_words"] < 5]
    assert (~short["keep"]).all()


def test_mixing_temperature_upsamples_low_resource(spark):
    rows = source_mixing_temperature(spark, SF).collect()
    z = sum(r["p_temperature"] for r in rows)
    assert abs(z - 1.0) < 1e-4
    # sqrt temperature compresses the distribution: the smallest source
    # gains share, the largest loses share
    lo = min(rows, key=lambda r: r["n_tokens"])
    hi = max(rows, key=lambda r: r["n_tokens"])
    assert lo["p_temperature"] > lo["p_proportional"]
    assert hi["p_temperature"] < hi["p_proportional"]
