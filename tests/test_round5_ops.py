"""Python-reference and invariant tests for the round-5 operators.

The DuckDB oracles already prove cross-engine equality; these tests pin the
SEMANTICS against independent Python/numpy computations (the
test_pipeline32 pattern) and the closed-form identities the operators
claim.
"""

from __future__ import annotations

import itertools
import math
from collections import Counter

import numpy as np
import pandas as pd

from messikinesisprovider_spark.operators.pipeline71 import (
    bradley_terry_two_rounds,
    eval_auc_pr_exact,
)
from messikinesisprovider_spark.operators.pipeline72 import (
    anova_f_oneway,
    kendall_tau_exact,
    spearman_rho_exact,
)
from messikinesisprovider_spark.operators.pipeline76 import (
    pareto_8020_revenue,
    revenue_bridge_monthly,
)
from messikinesisprovider_spark.operators.pipeline77 import (
    eval_ngram_precision_bleu,
)

SF = "/root/testdata/sf0.001"


def _xy():
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_quantity", "l_discount"])
    li = li.dropna()
    x = li["l_quantity"].astype("int64").to_numpy()
    y = np.round(li["l_discount"].to_numpy() * 100).astype("int64")
    return x, y


def test_kendall_matches_bruteforce(spark):
    x, y = _xy()
    n = len(x)
    conc = disc = 0
    # O(n^2) but n=6000 -> 18M comparisons is too slow in pure python;
    # use the same contingency reduction independently (numpy outer).
    cells = Counter(zip(x, y))
    keys = list(cells)
    for (xa, ya), (xb, yb) in itertools.combinations(keys, 2):
        w = cells[(xa, ya)] * cells[(xb, yb)]
        if (xa < xb and ya < yb) or (xa > xb and ya > yb):
            conc += w
        elif (xa < xb and ya > yb) or (xa > xb and ya < yb):
            disc += w
    n0 = n * (n - 1) // 2
    n1 = sum(c * (c - 1) // 2 for c in Counter(x).values())
    n2 = sum(c * (c - 1) // 2 for c in Counter(y).values())
    row = kendall_tau_exact(spark, SF).collect()[0]
    assert row["n"] == n
    assert row["concordant"] == conc
    assert row["discordant"] == disc
    assert row["ties_x"] == n1 and row["ties_y"] == n2
    expect_tau = (conc - disc) / math.sqrt(float(n0 - n1) * float(n0 - n2))
    assert abs(row["tau_b"] - expect_tau) < 1e-6


def test_spearman_matches_numpy_rank_pearson(spark):
    x, y = _xy()
    rx = pd.Series(x).rank(method="average").to_numpy()
    ry = pd.Series(y).rank(method="average").to_numpy()
    expect = np.corrcoef(rx, ry)[0, 1]
    row = spearman_rho_exact(spark, SF).collect()[0]
    assert row["n"] == len(x)
    assert abs(row["rho"] - expect) < 1e-6


def test_anova_matches_numpy_closed_form(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderpriority", "o_totalprice"])
    o = o.dropna()
    xc = np.round(o["o_totalprice"].to_numpy() * 100).astype("int64")
    grp = o["o_orderpriority"].to_numpy()
    groups = {g: xc[grp == g].astype(np.float64) for g in np.unique(grp)}
    n = len(xc)
    k = len(groups)
    grand = xc.astype(np.float64).mean()
    ssb = sum(len(v) * (v.mean() - grand) ** 2 for v in groups.values())
    ssw = sum(((v - v.mean()) ** 2).sum() for v in groups.values())
    f = (ssb / (k - 1)) / (ssw / (n - k))
    row = anova_f_oneway(spark, SF).collect()[0]
    assert row["n_groups"] == k and row["n_rows"] == n
    # cents^2 -> dollars^2
    assert abs(row["ss_between"] - ssb / 1e4) < max(1.0, abs(ssb / 1e4) * 1e-9)
    assert abs(row["ss_within"] - ssw / 1e4) < max(1.0, abs(ssw / 1e4) * 1e-9)
    assert abs(row["f_stat"] - f) < 1e-4


def test_revenue_bridge_identity_exact(spark):
    rows = {r["month"]: r for r in revenue_bridge_monthly(spark, SF).collect()}
    months = sorted(rows)
    for prev, cur in zip(months, months[1:]):
        # consecutive calendar months only
        if (cur.year - prev.year) * 12 + (cur.month - prev.month) != 1:
            continue
        r, p = rows[cur], rows[prev]
        assert (
            r["revenue_cents"] - p["revenue_cents"]
            == r["new_cents"] + r["expansion_cents"] - r["contraction_cents"] - r["churned_cents"]
        ), (cur, r)


def test_revenue_bridge_totals_match_orders(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_totalprice"]).dropna()
    total_cents = int(np.round(o["o_totalprice"].to_numpy() * 100).astype("int64").sum())
    rows = revenue_bridge_monthly(spark, SF).collect()
    assert sum(r["revenue_cents"] for r in rows) == total_cents


def test_pareto_shares_monotone_and_80pct_consistent(spark):
    rows = sorted(pareto_8020_revenue(spark, SF).collect(), key=lambda r: r["customer_decile"])
    shares = [r["cum_share"] for r in rows]
    assert shares == sorted(shares)
    assert abs(rows[-1]["cum_share"] - 1.0) < 1e-9  # decile 10 = everyone
    p80 = rows[0]["customers_for_80pct"]
    # the rank at p80 must cover >= 80%, the rank before it must not
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"]).dropna()
    o["c"] = np.round(o["o_totalprice"].to_numpy() * 100).astype("int64")
    rev = o.groupby("o_custkey")["c"].sum().sort_values(ascending=False)
    cum = rev.cumsum().to_numpy()
    total = rev.sum()
    assert 5 * cum[p80 - 1] >= 4 * total
    if p80 > 1:
        # strictly minimal under the deterministic (rev desc, cust) order the
        # operator uses; pandas sort may order tied revenues differently, so
        # allow equality only when a tie straddles the boundary
        assert 5 * cum[p80 - 2] <= 4 * total or rev.iloc[p80 - 2] == rev.iloc[p80 - 1]


def test_auc_pr_bounds_and_counts(spark):
    row = eval_auc_pr_exact(spark, SF).collect()[0]
    assert row["n_scored"] > 0 and 0 < row["n_pos"] < row["n_scored"]
    assert 0.0 <= row["average_precision"] <= 1.0
    assert 0.0 <= row["precision_at_10"] <= 1.0


def test_bradley_terry_round1_is_exact_win_ratio(spark):
    for r in bradley_terry_two_rounds(spark, SF).collect():
        assert r["strength_r1"] == round(2.0 * r["wins"] / r["encounters"], 6)
        assert r["strength_r2"] is None or r["strength_r2"] > 0


def test_bleu_clipping_bounds(spark):
    row = eval_ngram_precision_bleu(spark, SF).collect()[0]
    assert 0 <= row["clipped_unigrams"] <= row["hyp_unigrams"]
    assert 0 <= row["clipped_bigrams"] <= row["hyp_bigrams"]
    assert 0 <= row["p1_ppm"] <= 10**6 and 0 <= row["p2_ppm"] <= 10**6
    # clipping is monotone: bigram precision cannot exceed unigram precision
    assert row["p2_ppm"] <= row["p1_ppm"]
