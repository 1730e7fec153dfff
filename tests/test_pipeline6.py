"""Semantic tests for the round-3f operators (pipeline6.py).

Parity proves cross-engine equality; these pin the semantics and the
scale-relevant plan shapes: the DQ report catches planted violations, the
salted join is row-identical to the plain join (on skewed data too) and
actually runs as a shuffle join on (key, salt), and k-hop reachability
matches a python BFS.
"""

import collections

from pyspark.sql import functions as F

from messikinesisprovider_spark.operators import pipeline6
from messikinesisprovider_spark.operators.graph2 import _copurchase_edges
from messikinesisprovider_spark.operators.relational import events_tbl, tbl

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# dq_expectations
# ---------------------------------------------------------------------------


def test_dq_clean_data_passes_all_rules(spark):
    rows = {r["rule"]: r for r in pipeline6.dq_expectations(spark, SF).collect()}
    assert len(rows) == 7
    for r in rows.values():
        assert r["passed"] is True and r["n_violations"] == 0
        assert r["n_checked"] > 0


def test_dq_planted_violations_are_counted(spark, tmp_path):
    sf = str(tmp_path)
    for t in ["region", "nation", "customer", "supplier", "part"]:
        tbl(spark, SF, t).write.parquet(f"{sf}/{t}.parquet")
    # orders: one duplicated key
    o = tbl(spark, SF, "orders")
    dup = o.limit(1)
    o.unionAll(dup).write.parquet(f"{sf}/orders.parquet")
    # lineitem: 3 bad quantities, 2 orphan orderkeys (and the dup key adds
    # no orphans)
    li = tbl(spark, SF, "lineitem")
    bad_qty = li.limit(3).withColumn("l_quantity", F.lit(-1).cast("decimal(12,2)"))
    orphan = li.limit(2).withColumn("l_orderkey", F.lit(999_999_999))
    li.unionAll(bad_qty).unionAll(orphan).write.parquet(f"{sf}/lineitem.parquet")
    # documents: push NULL text over the 5% budget
    d = tbl(spark, SF, "documents")
    n = d.count()
    extra_null = int(n * 0.05) + 5
    nulls = d.limit(extra_null).withColumn("text", F.lit(None).cast("string"))
    d.unionAll(nulls).write.parquet(f"{sf}/documents.parquet")
    # events: 4 out-of-domain types
    e = events_tbl(spark, SF)
    bad_ev = e.limit(4).withColumn("event_type", F.lit("mystery"))
    e.unionAll(bad_ev).write.parquet(f"{sf}/events.parquet")

    rows = {r["rule"]: r for r in pipeline6.dq_expectations(spark, sf).collect()}
    assert rows["lineitem_quantity_in_(0,100]"]["n_violations"] == 3
    assert rows["lineitem_orderkey_in_orders"]["n_violations"] == 2
    assert rows["orders_orderkey_unique"]["n_violations"] == 1
    assert rows["events_type_in_domain"]["n_violations"] == 4
    doc_rule = rows["documents_text_null_frac_le_5pct"]
    # exactly the rows above the floor(rows * 5%) budget
    total = n + extra_null
    assert doc_rule["n_violations"] == extra_null - int(total * 0.05)
    for name in ("lineitem_price_nonnegative", "lineitem_orderkey_not_null"):
        assert rows[name]["passed"] is True
    assert not doc_rule["passed"]


def test_dq_is_single_pass_per_table(spark):
    # The three lineitem rules must fuse into ONE aggregate over ONE scan
    # (plus the anti-join's scan): count lineitem parquet scans in the plan.
    plan = pipeline6.dq_expectations(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("lineitem.parquet") <= 2  # fused agg + anti-join probe


# ---------------------------------------------------------------------------
# skew_salted_join
# ---------------------------------------------------------------------------


def test_salted_join_equals_plain_join(spark):
    salted = pipeline6.skew_salted_join(spark, SF)
    e = events_tbl(spark, SF).filter(F.col("user_id").isNotNull())
    c = tbl(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        e.join(c, e.user_id == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.coalesce(F.col("value"), F.lit(0.0)).cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_equals_plain_join_on_hot_key(spark, tmp_path):
    # 60% of events on one user — the scenario salting exists for.
    sf = str(tmp_path)
    tbl(spark, SF, "customer").write.parquet(f"{sf}/customer.parquet")
    e = events_tbl(spark, SF)
    hot = e.withColumn("user_id", F.lit(1)).withColumn(
        "event_id", F.col("event_id") + 1_000_000
    )
    e.unionAll(hot).unionAll(
        hot.withColumn("event_id", F.col("event_id") + 1_000_000)
    ).write.parquet(f"{sf}/events.parquet")

    salted = pipeline6.skew_salted_join(spark, sf).collect()
    hot_seg = (
        tbl(spark, SF, "customer").filter(F.col("c_custkey") == 1).collect()[0]["c_mktsegment"]
    )
    plain = dict(
        (r["c_mktsegment"], r["n_events"])
        for r in events_tbl(spark, sf)
        .join(tbl(spark, sf, "customer"), F.col("user_id") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    got = {r["c_mktsegment"]: r["n_events"] for r in salted}
    assert got == plain
    assert got[hot_seg] > 2 * sum(v for k, v in got.items() if k != hot_seg) / 3


def test_salted_join_plan_shape(spark):
    plan = (
        pipeline6.skew_salted_join(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # The join must be a shuffled hash join on (key, salt) — not broadcast
    # (broadcast would sidestep the pattern) and not sort-merge-degraded.
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan.split("ShuffledHashJoin")[0]
    assert "salt" in plan


# ---------------------------------------------------------------------------
# graph_khop_reach
# ---------------------------------------------------------------------------


def test_khop_matches_python_bfs(spark):
    edges = [(r["a"], r["b"]) for r in _copurchase_edges(spark, SF).collect()]
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    seeds = sorted(deg, key=lambda v: (-deg[v], v))[:10]

    def bfs_reach(seed, k):
        reach, frontier = set(), {seed}
        for _ in range(k):
            frontier = {n for v in frontier for n in adj[v]} - set()
            reach |= frontier
        reach.discard(seed)
        return len(reach)

    # python reference replicates the operator's accumulate-union semantics:
    # frontier_i = neighbors(frontier_{i-1}), reach = union of frontiers
    got = {
        r["seed"]: r["n_reachable"]
        for r in pipeline6.graph_khop_reach(spark, SF).collect()
    }
    want = {s: bfs_reach(s, pipeline6.KHOP_K) for s in seeds}
    want = {s: n for s, n in want.items() if n > 0}
    assert got == want


def test_khop_seed_choice_is_deterministic(spark):
    a = {r["seed"] for r in pipeline6.graph_khop_reach(spark, SF).collect()}
    b = {r["seed"] for r in pipeline6.graph_khop_reach(spark, SF).collect()}
    assert a == b
