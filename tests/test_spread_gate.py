"""spread()'s round-robin is gated on the input's actual partition count
(round-9 verdict item 1).

`repartition(n)` plans as REPARTITION_BY_NUM — a strict user shuffle AQE
will neither coalesce nor elide — so an unconditional spread() would plant
a full-table round-robin shuffle into the 100 TB path of every hot operator
that uses it (and clamp a many-split scan down to defaultParallelism). The
gate must therefore:

- keep the repartition on the single-file local fixtures (one scan
  partition, the whole point of spread locally), and
- be a TRUE pass-through (not even an exchange node) on inputs that
  already meet the session parallelism — the shape of every real table.
"""

from __future__ import annotations

from messikinesisprovider_spark.operators.relational import spread, tbl
from messikinesisprovider_spark.plans.inspect import physical_plan

SF = "/root/testdata/sf0.001"


def test_single_file_scan_still_spreads(spark):
    d = tbl(spark, SF, "documents")
    assert d.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    plan = physical_plan(spread(d))
    assert "RoundRobinPartitioning" in plan


def test_multisplit_scan_is_untouched(spark, tmp_path):
    target = spark.sparkContext.defaultParallelism
    multi = str(tmp_path / "docs_multi.parquet")
    tbl(spark, SF, "documents").repartition(target).write.mode("overwrite").parquet(multi)
    d = spark.read.parquet(multi)
    assert d.rdd.getNumPartitions() >= target
    out = spread(d)
    # pass-through: the very same frame, and no round-robin anywhere
    assert out is d
    assert "RoundRobinPartitioning" not in physical_plan(out)
