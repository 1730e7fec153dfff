"""Optimization-round harness: isolate-time queries and snapshot plans.

Usage:
    python tools/opt_bench.py time <sf_dir> <query> [...]   # min-of-2 noop-sink seconds
    python tools/opt_bench.py plan <tag> <query> [...]      # plans/<round>/<query>_<tag>.txt

`time` follows bench.py's methodology exactly (warm-up pass at sf0.001,
then two timed noop-sink passes with the cache cleared between them,
per-query min) so isolated numbers are comparable to the bench's.
`plan` writes .explain("formatted") output at sf0.01 — the judge-readable
before/after evidence for plan claims. The plan round dir defaults to r09;
override with SPARK_GRAFT_PLAN_ROUND.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from messikinesisprovider_spark.plans.inspect import physical_plan
from messikinesisprovider_spark.registry import all_specs
from messikinesisprovider_spark.session import get_spark

WARM_DIR = "/root/testdata/sf0.001"
PLAN_SF = "/root/testdata/sf0.01"
PLAN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r09"),
)


def _ensure_derived_tables(spark, sf_dir: str) -> None:
    # Offline layout step shared by BOTH modes: plan mode needs the derived
    # tables to exist too, or snapshotting a query that reads them throws
    # (ADVICE r08).
    from messikinesisprovider_spark.operators.bucketed import ensure_bucketed_tables
    from messikinesisprovider_spark.operators.graphshared import (
        ensure_copurchase_edges,
        ensure_copurchase_pairs,
    )
    from messikinesisprovider_spark.operators.partitioned import ensure_day_partitioned_events

    ensure_bucketed_tables(spark, sf_dir)
    ensure_day_partitioned_events(spark, sf_dir)
    ensure_copurchase_edges(spark, sf_dir)
    ensure_copurchase_pairs(spark, sf_dir)


def main() -> None:
    mode = sys.argv[1]
    spark = get_spark("opt-bench")
    specs = all_specs()
    if mode == "time":
        sf_dir = sys.argv[2]
        names = sys.argv[3:]
        _ensure_derived_tables(spark, sf_dir)
        for name in names:
            specs[name].fn(spark, WARM_DIR).write.format("noop").mode("overwrite").save()
        timings: dict[str, float] = {}
        for _ in range(2):
            spark.catalog.clearCache()
            for name in names:
                spark.sparkContext.setJobDescription(f"opt: {name}")
                t0 = time.time()
                specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = round(time.time() - t0, 3)
                timings[name] = min(timings.get(name, dt), dt)
        for name, dt in timings.items():
            print(f"{dt:8.3f}  {name}")
    elif mode == "plan":
        tag = sys.argv[2]
        names = sys.argv[3:]
        _ensure_derived_tables(spark, PLAN_SF)
        os.makedirs(PLAN_DIR, exist_ok=True)
        for name in names:
            df = specs[name].fn(spark, PLAN_SF)
            path = os.path.join(PLAN_DIR, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(physical_plan(df))
            print(f"wrote {path}")
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
