"""Physical-plan inspection helpers.

The scale contract of this engine is not just "right answers" but "right
plans": filters reach the Parquet scan, projections prune columns, small
dimensions broadcast, top-k avoids total sorts, aggregations combine
map-side. These helpers make those properties assertable in tests so a
regression that silently de-optimizes a plan fails CI, not a 100 TB run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan (what .explain("formatted") prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def simple_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out += [f.strip() for f in m.group(1).split(",") if f.strip()]
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings for each scan (column-pruning evidence)."""
    plan = physical_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^>]*>)", plan)]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in physical_plan(df)

def has_top_k(df: DataFrame) -> bool:
    """TakeOrderedAndProject = global top-k without a full sort."""
    return "TakeOrderedAndProject" in physical_plan(df)


def partial_aggregate_count(df: DataFrame) -> int:
    """Number of HashAggregate operators; >= 2 on a shuffle agg means the
    map-side partial (combine) phase is present."""
    return len(re.findall(r"HashAggregate", physical_plan(df)))


def codegen_stage_count(df: DataFrame) -> int:
    """Count of whole-stage-codegen spans in the plan (formatted explain
    marks member operators with `[codegen id : N]`)."""
    return len(set(re.findall(r"\[codegen id : (\d+)\]", physical_plan(df))))
