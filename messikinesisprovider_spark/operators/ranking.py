"""Scale-safe global ordering: two-pass ranking without a global window.

`Window.orderBy(...)` with no `partitionBy` moves the WHOLE input into one
partition (Spark's WindowExec warns "No Partition Defined for Window
operation"); fine on a 10k-row vocabulary, a scale-killer on a corpus. The
two-pass shape here keeps every stage parallel:

1. `repartitionByRange` on the sort key — Spark's RangePartitioner assigns
   ascending key ranges to ascending partition ids, so partition i holds
   keys that sort before partition i+1's.
2. Within-partition window (row_number / running sums) — parallel.
3. Per-partition counts/sums are collected to the driver (one row per
   partition — METADATA-scale, like RDD.zipWithIndex's offset pass),
   cumulative offsets are computed there, and broadcast-joined back.

Global rank over a UNIQUE sort key equals row_number, and percent_rank /
cume_dist / ntile are arithmetic on (row_number, total_n) — see the
derived-column helpers. Ties in the sort key land in one partition (range
boundaries are key values), but callers here all order by a unique
composite, which keeps rank == dense_rank == row_number.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_PID = "_rng_pid"
_OFF = "_rng_off"


def global_row_number(
    df: DataFrame,
    order_by: list[Column | str],
    rn_col: str = "rn",
    running_sums: dict[str, str] | None = None,
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Global row_number (1-based BIGINT, named `rn_col`) over `order_by`
    without a single-partition window; returns (df, total_row_count).

    `running_sums` maps input column -> output column for running totals over
    the same ordering (ROWS UNBOUNDED PRECEDING .. CURRENT ROW). Integer
    inputs stay exact; offsets are summed driver-side in Python ints.

    The sort key must be unique for rank-family semantics (callers pass a
    tie-broken composite). Triggers one eager job for the offset pass.
    """
    running_sums = running_sums or {}
    spark = df.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    part = (
        df.repartitionByRange(n_part, *cols)
        .withColumn(_PID, F.spark_partition_id())
        # both the offset pass and the ranked output scan this; persist so
        # the range-sampling job runs once and the two passes see one layout
        .persist()
    )
    totals = (
        part.groupBy(_PID)
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            *[F.sum(src).alias(f"_sum_{i}") for i, src in enumerate(running_sums)],
        )
        .collect()
    )
    offset_rows = []
    row_off = 0
    sum_off = [0] * len(running_sums)
    for r in sorted(totals, key=lambda r: r[_PID]):
        offset_rows.append((r[_PID], row_off, *sum_off))
        row_off += r["_cnt"]
        sum_off = [s + (r[f"_sum_{i}"] or 0) for i, s in enumerate(sum_off)]
    total_n = row_off
    off_schema = ", ".join(
        [f"{_PID} int", f"{_OFF} bigint"]
        + [f"_sum_off_{i} bigint" for i in range(len(running_sums))]
    )
    off_df = spark.createDataFrame(offset_rows, off_schema)
    wl = W.partitionBy(_PID).orderBy(*cols)
    out = part.join(F.broadcast(off_df), _PID)
    out = out.withColumn(rn_col, (F.row_number().over(wl) + F.col(_OFF)).cast("bigint"))
    for i, (src, dst) in enumerate(running_sums.items()):
        out = out.withColumn(
            dst,
            F.sum(src).over(wl.rowsBetween(W.unboundedPreceding, W.currentRow))
            + F.col(f"_sum_off_{i}"),
        )
    return out.drop(_PID, _OFF, *[f"_sum_off_{i}" for i in range(len(running_sums))]), total_n


def percent_rank_of(rn: Column, total_n: int) -> Column:
    """PERCENT_RANK for a unique ordering: (rn - 1) / (n - 1); 0 when n == 1."""
    if total_n <= 1:
        return F.lit(0.0)
    return (rn - F.lit(1)).cast("double") / F.lit(float(total_n - 1))


def cume_dist_of(rn: Column, total_n: int) -> Column:
    """CUME_DIST for a unique ordering: rn / n."""
    return rn.cast("double") / F.lit(float(max(total_n, 1)))


def ntile_of(rn: Column, total_n: int, k: int) -> Column:
    """NTILE(k) from a global row_number: the first n % k tiles take
    ceil(n/k) rows, the rest floor(n/k) — Spark's and the SQL standard's
    remainder placement."""
    if total_n <= 0:
        return F.lit(None).cast("bigint")
    base, rem = divmod(total_n, k)
    if base == 0:
        # fewer rows than tiles: row i is tile i
        return rn.cast("bigint")
    big_span = rem * (base + 1)
    i0 = rn - F.lit(1)  # 0-based
    return (
        F.when(i0 < F.lit(big_span), F.floor(i0 / F.lit(base + 1)) + 1)
        .otherwise(F.lit(rem) + F.floor((i0 - F.lit(big_span)) / F.lit(base)) + 1)
        .cast("bigint")
    )
