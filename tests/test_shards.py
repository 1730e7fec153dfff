"""Shard-writer tests: global range order across files, size targeting,
row preservation, and idempotent foreachBatch replay."""

import glob
import os
import tempfile

from pyspark.sql import functions as F

from messikinesisprovider_spark.operators import shards
from messikinesisprovider_spark.operators.relational import events_tbl

SF = "/root/testdata/sf0.001"


def test_training_shards_preserve_rows_and_order(spark):
    ev = events_tbl(spark, SF).select("event_id", "user_id", "value")
    n_in = ev.count()
    out = tempfile.mkdtemp(prefix="shards_") + "/corpus"
    n_out = shards.write_training_shards(
        ev, out, order_by="value", n_partitions=4, max_records_per_file=500
    )
    assert n_out == n_in

    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert len(files) >= 4, "range partitioning must produce multiple shards"
    # size target: no file (except possibly per-partition stragglers) exceeds the cap
    for f in files:
        assert spark.read.parquet(f).count() <= 500

    # global range order: every value in shard i >= every value in shard i+1
    # (descending). part files sort lexicographically by partition index.
    bounds = []
    for f in files:
        mm = spark.read.parquet(f).agg(
            F.min("value").alias("lo"), F.max("value").alias("hi")
        ).collect()[0]
        bounds.append((f, mm["lo"], mm["hi"]))
    by_part = {}
    for f, lo, hi in bounds:
        part_idx = int(os.path.basename(f).split("-")[1])
        cur = by_part.get(part_idx)
        by_part[part_idx] = (
            (min(cur[0], lo), max(cur[1], hi)) if cur else (lo, hi)
        )
    parts = [by_part[k] for k in sorted(by_part)]
    for (lo_a, _), (_, hi_b) in zip(parts, parts[1:]):
        assert lo_a >= hi_b, "descending range order across shards violated"


def test_foreach_batch_writer_is_idempotent(spark):
    base = tempfile.mkdtemp(prefix="fbshards_")
    write = shards.foreach_batch_shard_writer(base)
    df1 = spark.range(10).withColumnRenamed("id", "v")
    df2 = spark.range(5).withColumnRenamed("id", "v")

    write(df1, 0)
    n_first = spark.read.parquet(os.path.join(base, "batch_id=0")).count()
    assert n_first == 10
    # replay of the same batch id with different data must be a no-op
    write(df2, 0)
    assert spark.read.parquet(os.path.join(base, "batch_id=0")).count() == 10
    # a new batch id writes normally
    write(df2, 1)
    assert spark.read.parquet(os.path.join(base, "batch_id=1")).count() == 5
    # torn attempt (no _SUCCESS) is overwritten, not skipped
    os.remove(os.path.join(base, "batch_id=1", "_SUCCESS"))
    write(df1, 1)
    assert spark.read.parquet(os.path.join(base, "batch_id=1")).count() == 10


def test_foreach_batch_writer_end_to_end_stream(spark):
    """Drive the idempotent sink from a real streaming query."""
    base = tempfile.mkdtemp(prefix="fbstream_")
    src_dir = tempfile.mkdtemp(prefix="fbsrc_")
    events_tbl(spark, SF).select("event_id", "value").limit(100).write.mode(
        "overwrite"
    ).parquet(src_dir)
    stream = spark.readStream.schema(
        spark.read.parquet(src_dir).schema
    ).parquet(src_dir)
    q = (
        stream.writeStream.foreachBatch(shards.foreach_batch_shard_writer(base))
        .option("checkpointLocation", tempfile.mkdtemp(prefix="fbck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(base)
    assert out.count() == 100
