"""Per-topology streaming bench: wall time + microbatch accounting.

The batch headline (bench.py) times streaming topologies as opaque wall
seconds, where fixed streaming overhead (checkpoint setup, microbatch
planning) drowns the signal. This tool separates the streaming tier:
every registered `streaming_*` topology runs once at the given SF while a
StreamingQueryListener counts its microbatches and input rows, and the
throughput legs from tools/stream_bench.py ride along. Output is
STREAM_BENCH.md — the round-over-round artifact for streaming regressions.

Usage: python tools/stream_topology_bench.py [sf_dir] [out_md]
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener

from messikinesisprovider_spark.registry import all_specs
from messikinesisprovider_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT_MD = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "STREAM_BENCH.md"
)


class _Collector(StreamingQueryListener):
    """Accumulates (batchId, numInputRows) for every progress event; the
    driver attributes events to topologies by sequential time windows."""

    def __init__(self):
        self.events: list[tuple[str, int, int]] = []  # (query_id, batch_id, rows)

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        self.events.append((str(p.id), p.batchId, int(p.numInputRows)))

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def main():
    spark = get_spark("stream-bench")
    collector = _Collector()
    spark.streams.addListener(collector)
    specs = all_specs()
    streaming = [n for n in specs if n.startswith("streaming_")]

    rows = []
    for name in streaming:
        mark = len(collector.events)
        t0 = time.time()
        specs[name].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        time.sleep(0.5)  # listener events are async — let the tail land
        window = collector.events[mark:]
        by_query: dict[str, set[int]] = {}
        n_rows = 0
        for qid, bid, nr in window:
            by_query.setdefault(qid, set()).add(bid)
            n_rows += nr
        n_batches = sum(len(b) for b in by_query.values())
        rows.append((name, round(wall, 2), len(by_query), n_batches, n_rows))
        print(f"{name}: {wall:.2f}s, {len(by_query)} queries, {n_batches} microbatches, {n_rows} input rows")

    # Throughput legs (records/sec through the Kinesis path) — the existing
    # tool already prints one JSON line; run it small enough for CI.
    # 200k records: below that, query-setup fixed costs dilute the rate
    # (measured 4.5k rec/s at 40k vs 19.3k rec/s at 200k on the same box).
    tp = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)), "stream_bench.py"), "200000", "8"],
        capture_output=True,
        text=True,
        timeout=560,
    )
    tp_line = next(
        (ln for ln in tp.stdout.splitlines() if ln.strip().startswith("{")), "{}"
    )
    tp_doc = json.loads(tp_line)

    total = round(sum(r[1] for r in rows), 2)
    with open(OUT_MD, "w") as f:
        f.write("# Streaming bench\n\n")
        f.write(
            f"Generated {datetime.date.today().isoformat()} at `{SF_DIR}` "
            f"(local[*], availableNow drains through the staged log / broker "
            f"simulator; wall seconds include checkpoint setup — the fixed "
            f"streaming overhead the batch headline can't separate).\n\n"
        )
        f.write("| topology | wall s | queries | microbatches | input rows |\n")
        f.write("|---|---|---|---|---|\n")
        for name, wall, nq, nb, nr in rows:
            f.write(f"| {name} | {wall} | {nq} | {nb} | {nr} |\n")
        f.write(f"\n**Total: {total} s across {len(rows)} topologies.**\n\n")
        f.write(
            "Reading the table: `streaming_kinesis_pipeline` (driver-side "
            "simple reader) drains in many small microbatches BY DESIGN — "
            "F1 bounded prefetch (LIMIT=1000/poll) is the reference's "
            "admission control; `streaming_kinesis_pipeline_partitioned` is "
            "the executor-parallel scale path and should stay ~10x faster "
            "on the same data. The first topology's wall time includes the "
            "once-per-session staged-log write.\n\n"
        )
        f.write("## Kinesis-path throughput (tools/stream_bench.py)\n\n")
        if tp_doc:
            f.write(
                f"- publish: **{tp_doc.get('publish_rps', '?')} rec/s**\n"
                f"- consume end-to-end: **{tp_doc.get('consume_e2e_rps', '?')} rec/s**\n"
                f"- records: {tp_doc.get('n_records', '?')} across "
                f"{tp_doc.get('n_shards', '?')} shards; delivered: "
                f"{tp_doc.get('delivered', '?')}\n"
                f"- reference AWS envelope at this shard count: "
                f"{tp_doc.get('reference_envelope_rps', '?')} rec/s sustained\n"
            )
        else:
            f.write("- throughput leg failed to parse; see tool output\n")
    print(f"wrote {OUT_MD}")


if __name__ == "__main__":
    main()
