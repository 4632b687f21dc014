"""Structured-Streaming throughput: the `-interval` ticker analog at scale.

Measures the FULL streaming path — file-source micro-batches over a
SnapshotTable (registered instantly from the cached bench corpus via
``add_files``, no rewrite) -> foreachBatch -> parse/enrich/route ->
hive-partitioned sink write + atomic snapshot commit per micro-batch ->
checkpoint advance — with `Trigger.AvailableNow` (the graceful-drain mode).

This is the streaming analog of scripts/e2e_sink_bench.py: same work per
page PLUS per-micro-batch scheduling, commit, and checkpoint overhead, so
(streaming pages/sec) / (batch pages/sec) is the measured cost of
incremental operation. Prints one JSON line.

Usage: python scripts/streaming_bench.py [cores=8] [pages=4000000] [files_per_trigger=64]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    files_per_trigger = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    os.sched_setaffinity(0, set(range(cores)))

    import bench as bench_mod
    from access_log_aggregator_spark.plans.pipeline import Pipeline
    from access_log_aggregator_spark.session import get_spark
    from access_log_aggregator_spark.sources.pages import generate_host_lookup
    from access_log_aggregator_spark.sources.tableio import SnapshotTable
    from access_log_aggregator_spark.streaming.stream import run_streaming

    pages_path = bench_mod._cached_pages(n_pages)
    conf = bench_mod.bench_scan_conf(pages_path, cores)
    heap = conf.get("spark.driver.memory", "16g")
    conf["spark.driver.extraJavaOptions"] = (
        f"-XX:ActiveProcessorCount={cores} -Xms{heap}")
    spark = get_spark(app_name="streaming-bench", master=f"local[{cores}]",
                      shuffle_partitions=cores, extra_conf=conf)
    root = Path(tempfile.mkdtemp(prefix="stream_bench_"))
    try:
        table = SnapshotTable.create(root / "pages")
        files = sorted(pages_path.glob("*.parquet"))
        n_files = len(files)
        table.add_files(files, marker="bench")

        lookup = spark.createDataFrame(generate_host_lookup())
        # warm-up: python workers + codegen JIT on a bounded slice
        warm = Pipeline(spark, root / "warm", lookup)
        warm.process_batch(
            spark.read.parquet(str(pages_path)).limit(50_000), batch_id="warm")

        pipe = Pipeline(spark, root / "out", lookup, write_partitions=cores)
        t0 = time.time()
        processed = run_streaming(
            spark, table, pipe, root / "ckpt",
            max_files_per_trigger=files_per_trigger)
        elapsed = time.time() - t0

        rows_in = sum(b.rows_in for b in processed)
        sink_counts: dict[str, int] = {}
        for b in processed:
            for k, v in b.sink_counts.items():
                sink_counts[k] = sink_counts.get(k, 0) + v
        result = {
            "metric": "streaming_pages_per_sec_sink_inclusive",
            "cores_pinned": cores,
            "n_pages": n_pages,
            "n_source_files": n_files,
            "files_per_trigger": files_per_trigger,
            "n_micro_batches": len(processed),
            "elapsed_sec": round(elapsed, 2),
            "pages_per_sec": round(rows_in / elapsed, 1),
            "rows_in": rows_in,
            "sink_counts": sink_counts,
            "counts_sum_ok": sum(sink_counts.values()) == rows_in == n_pages,
        }
        print(json.dumps(result))
        return 0 if result["counts_sum_ok"] else 1
    finally:
        spark.stop()
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
