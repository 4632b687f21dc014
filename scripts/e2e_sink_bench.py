"""End-to-end SINK-INCLUSIVE throughput: the full job a production run pays
for — scan -> parse -> enrich -> route -> hive-partitioned parquet sink
write -> atomic snapshot commit -> the three aggregate table writes —
over the 4M-page bench corpus, CPU-pinned like scripts/scaling_bench.py.

The north-star scaling bench times build_routed with a noop sink (the
dataflow); this measures the whole Pipeline.process_batch + write_aggregates
path including real output IO. Prints one JSON line.

Usage: python scripts/e2e_sink_bench.py [cores=8] [pages=4000000]
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
    os.sched_setaffinity(0, set(range(cores)))

    import bench as bench_mod
    from access_log_aggregator_spark.plans.pipeline import Pipeline
    from access_log_aggregator_spark.session import get_spark
    from access_log_aggregator_spark.sources.pages import generate_host_lookup

    pages_path = bench_mod._cached_pages(n_pages)
    conf = bench_mod.bench_scan_conf(pages_path, cores)
    heap = conf.get("spark.driver.memory", "16g")
    conf["spark.driver.extraJavaOptions"] = (
        f"-XX:ActiveProcessorCount={cores} -Xms{heap}")
    spark = get_spark(app_name="e2e-sink-bench", master=f"local[{cores}]",
                      shuffle_partitions=cores, extra_conf=conf)
    out_root = Path(tempfile.mkdtemp(prefix="e2e_sink_"))
    try:
        lookup = spark.createDataFrame(generate_host_lookup())
        pages = spark.read.parquet(str(pages_path))
        # warm-up on a slice: python workers + codegen JIT
        pipe_w = Pipeline(spark, out_root / "warm", lookup)
        pipe_w.process_batch(pages.limit(50_000), batch_id="warm")

        pipe = Pipeline(spark, out_root / "out", lookup, write_partitions=cores)
        t0 = time.time()
        res = pipe.process_batch(pages, batch_id="full")
        t_route = time.time() - t0
        t1 = time.time()
        agg_rows = pipe.write_aggregates()
        t_agg = time.time() - t1

        total = t_route + t_agg
        result = {
            "cores_pinned": cores,
            "pages": n_pages,
            "routed_sink_sec": round(t_route, 2),
            "aggregates_sec": round(t_agg, 2),
            "total_sec": round(total, 2),
            "pages_per_sec_end_to_end": round(n_pages / total, 1),
            "rows_in": res.rows_in,
            "sink_counts": res.sink_counts,
            "sink_counts_sum_ok": sum(res.sink_counts.values()) == res.rows_in,
            "aggregate_tables": agg_rows,
        }
        print(json.dumps(result))
        # gate the exit code on the counts invariant like the streaming
        # twin (streaming_bench.py): a metrics regression must fail CI
        # callers, not just record false in a field nobody asserts
        return 0 if result["sink_counts_sum_ok"] else 1
    finally:
        spark.stop()
        shutil.rmtree(out_root, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
