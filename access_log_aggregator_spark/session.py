"""SparkSession factory with scale-oriented defaults.

All jobs and tests build sessions here so the whole repo runs with the same
physical posture: AQE on (coalesce + skew join), Arrow on for pandas UDFs,
UTC session timezone (parity with the oracle and with DuckDB), bounded
shuffle partitions sized for the sandbox but overridable for a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "access-log-aggregator-spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get(
        "SPARK_GRAFT_MASTER",
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    )
    extra_conf = dict(extra_conf or {})
    # Throughput GC: the parse path moves ~64 MB Arrow batches, which under
    # G1 are humongous allocations — each one can trigger a concurrent mark
    # cycle whose GC threads burn 3x the job's own CPU in bursts (measured:
    # identical back-to-back 200k-page runs varied 1.2s-5.1s with zero host
    # steal; per-process accounting pinned the extra jiffies on the JVM and
    # the GC log on "Pause Young (G1 Humongous Allocation)" concurrent
    # starts). ParallelGC has no concurrent cycles: same best-case runtime,
    # far tighter spread. Callers' extraJavaOptions are appended (they win
    # on conflicts, JVM last-flag-wins).
    jvm_key = "spark.driver.extraJavaOptions"
    extra_conf[jvm_key] = ("-XX:+UseParallelGC " + extra_conf.get(jvm_key, "")).strip()
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Correctness posture
        .config("spark.sql.session.timeZone", "UTC")
        # INT64 micros, not legacy INT96: the annotated logical type
        # survives non-Spark readers/writers (pyarrow compaction, DuckDB
        # oracles) — an INT96 column rewritten by pyarrow comes back as
        # NTZ nanos and breaks Spark reads of the compacted file
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # Arrow batch transfer for pandas UDFs (the vectorized parse path)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # ~2 KB text rows -> ~64 MB Arrow batches: big enough that the
        # Python round-trip overhead amortizes (measured ~20% faster than
        # 10k-row batches), small enough per task for modest executors
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "32768")
        # Adaptive execution: runtime coalesce + skew-join splitting
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Align Spark's codegen fallback with HotSpot's real JIT ceiling:
        # -XX:DontCompileHugeMethods refuses methods over 8000 BYTECODE
        # bytes, so a whole-stage method between 8000 and Spark's 65535
        # default compiles fine yet runs in the bytecode interpreter
        # FOREVER — silently, ~2x JVM CPU (measured on the parse stage
        # when its expressions grew past the line). At 8000 Spark instead
        # falls back to per-operator codegen, whose small methods all JIT.
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        # Bound StreamingQuery.stop(): Spark's default stopTimeout=0 joins
        # the stream-execution thread FOREVER, so a micro-batch wedged in a
        # non-interruptible call would hang a graceful shutdown past the
        # drain deadline (cli._drain_live_query). 60s >> any healthy batch
        # here; on timeout stop() raises instead of hanging.
        .config("spark.sql.streaming.stopTimeout", "60s")
        # Keep scans bounded at scale; local runs read small files anyway
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in extra_conf.items():
        b = b.config(k, v)
    return b.getOrCreate()
