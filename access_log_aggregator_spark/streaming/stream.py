"""Structured Streaming mode — the reference's periodic-emit analog.

The reference re-prints its cumulative summary every ``-interval`` tick
(internal/app/aggregate.go:12,24-26) and drains everything before the final
summary on shutdown (aggregate.go:28-41). The Spark-native analog:

- ``readStream`` over the pages table's data directory (new snapshot files
  are discovered as they commit — the tail),
- ``foreachBatch`` feeding the SAME batch pipeline (fan-out sinks need
  foreachBatch; multi-sink streaming writes aren't supported natively),
- ``Trigger.AvailableNow`` = process-everything-then-stop, the drain-before-
  final-summary semantics; ``processingTime`` = the live ``-interval`` mode,
- the stream's own checkpoint gives exactly-once batch ids, and the sink's
  idempotence markers make replays no-ops.

Batch-incremental mode (plans/checkpoint.py) remains the primary engine;
this module proves the same operators run unchanged under streaming.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from ..plans.pipeline import Pipeline
from ..sources.tableio import SnapshotTable

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampNTZType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def run_streaming(
    spark: SparkSession,
    pages_table: SnapshotTable,
    pipeline: Pipeline,
    checkpoint_dir: str | Path,
    available_now: bool = True,
    processing_time: Optional[str] = None,
) -> list[str]:
    """Stream the pages table through the batch pipeline via foreachBatch.

    Returns the batch ids processed in this invocation. With
    ``available_now`` the call drains all unseen files and stops (the
    graceful-shutdown drain); with ``processing_time`` it runs until
    interrupted (the live ticker).
    """
    processed: list[str] = []

    def handle(batch_df, batch_id: int) -> None:
        bid = f"stream-{batch_id}"
        pipeline.process_batch(batch_df, batch_id=bid)
        processed.append(bid)

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(str(pages_table.root / "data"))
    )
    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", str(checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    else:  # caller manages lifetime
        return processed
    return processed


def start_live_stream(
    spark: SparkSession,
    pages_table: SnapshotTable,
    pipeline: Pipeline,
    checkpoint_dir: str | Path,
    processing_time: str = "10 seconds",
):
    """The live ticker mode (the reference's ``-interval`` loop,
    internal/app/aggregate.go:12,24-26): fires a micro-batch every
    ``processing_time`` and keeps running until the caller stops it.

    Returns ``(StreamingQuery, processed)`` where ``processed`` is a live
    list of batch ids, appended as batches commit. ``query.stop()`` waits
    for the in-flight batch to finish — the graceful-shutdown drain
    (aggregate.go:28-41): everything enqueued is counted before exit.
    """
    processed: list[str] = []

    def handle(batch_df, batch_id: int) -> None:
        bid = f"stream-{batch_id}"
        pipeline.process_batch(batch_df, batch_id=bid)
        processed.append(bid)

    q = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(str(pages_table.root / "data"))
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(checkpoint_dir))
        .trigger(processingTime=processing_time)
        .start()
    )
    return q, processed
