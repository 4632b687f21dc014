"""Custom stateful streaming operator: cumulative per-host summaries.

The reference's aggregation state is *cumulative since start* and re-emitted
every tick (internal/accesslog/summaries.go:13-27 fold +
internal/app/aggregate.go:24-26 ticker). In batch mode this repo recomputes
from the routed sink; this module expresses the same semantics as a true
streaming stateful operator via ``applyInPandasWithState``: GroupState holds
the reference's three accumulators per host (requestTotal, request2xx,
durationTotal — model.go:31-35) and every micro-batch emits the UPDATED
cumulative row per host touched in that batch, exactly like the reference's
periodic summary print.

Scale notes: state is 3 numbers per distinct host — the same unbounded-map
shape the reference holds in RAM (model.go:42), except sharded across
executors by the groupBy(host) shuffle and checkpointed to the state store,
so it survives restarts and is not bounded by one machine's memory.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: emitted per micro-batch per touched host — the reference's summary row
#: (print.go:43-44 derived columns included)
SUMMARY_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("total_requests", LongType()),
        StructField("requests_2xx", LongType()),
        StructField("non_2xx_requests", LongType()),
        StructField("sum_duration_s", DoubleType()),
    ]
)

#: GroupState layout = the reference's summary struct (model.go:31-35)
STATE_SCHEMA = StructType(
    [
        StructField("request_total", LongType()),
        StructField("request_2xx", LongType()),
        StructField("duration_total", DoubleType()),
    ]
)


def _fold_host(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's records for one host into cumulative state.

    Per-batch arithmetic is vectorized (pandas sums over the Arrow batch);
    only the 3-number fold crosses batches — the updateSummary analog
    (summaries.go:3-11)."""
    total, n2xx, dur = state.get if state.exists else (0, 0, 0.0)
    for pdf in pdfs:
        total += int(len(pdf))
        status = pdf["status_code"]
        n2xx += int(((status >= 200) & (status < 300)).sum())
        dur += float(pdf["duration"].sum())
    state.update((total, n2xx, dur))
    yield pd.DataFrame(
        {
            "host": [key[0]],
            "total_requests": [total],
            "requests_2xx": [n2xx],
            "non_2xx_requests": [total - n2xx],
            "sum_duration_s": [dur],
        }
    )


def cumulative_host_summaries(valid_records: DataFrame) -> DataFrame:
    """Streaming DF of valid records -> per-batch updated cumulative rows.

    ``valid_records`` must carry (host, status_code, duration) — the parse
    stage's validated output. Output mode must be ``update``.
    """
    return (
        valid_records.select("host", "status_code", "duration")
        .groupBy("host")
        .applyInPandasWithState(
            _fold_host,
            outputStructType=SUMMARY_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_stateful_summary(
    spark: Any,
    pages_table: Any,
    checkpoint_dir: str,
    query_name: str = "host_summaries",
    max_files_per_trigger: int = 1,
) -> Any:
    """Wire the pages table -> parse -> valid filter -> stateful fold ->
    memory sink (the periodic summary "print"). Drains with AvailableNow
    and returns the finished StreamingQuery; read results from table
    ``query_name`` (latest row per host = the final summary).

    ``pages_table`` is a :class:`~..sources.tableio.SnapshotTable`: the
    source goes through the same guarded ``_page_stream`` as the routed
    stream — the ``part-*.parquet`` glob keeps a post-compaction start
    from ingesting merged rows twice (compact-* files land in the same
    data/ dir), and registering the checkpoint makes expire_snapshots
    refuse to unlink part-* files this stream has not listed yet."""
    from pyspark.sql import functions as F

    from ..operators.parse import parse_stage
    from .stream import _page_stream

    stream = _page_stream(
        spark, pages_table, checkpoint_dir, max_files_per_trigger
    )
    parsed = parse_stage(stream)
    # the aggregation domain = parsed ∪ bot, i.e. valid records on decodable
    # pages (router precedence error > unparsed — operators/route.py)
    valid = parsed.filter(F.col("record_valid") & F.col("html_valid"))
    out = cumulative_host_summaries(valid)
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
