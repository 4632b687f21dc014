"""Checkpointed, snapshot-incremental execution (resumability).

The reference's incremental cursor is "seek to EOF at open, then tail"
(internal/tailer/model.go:49-51); its crash-safety is drain-before-final
(internal/app/aggregate.go:28-41). The Spark-native analog:

- the pages table exposes immutable snapshots (SnapshotTable / Iceberg);
- a JSON checkpoint records the last fully-processed snapshot id plus
  per-batch metrics (atomic ``os.replace`` commit);
- each batch's sink commit carries the batch id as an idempotence marker,
  so a crash between sink-commit and checkpoint-commit re-runs the batch as
  a no-op — exactly-once accounting without a transaction coordinator.

``--from-start`` (the reference flag, internal/config/flags.go:11) maps to
"ignore any existing checkpoint and process from snapshot 0".
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import asdict, dataclass, field
from dataclasses import fields as dataclass_fields
from pathlib import Path
from typing import Optional

from pyspark.sql import SparkSession

from ..sources.tableio import SnapshotTable
from .pipeline import BatchResult, Pipeline


#: per-batch metric records kept in the checkpoint file. The CURSOR is
#: last_snapshot_id alone; batches[] is diagnostic history nothing reads
#: back programmatically, and the whole state is rewritten after every
#: batch — unbounded history would make each commit pay
#: O(total-batches-ever) serialization (quadratic cumulative I/O over a
#: table's lifetime) for entries only humans ever look at.
BATCH_HISTORY_LIMIT = 1000


@dataclass
class CheckpointState:
    last_snapshot_id: int = 0
    batches: list[dict] = field(default_factory=list)


class Checkpoint:
    def __init__(self, path: str | Path):
        self.path = Path(path)

    def load(self) -> CheckpointState:
        if not self.path.exists():
            return CheckpointState()
        with open(self.path) as f:
            d = json.load(f)
        # ignore unknown keys: a checkpoint annotated by a newer release
        # (or by hand) must still load, not crash every subsequent run
        # with a TypeError before any processing happens
        known = {f.name for f in dataclass_fields(CheckpointState)}
        return CheckpointState(**{k: v for k, v in d.items() if k in known})

    def save(self, state: CheckpointState) -> None:
        state.batches = state.batches[-BATCH_HISTORY_LIMIT:]
        self.path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.path.with_suffix(f".{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(asdict(state), f, indent=1)
        os.replace(tmp, self.path)


def run_incremental(
    spark: SparkSession,
    pages_table: SnapshotTable,
    pipeline: Pipeline,
    checkpoint: Checkpoint,
    from_start: bool = False,
    max_batches: Optional[int] = None,
) -> list[BatchResult]:
    """Process every unprocessed pages snapshot, one batch per snapshot.

    Returns the BatchResults of this invocation. Safe to kill between
    batches and re-run: completed batches are skipped via the checkpoint,
    and a batch whose sink committed but whose checkpoint didn't is
    deduplicated by the sink's idempotence marker.
    """
    state = CheckpointState() if from_start else checkpoint.load()
    results: list[BatchResult] = []

    # fail closed on expired history: appends removed by compact+expire
    # live only in the replace base, which the incremental loop below
    # skips BY DESIGN (a replace carries no new rows) — so a cursor
    # behind the highest expired append id would otherwise silently
    # advance past rows it never processed. --from-start over a sink
    # with no batch-routed rows below the base may instead REBUILD from
    # the base's full content (one batch, marker pages-snap-<base>).
    ceiling = pages_table.expired_append_ceiling()
    if ceiling and state.last_snapshot_id < ceiling:
        base = pages_table.live_base_id()
        sink_markers = (pipeline.routed_table.committed_markers()
                        if pipeline.routed_table.exists() else set())
        # a rebuild re-commits the base's FULL content, so any sink rows
        # committed under a marker the rebuild will not reuse would be
        # duplicated: pages-snap ids below the base (pre-expiry batch
        # runs) AND every non-batch marker (stream-N, logfiles-* — rows
        # the base also contains, filed under a different lineage).
        # Allowed: pages-snap-<base> itself (idempotent rebuild retry)
        # and pages-snap ids above the base (the incremental loop below
        # re-processes those snapshots under the SAME marker = no-op).
        foreign = sorted(
            m for m in sink_markers
            if not (m.startswith("pages-snap-")
                    and m[len("pages-snap-"):].isdigit()
                    and int(m[len("pages-snap-"):]) >= base))
        if not from_start or foreign:
            raise RuntimeError(
                f"snapshot(s) up to id {ceiling} of {pages_table.root} "
                "were compacted + expired before this checkpoint "
                f"(cursor {state.last_snapshot_id}) processed them; their "
                "rows now exist only in the replace base, which "
                "incremental reads skip. "
                + (f"The routed sink already holds rows committed under "
                   f"marker(s) {foreign[:3]}"
                   f"{'...' if len(foreign) > 3 else ''} from before the "
                   "expiry, so a rebuild here would duplicate them — "
                   "rerun with --from-start into a FRESH --out."
                   if foreign else
                   "Rerun with --from-start to rebuild from the live "
                   "view, or continue via the stream-managed path.")
            )
        batch_df = pages_table.read(spark, end=base)
        if batch_df is not None:
            res = pipeline.process_batch(batch_df,
                                         batch_id=f"pages-snap-{base}")
            results.append(res)
            state.batches.append(
                {"batch_id": res.batch_id, "pages_snapshot": base,
                 "routed_snapshot": res.snapshot_id,
                 "rows_in": res.rows_in, "sink_counts": res.sink_counts,
                 "malformed": res.malformed, "rebuild_from_base": True}
            )
        state.last_snapshot_id = base
        checkpoint.save(state)

    snaps = [s for s in pages_table.snapshots() if s.id > state.last_snapshot_id]
    for s in snaps[:max_batches]:
        batch_df = pages_table.read(spark, start_after=s.id - 1, end=s.id)
        if batch_df is None:  # empty snapshot — still advance the cursor
            state.last_snapshot_id = s.id
            checkpoint.save(state)
            continue
        res = pipeline.process_batch(batch_df, batch_id=f"pages-snap-{s.id}")
        results.append(res)
        state.last_snapshot_id = s.id
        state.batches.append(
            {
                "batch_id": res.batch_id,
                "pages_snapshot": s.id,
                "routed_snapshot": res.snapshot_id,
                "rows_in": res.rows_in,
                "sink_counts": res.sink_counts,
                "malformed": res.malformed,
            }
        )
        checkpoint.save(state)
    return results
