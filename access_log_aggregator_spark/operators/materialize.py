"""Materialization seam for shared intermediate frames.

The pair-generation operators (operators/dedup.py, cluster.py, text.py)
each compute a narrow intermediate frame — minhash signatures, LSH band
rows, per-round component labels, exploded tokens — that multiple
downstream consumers read. Catalyst inlines shared subtrees, so without a
materialization point the expensive upstream (tokenize + hash the whole
corpus) is re-evaluated once per consumer. Two strategies, one interface:

- :class:`LocalCheckpointMaterializer` (default): ``localCheckpoint`` —
  zero setup, blocks freed by the ContextCleaner when the frame is GC'd.
  The blocks are EXECUTOR-LOCAL and unreplicated: correct and fast on
  local[*] / single-node, but on a multi-executor cluster an executor
  loss loses its blocks and fails the job (Spark cannot recompute a
  checkpoint-truncated lineage).
- :class:`TableMaterializer`: write the frame ONCE to a
  :class:`~..sources.tableio.SnapshotTable` (atomic manifest commit) and
  read it back — the durable path SCALE.md prescribes for 100 TB runs
  ("write the signature table once, band-join the narrow table"). On a
  real cluster the table root lives on the DFS, so recomputation after
  executor loss is a re-READ, not a re-run; the band/signature tables are
  also reusable across jobs (incremental dedup re-runs).

Operators take an optional ``materializer=`` argument and otherwise use
the process default, switchable for a scope via :func:`using_materializer`
— so a pipeline flips every operator to the durable path with one line,
without threading the option through each call site.
"""

from __future__ import annotations

import shutil
from contextlib import contextmanager
from pathlib import Path
from typing import Iterator, Optional

from pyspark.sql import DataFrame

from ..sources.tableio import SnapshotTable


class Materializer:
    """Strategy interface: pin a frame so its plan subtree runs once."""

    def pin(self, df: DataFrame, name: str = "frame") -> DataFrame:
        raise NotImplementedError

    def close(self) -> None:
        """Release pinned storage. Only call after every DataFrame built on
        pinned frames has been fully consumed (collected/written) — a
        table-backed frame reads its files lazily."""


class LocalCheckpointMaterializer(Materializer):
    """``localCheckpoint(eager=False)`` — the single-node default."""

    def pin(self, df: DataFrame, name: str = "frame") -> DataFrame:
        return df.localCheckpoint(eager=False)

    def close(self) -> None:  # ContextCleaner frees blocks on GC
        pass


class TableMaterializer(Materializer):
    """Durable pin: each frame becomes one SnapshotTable under ``root``.

    The write is eager (a Spark action) — the cost SCALE.md budgets for
    ("one extra write+read of a narrow table per pair operator"); every
    consumer then scans parquet instead of re-running the subtree, and an
    executor loss costs a re-read. ``close()`` removes the tables; on a
    cluster, point ``root`` at a job-scoped DFS directory instead and let
    retention policy (or the job teardown) reclaim it.
    """

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self._seq = 0
        self._tables: list[SnapshotTable] = []

    def pin(self, df: DataFrame, name: str = "frame") -> DataFrame:
        self._seq += 1
        table = SnapshotTable.create(self.root / f"{self._seq:03d}-{name}",
                                     name=name)
        table.append_spark(df)
        self._tables.append(table)
        out = table.read(df.sparkSession)
        if out is None:  # zero-row frame: preserve the schema contract
            return df.sparkSession.createDataFrame([], df.schema)
        return out

    def close(self) -> None:
        for t in self._tables:
            shutil.rmtree(t.root, ignore_errors=True)
        self._tables.clear()


_DEFAULT: Materializer = LocalCheckpointMaterializer()
_active: Materializer = _DEFAULT


def active_materializer() -> Materializer:
    return _active


def pin(df: DataFrame, name: str = "frame",
        materializer: Optional[Materializer] = None) -> DataFrame:
    """Pin ``df`` with the given (or the active) materializer."""
    return (materializer or _active).pin(df, name)


@contextmanager
def using_materializer(m: Materializer) -> Iterator[Materializer]:
    """Scope ``m`` as the process-default materializer.

    Does NOT close ``m`` on exit: frames pinned inside the scope may still
    back DataFrames consumed after it (pins happen at plan-build time,
    reads at action time).
    """
    global _active
    prev = _active
    _active = m
    try:
        yield m
    finally:
        _active = prev
