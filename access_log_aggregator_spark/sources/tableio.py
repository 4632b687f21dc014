"""SnapshotTable — the table-format seam (Iceberg-shaped, Parquet-backed).

The pipeline is written against this narrow interface so the storage backend
can be swapped for real Iceberg on a cluster (the sandbox bundles no Iceberg
runtime jars and has no network — SURVEY.md §7.0). What the pipeline relies
on, and what this implementation preserves:

- **atomic commits**: a snapshot becomes visible only via an atomic
  manifest swap (``os.replace``), so readers never see partial writes —
  the property that replaces the reference's rotation-safe tailing
  (internal/tailer/tailer.go:27-75);
- **immutable snapshots with monotonically increasing ids**: incremental
  processing = "files added after snapshot X" (the analog of the
  reference's seek-to-EOF tail cursor, internal/tailer/model.go:49-51);
- **idempotent commits**: a commit tagged with a ``marker`` (e.g. a batch
  id) is a no-op if that marker was already committed — Iceberg-style
  write idempotence for exactly-once accounting.

At 100 TB this maps 1:1 onto Iceberg: manifest -> table metadata,
snapshot id -> Iceberg snapshot id, marker -> WAP/commit property,
``read(start_after=...)`` -> ``option("start-snapshot-id", ...)``.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "manifest.json"


@dataclass
class Snapshot:
    id: int
    files: list[str]
    row_count: int
    marker: Optional[str] = None


class SnapshotTable:
    """A directory of immutable Parquet files + an atomically-swapped manifest."""

    def __init__(self, root: str | Path):
        self.root = Path(root)

    # -- lifecycle -----------------------------------------------------------
    @classmethod
    def create(cls, root: str | Path, name: str = "table") -> "SnapshotTable":
        t = cls(root)
        t.root.mkdir(parents=True, exist_ok=True)
        (t.root / "data").mkdir(exist_ok=True)
        if not (t.root / _MANIFEST).exists():
            t._write_manifest({"name": name, "snapshots": []})
        return t

    def exists(self) -> bool:
        return (self.root / _MANIFEST).exists()

    # -- manifest ------------------------------------------------------------
    def _manifest(self) -> dict:
        with open(self.root / _MANIFEST) as f:
            return json.load(f)

    def _write_manifest(self, m: dict) -> None:
        tmp = self.root / f"{_MANIFEST}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self.root / _MANIFEST)  # the atomic commit point

    def snapshots(self) -> list[Snapshot]:
        return [Snapshot(**s) for s in self._manifest()["snapshots"]]

    def current_snapshot_id(self) -> Optional[int]:
        snaps = self._manifest()["snapshots"]
        return snaps[-1]["id"] if snaps else None

    def committed_markers(self) -> set[str]:
        return {s["marker"] for s in self._manifest()["snapshots"] if s.get("marker")}

    # -- writes --------------------------------------------------------------
    def _commit_files(self, files: list[Path], row_count: int, marker: Optional[str]) -> int:
        m = self._manifest()
        if marker is not None and marker in {s.get("marker") for s in m["snapshots"]}:
            for f in files:  # duplicate commit: drop the staged files, keep table as-is
                f.unlink(missing_ok=True)
            return [s["id"] for s in m["snapshots"] if s.get("marker") == marker][0]
        sid = (m["snapshots"][-1]["id"] + 1) if m["snapshots"] else 1
        m["snapshots"].append(
            {"id": sid, "files": [str(f.relative_to(self.root)) for f in files],
             "row_count": row_count, "marker": marker}
        )
        self._write_manifest(m)
        return sid

    def append_pandas(self, pdf: pd.DataFrame, marker: Optional[str] = None,
                      schema: Optional[pa.Schema] = None) -> int:
        dest = self.root / "data" / f"part-{uuid.uuid4().hex}.parquet"
        table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
        pq.write_table(table, dest)
        return self._commit_files([dest], len(pdf), marker)

    def append_spark(self, df: DataFrame, marker: Optional[str] = None) -> int:
        """Write a DataFrame's partitions as one snapshot (staging dir + move)."""
        staging = self.root / f"_staging-{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(str(staging))
        moved: list[Path] = []
        n = 0
        for p in sorted(staging.glob("*.parquet")):
            dest = self.root / "data" / f"part-{uuid.uuid4().hex}.parquet"
            shutil.move(str(p), dest)
            n += pq.read_metadata(dest).num_rows
            moved.append(dest)
        shutil.rmtree(staging, ignore_errors=True)
        return self._commit_files(moved, n, marker)

    def truncate(self) -> None:
        """Drop all snapshots (used by tests / full-recompute mode)."""
        m = self._manifest()
        m["snapshots"] = []
        self._write_manifest(m)

    # -- reads ---------------------------------------------------------------
    def data_files(self, start_after: Optional[int] = None,
                   end: Optional[int] = None) -> list[str]:
        out: list[str] = []
        for s in self.snapshots():
            if start_after is not None and s.id <= start_after:
                continue
            if end is not None and s.id > end:
                continue
            out.extend(str(self.root / f) for f in s.files)
        return out

    def read(self, spark: SparkSession, start_after: Optional[int] = None,
             end: Optional[int] = None) -> Optional[DataFrame]:
        """Scan the table (optionally an incremental snapshot range).

        Returns None when the range is empty — the caller decides whether
        that means "nothing new" (incremental) or an error (full scan).
        """
        files = self.data_files(start_after=start_after, end=end)
        if not files:
            return None
        return spark.read.parquet(*files)

    def row_count(self) -> int:
        return sum(s.row_count for s in self.snapshots())
