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
    #: "append" adds rows; "replace" rewrites the live file set without
    #: changing table contents (compaction — Iceberg's rewrite_data_files).
    #: Incremental readers skip replace snapshots: they carry no new rows.
    operation: str = "append"


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
    def _commit_files(self, files: list[Path], row_count: int,
                      marker: Optional[str], operation: str = "append") -> int:
        m = self._manifest()
        if marker is not None and marker in {s.get("marker") for s in m["snapshots"]}:
            # duplicate commit: drop the staged files, keep table as-is.
            # Callers that pass PRE-EXISTING live files (compact's carried
            # singles) must pre-check the marker before staging — this
            # path assumes every file in ``files`` is freshly staged.
            live = set(self.data_files())
            for f in files:
                if str(f) not in live:
                    f.unlink(missing_ok=True)
            return [s["id"] for s in m["snapshots"] if s.get("marker") == marker][0]
        sid = (m["snapshots"][-1]["id"] + 1) if m["snapshots"] else 1
        m["snapshots"].append(
            {"id": sid, "files": [str(f.relative_to(self.root)) for f in files],
             "row_count": row_count, "marker": marker, "operation": operation}
        )
        self._write_manifest(m)
        return sid

    def compact(self, rows_per_file: int = 1_000_000,
                marker: Optional[str] = None) -> Optional[int]:
        """Small-file compaction (Iceberg ``rewrite_data_files`` analog):
        rewrite the CURRENT live file set into ~``rows_per_file``-row files
        and commit a ``replace`` snapshot. Table contents are unchanged;
        old files stay on disk so earlier snapshots remain readable (time
        travel / snapshot isolation) until an expiry job removes them.
        Incremental readers are unaffected: ``read(start_after=cursor)``
        only returns APPEND snapshots, so rewritten rows are never
        re-processed. CAVEAT: the streaming mode's file source
        (streaming/stream.py) discovers files by DIRECTORY listing, not via
        this manifest — do not compact a table a directory-based stream is
        tailing (it would re-ingest the merged files); real Iceberg solves
        this with manifest-based streaming reads. Returns the new snapshot
        id, or None if the table has fewer than two live files."""
        from collections import defaultdict

        if marker is not None and marker in self.committed_markers():
            # pre-check BEFORE touching any files: the duplicate-marker
            # path of _commit_files unlinks whatever it is passed, and
            # compact may pass pre-existing live files (carried singles)
            m = self._manifest()
            return [s["id"] for s in m["snapshots"] if s.get("marker") == marker][0]
        live = self.data_files()
        groups: dict[Path, list[str]] = defaultdict(list)
        for f in live:
            # merge only within a directory: hive-partitioned layouts keep
            # the partition value in the dir name, not the file, so a
            # cross-directory merge would lose the partition column
            groups[Path(f).parent].append(f)
        if not any(len(fs) > 1 for fs in groups.values()):
            return None
        out: list[Path] = []
        total = 0
        for d, fs in sorted(groups.items()):
            if len(fs) == 1:  # already compact: carry the file as-is
                out.append(Path(fs[0]))
                total += pq.read_metadata(fs[0]).num_rows
                continue
            merged = pa.concat_tables(
                [pq.read_table(f) for f in fs], promote_options="default"
            )
            total += merged.num_rows
            for lo in range(0, max(merged.num_rows, 1), rows_per_file):
                dest = d / f"compact-{uuid.uuid4().hex}.parquet"
                pq.write_table(merged.slice(lo, rows_per_file), dest)
                out.append(dest)
        return self._commit_files(out, total, marker, operation="replace")

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
    def _live_snapshots(self, end: Optional[int] = None) -> list[Snapshot]:
        """The snapshots composing the table STATE as of ``end`` (default:
        current): the latest replace snapshot (the rewritten base) plus
        every append after it."""
        snaps = [s for s in self.snapshots() if end is None or s.id <= end]
        base = -1
        for s in snaps:
            if s.operation == "replace":
                base = s.id
        return [s for s in snaps if s.id >= base and
                (s.operation == "append" or s.id == base)]

    def data_files(self, start_after: Optional[int] = None,
                   end: Optional[int] = None) -> list[str]:
        if start_after is not None:
            # incremental scan: NEW ROWS only — append snapshots past the
            # cursor (replace snapshots rewrite existing rows; including
            # them would double-process after a compaction)
            snaps = [s for s in self.snapshots()
                     if s.id > start_after and s.operation == "append"
                     and (end is None or s.id <= end)]
        else:
            snaps = self._live_snapshots(end)
        out: list[str] = []
        for s in snaps:
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
        return sum(s.row_count for s in self._live_snapshots())
