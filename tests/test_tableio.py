"""SnapshotTable semantics: atomic commits, markers, incremental ranges."""

from __future__ import annotations

import pandas as pd

from access_log_aggregator_spark.sources.tableio import SnapshotTable


def _pdf(n, base=0):
    return pd.DataFrame({"a": range(base, base + n), "b": ["x"] * n})


def test_append_and_row_count(tmp_path):
    t = SnapshotTable.create(tmp_path / "t")
    assert t.current_snapshot_id() is None
    s1 = t.append_pandas(_pdf(5))
    s2 = t.append_pandas(_pdf(3, 5))
    assert (s1, s2) == (1, 2)
    assert t.row_count() == 8
    assert t.current_snapshot_id() == 2


def test_marker_idempotence(tmp_path):
    t = SnapshotTable.create(tmp_path / "t")
    s1 = t.append_pandas(_pdf(5), marker="batch-1")
    s1_again = t.append_pandas(_pdf(5), marker="batch-1")
    assert s1 == s1_again
    assert t.row_count() == 5
    assert t.committed_markers() == {"batch-1"}


def test_incremental_file_ranges(tmp_path):
    t = SnapshotTable.create(tmp_path / "t")
    for i in range(4):
        t.append_pandas(_pdf(2, i * 2))
    assert len(t.data_files()) == 4
    assert len(t.data_files(start_after=2)) == 2
    assert len(t.data_files(start_after=2, end=3)) == 1
    assert t.data_files(start_after=4) == []


def test_truncate(tmp_path):
    t = SnapshotTable.create(tmp_path / "t")
    t.append_pandas(_pdf(5))
    t.truncate()
    assert t.row_count() == 0 and t.data_files() == []


def test_create_is_reentrant(tmp_path):
    t = SnapshotTable.create(tmp_path / "t")
    t.append_pandas(_pdf(2))
    t2 = SnapshotTable.create(tmp_path / "t")  # reopen, not reset
    assert t2.row_count() == 2
