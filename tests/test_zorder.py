"""Z-order compaction (sources/zorder.py + compact(zorder_by=...)).

Pins the property sort_by cannot have: after a z-ordered rewrite, EVERY
clustered column's per-file bounds stay tight, so manifest pruning works
on any of them — plus the Morton math itself, the schema-evolution /
validation edges shared with sort_by, and result equality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from access_log_aggregator_spark.sources import zorder
from access_log_aggregator_spark.sources.tableio import SnapshotTable


# ---------------------------------------------------------------------------
# Morton math
# ---------------------------------------------------------------------------

def _py_morton(a: int, b: int) -> int:
    z = 0
    for bit in range(zorder.CODE_BITS):
        z |= ((a >> bit) & 1) << (2 * bit)
        z |= ((b >> bit) & 1) << (2 * bit + 1)
    return z


def test_zorder_values_match_reference_morton():
    # ranks are i * 2^16 // n; reproduce them and the interleave in
    # plain python ints
    n = 64
    a = list(range(n))                       # already sorted -> rank = i
    b = [(i * 37) % n for i in range(n)]     # a permutation
    tbl = pa.table({"a": a, "b": b})
    got = zorder.zorder_values(tbl, ["a", "b"])
    b_rank = {v: r for r, v in enumerate(sorted(b))}
    want = [_py_morton((i << 16) // n, (b_rank[b[i]] << 16) // n)
            for i in range(n)]
    assert got.tolist() == want


def test_zorder_quadrants():
    # 2-D uniform grid: the first quarter of the curve is exactly the
    # low-low quadrant, i.e. both dims' low halves — the locality pruning
    # relies on
    n = 16
    rows = [(i, j) for i in range(n) for j in range(n)]
    tbl = pa.table({"a": [r[0] for r in rows], "b": [r[1] for r in rows]})
    order = zorder.zorder_sort_indices(tbl, ["a", "b"]).to_pylist()
    first_quarter = {rows[i] for i in order[: n * n // 4]}
    assert first_quarter == {(i, j) for i in range(n // 2)
                             for j in range(n // 2)}


def test_zorder_column_count_bounds():
    tbl = pa.table({"a": [1, 2], "b": [3, 4]})
    with pytest.raises(ValueError):
        zorder.zorder_values(tbl, [])
    with pytest.raises(ValueError):
        zorder.zorder_values(tbl, ["a"] * 5)


def test_zorder_nulls_and_missing_columns():
    tbl = pa.table({"a": [3, None, 1, None]})
    codes = zorder.column_codes(tbl, "a")
    # nulls sort last: the two null rows take the two highest codes
    assert set(codes.tolist()[1::2]) == set(sorted(codes.tolist())[-2:])
    assert zorder.column_codes(tbl, "ghost").tolist() == [0, 0, 0, 0]
    # stable argsort: an all-missing clustering keeps input order
    assert zorder.zorder_sort_indices(tbl, ["ghost"]).to_pylist() == \
        [0, 1, 2, 3]


# ---------------------------------------------------------------------------
# compact(zorder_by=...)
# ---------------------------------------------------------------------------

def _grid_table(tmp_path) -> SnapshotTable:
    """8 small appends of 50 rows; columns a and b are independent
    pseudo-random ints in [0, 100) — every FILE spans nearly the full
    range of both, so pre-compaction pruning is hopeless on either."""
    t = SnapshotTable.create(tmp_path / "grid")
    for s in range(8):
        i = np.arange(s * 50, (s + 1) * 50)
        t.append_pandas(pd.DataFrame({
            "a": (i * 7919) % 100,
            "b": (i * 104729 + 13) % 100,
        }), marker=f"g{s}")
    return t


def _bounds(t: SnapshotTable, sid: int, col: str):
    (snap,) = [s for s in t.snapshots() if s.id == sid]
    return sorted((snap.stats[f]["cols"][col]["min"],
                   snap.stats[f]["cols"][col]["max"])
                  for f in snap.files)


def test_zorder_compaction_prunes_on_every_dimension(spark, tmp_path):
    t = _grid_table(tmp_path)
    before = {tuple(r) for r in t.read(spark).collect()}
    lo_a = {tuple(r) for r in
            t.read(spark, where=[("a", "<", 25)]).collect()}
    sid = t.compact(rows_per_file=100, zorder_by=["a", "b"])
    assert sid is not None
    # 400 rows at 100/file = 4 z-quadrant files: each covers ~half the
    # range of a AND of b, so a one-sided predicate on EITHER column
    # prunes about half the files
    assert len(_bounds(t, sid, "a")) == 4
    for col in ("a", "b"):
        planned = t.data_files(where=[(col, "<", 25)])
        assert len(planned) <= 2, (col, _bounds(t, sid, col))
    # pruning stayed a pure optimization
    assert {tuple(r) for r in t.read(spark).collect()} == before
    assert {tuple(r) for r in
            t.read(spark, where=[("a", "<", 25)]).collect()} == lo_a
    # growth-bounded idempotence survives the z path
    assert t.compact(rows_per_file=100, zorder_by=["a", "b"]) is None


def test_sort_by_cannot_prune_the_second_dimension(spark, tmp_path):
    # the motivating contrast: lexicographic sort keeps only the leading
    # column's bounds tight
    t = _grid_table(tmp_path)
    sid = t.compact(rows_per_file=100, sort_by=["a"])
    assert sid is not None
    assert len(t.data_files(where=[("a", "<", 25)])) <= 2
    assert len(t.data_files(where=[("b", "<", 25)])) == 4  # no pruning


def test_zorder_validation_edges(tmp_path):
    t = _grid_table(tmp_path)
    with pytest.raises(ValueError, match="not both"):
        t.compact(sort_by=["a"], zorder_by=["b"])
    with pytest.raises(ValueError, match="zorder_by"):
        t.compact(zorder_by=["a", "ghost"])  # tracked table: upfront
    with pytest.raises(ValueError):
        t.compact(zorder_by=["a"] * 5)
    # nothing was committed by the failed attempts
    assert len(t.snapshots()) == 8


def test_zorder_after_schema_evolution_add(spark, tmp_path):
    # files predating an added column read all-null for it: the z path
    # codes it all-zero, clustering degenerates to the present column,
    # and the rewrite still commits under the current schema
    t = _grid_table(tmp_path)
    t.add_column("c", "bigint")
    sid = t.compact(rows_per_file=100, zorder_by=["a", "c"])
    assert sid is not None
    assert len(t.data_files(where=[("a", "<", 25)])) <= 2
    out = t.read(spark)
    assert out.where("c is not null").count() == 0
    assert out.count() == 400
