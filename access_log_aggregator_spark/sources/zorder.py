"""Z-order (Morton-curve) clustering for compaction rewrites.

``compact(sort_by=[c])`` keeps ONE column's manifest bounds tight after a
rewrite; a table scanned by two independent predicates (hosts AND time,
status AND duration) needs locality in both. Z-ordering interleaves the
bits of each column's rank code so rows close in ANY clustered dimension
land in the same output file — the Iceberg ``rewrite_data_files``
z-order strategy analog, feeding the same manifest-bounds pruning
(sources/filestats.py).

Codes are RANK-based (each value's position in the column's sort order,
scaled to 16 bits), not min-max scaled: a skewed column under min-max
scaling collapses most rows into a few codes and the curve degenerates
to the other dimension; ranks spread any distribution uniformly. Nulls
sort last (one contiguous code region), matching the ``sort_by`` path's
null placement. Everything is a driver-side numpy pass over the merged
arrow table — compaction already materializes it (tableio.compact).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: bits per column code; k columns use k * CODE_BITS bits of the z-value
CODE_BITS = 16

#: uint64 z-values bound the column count
MAX_COLS = 64 // CODE_BITS


def column_codes(table: pa.Table, col: str) -> np.ndarray:
    """16-bit rank codes of a column (uint64 for shifting). A column the
    table physically lacks (files predating a schema-evolution add read
    all-null) codes to all-zero — every row equal, contributing nothing
    to the curve, exactly like ``sort_by``'s 'any order is sorted'."""
    n = table.num_rows
    if col not in table.schema.names:
        return np.zeros(n, dtype=np.uint64)
    idx = pc.sort_indices(table.column(col))  # ascending, nulls last
    ranks = np.empty(n, dtype=np.uint64)
    ranks[idx.to_numpy(zero_copy_only=False)] = np.arange(n, dtype=np.uint64)
    return (ranks << CODE_BITS) // max(n, 1)


def zorder_values(table: pa.Table, cols: Sequence[str]) -> np.ndarray:
    """The Morton interleave: bit ``b`` of column ``j``'s code lands at
    z-bit ``b * k + j``, so truncating the z-value from the top refines
    all k dimensions together."""
    k = len(cols)
    if not 1 <= k <= MAX_COLS:
        raise ValueError(
            f"zorder_by takes 1..{MAX_COLS} columns, got {k} "
            f"(one column is plain sort_by; more than {MAX_COLS} "
            f"exceeds the uint64 z-value)")
    codes = [column_codes(table, c) for c in cols]
    z = np.zeros(table.num_rows, dtype=np.uint64)
    for bit in range(CODE_BITS):
        for j, c in enumerate(codes):
            z |= ((c >> np.uint64(bit)) & np.uint64(1)) \
                << np.uint64(bit * k + j)
    return z


def zorder_sort_indices(table: pa.Table, cols: Sequence[str]) -> pa.Array:
    """Row indices that order ``table`` along the z-curve (stable, so
    equal z-values keep their input order)."""
    return pa.array(np.argsort(zorder_values(table, cols), kind="stable"))
