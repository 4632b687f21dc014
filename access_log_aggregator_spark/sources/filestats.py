"""Per-file column statistics and scan-planning file pruning (zone maps).

Iceberg manifests carry per-data-file column bounds (``lower_bounds`` /
``upper_bounds`` / ``null_value_counts``) and its scan planner skips files
whose bounds provably exclude a query's predicate BEFORE any task is
scheduled. This module is that analog for :class:`~.tableio.SnapshotTable`:

- :func:`stats_from_footer` derives a JSON-safe stats record for one
  parquet file from its FOOTER only (row-group min/max/null-count — no
  data pages are read), combining row groups into file-level bounds;
- :func:`file_may_match` decides, from such a record, whether a file can
  contain any row satisfying a conjunction of simple predicates — the
  planning-time pruning test;
- :func:`spark_filter` turns the same predicates into the equivalent
  Catalyst filter, so a pruned read applies EXACTLY the predicate it
  pruned by (pruning stays a pure optimization, never a semantics change).

Soundness over completeness: a file is pruned only when its recorded
bounds PROVE no row can match. Missing stats (older snapshots, columns
parquet wrote no statistics for, types outside the supported set) always
fail OPEN — the file is scanned. Parquet writers may truncate string
bounds, but both parquet-mr and arrow keep them valid (min is rounded
down, max rounded up), and UTF-8's byte order equals code-point order, so
Python string comparison against the stored bounds stays sound. Float
columns additionally fail open on ``!=``/``>``/``>=``: parquet footers
exclude NaN from min/max while Spark and DuckDB order NaN greater than
every other double, so bounds can never prove those ops unmatched (note
Spark's own parquet row-group pushdown gets this wrong — this layer does
not inherit that bug, which matters when pushdown is disabled).

Why this matters at 100 TB: the live file set of a long-ingested table is
O(10^5) files, but a time-bounded query (``warc_ts >= X``) touches a thin
suffix of them. Parquet's own row-group stats only help AFTER Spark has
listed every file and scheduled a task per split; manifest-level pruning
removes the files at PLAN time, so task count, listing cost and scheduler
pressure scale with the matching data, not the table's history.

Reference parity note: the reference has no storage layer at all (it
tails flat files, internal/tailer/tailer.go:13-75); this module belongs
to the graft's Iceberg-table seam (SURVEY.md §1.4, §7.0).
"""

from __future__ import annotations

import datetime as _dt
import functools as _functools
from typing import Iterable, Optional, Sequence, Tuple

import pyarrow.parquet as pq

#: Predicate term: (column, op, value) with op in _OPS. Terms compose as a
#: conjunction (AND). Values may be str, bool, int, float, or datetime
#: (naive datetimes are taken as UTC, matching the session timezone).
Predicate = Tuple[str, str, object]

_OPS = ("=", "==", "!=", "<", "<=", ">", ">=")

_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


def _ts_micros(dt: _dt.datetime) -> int:
    """Epoch microseconds; naive datetimes are interpreted as UTC (the
    session factory pins spark.sql.session.timeZone=UTC)."""
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=_dt.timezone.utc)
    return (dt - _EPOCH) // _dt.timedelta(microseconds=1)


def _encode(v: object) -> tuple[Optional[str], object]:
    """(type tag, JSON-safe value) for a footer min/max value, or
    (None, None) when the type is outside the supported pruning set
    (bytes/binary, date, decimal, nested — fail open)."""
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "bool", v
    if isinstance(v, int):
        return "int", v
    if isinstance(v, float):
        return "float", v
    if isinstance(v, str):
        return "str", v
    if isinstance(v, _dt.datetime):
        return "ts", _ts_micros(v)
    return None, None


def _coerce(tag: str, v: object) -> Optional[object]:
    """A predicate value coerced into the stored stats domain for ``tag``,
    or None when the comparison is not type-sound (fail open)."""
    if tag == "ts":
        if isinstance(v, _dt.datetime):
            return _ts_micros(v)
        return None
    if tag in ("int", "float"):
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            return None
        return v
    if tag == "str":
        return v if isinstance(v, str) else None
    if tag == "bool":
        return v if isinstance(v, bool) else None
    return None


def stats_from_footer(path: str) -> dict:
    """File-level stats from one parquet footer (no data pages read) —
    see :func:`stats_from_metadata` for the record shape. Writers that
    still hold the footer (``pq.write_table(..., metadata_collector=)``)
    should call :func:`stats_from_metadata` directly and skip even this
    metadata read."""
    return stats_from_metadata(pq.read_metadata(path))


def stats_from_metadata(md) -> dict:
    """File-level stats from a ``pyarrow.parquet.FileMetaData`` (the
    object ``pq.read_metadata`` returns AND ``pq.write_table``'s
    ``metadata_collector`` hands back at write time — one code path, so
    write-time and read-time records are identical by construction).

    Returns ``{"rows": N, "cols": {name: {"type": tag, "min": v, "max": v}
    | {"all_null": True}}}``. A column appears only when EVERY row group
    recorded usable statistics for it (otherwise pruning on it would be
    unsound); ``all_null`` marks columns with zero non-null values —
    provably unmatched by any comparison predicate (SQL three-valued
    logic: ``NULL <op> v`` is never true).
    """
    schema = md.schema
    # top-level leaf columns only: a dotted path is a nested field, whose
    # bounds do not compose into a row-level predicate on the struct
    names = [schema.column(i).path for i in range(len(schema.names))]
    # the file's PHYSICAL top-level column set: under schema evolution a
    # file predating add_column(c) lacks c entirely, reads back all-NULL
    # for it, and is therefore provably unmatched by any comparison on c
    out: dict = {"rows": md.num_rows, "cols": {},
                 "schema_cols": sorted({n.split(".")[0] for n in names})}
    if md.num_row_groups == 0 or md.num_rows == 0:
        return out
    for ci, name in enumerate(names):
        if "." in name:
            continue
        lo = hi = None
        tag = None
        nulls = 0
        usable = True
        for gi in range(md.num_row_groups):
            rg = md.row_group(gi)
            col = rg.column(ci)
            st = col.statistics if col.is_stats_set else None
            if st is None or st.null_count is None:
                usable = False
                break
            nulls += st.null_count
            if st.null_count == rg.num_rows:
                continue  # an all-null row group contributes no bounds
            if not st.has_min_max:
                usable = False
                break
            t_lo, v_lo = _encode(st.min)
            t_hi, v_hi = _encode(st.max)
            if t_lo is None or t_hi != t_lo or (tag is not None and t_lo != tag):
                usable = False
                break
            tag = t_lo
            lo = v_lo if lo is None or v_lo < lo else lo
            hi = v_hi if hi is None or v_hi > hi else hi
        if not usable:
            continue
        if tag is None:  # every row group was all-null
            out["cols"][name] = {"all_null": True}
        else:
            out["cols"][name] = {"type": tag, "min": lo, "max": hi}
    return out


def validate_predicates(where: Sequence[Predicate]) -> None:
    for term in where:
        if len(term) != 3 or term[1] not in _OPS:
            raise ValueError(
                f"predicate must be (column, op, value) with op in {_OPS}: "
                f"{term!r}")


def file_may_match(stats: Optional[dict],
                   where: Sequence[Predicate],
                   table_cols: Optional[set] = None) -> bool:
    """False only when ``stats`` PROVES no row of the file satisfies the
    conjunction ``where``. Missing stats / unknown columns / type
    mismatches keep the file (fail open).

    ``table_cols`` (the tracked table schema's column names, when the
    caller has one and has already verified every predicate column is in
    it) additionally lets a file be pruned when it PHYSICALLY lacks a
    predicate column — a file predating ``add_column`` reads back
    all-NULL for it, so no comparison can match. Without ``table_cols``
    (untracked tables, whose read schema is footer-sampled and therefore
    not authoritative) absence stays fail-open."""
    if not where:
        return True
    if stats is None:
        return True
    if stats.get("rows") == 0:
        return False
    sc = stats.get("schema_cols")
    for col, op, val in where:
        if table_cols is not None and sc is not None and col not in sc:
            # the file physically lacks the column (predates an
            # add_column): every row reads back NULL for it, and
            # NULL <op> v is never true — prune regardless of op
            return False
        cs = stats.get("cols", {}).get(col)
        if cs is None:
            continue
        if cs.get("all_null"):
            return False  # comparisons never match NULL
        if not _bounds_may_match(cs, op, val):
            return False  # two comparisons: always checked first
        # the equality bloom proves the file never wrote this value — the
        # point-lookup case zone maps cannot prune (every file of a log
        # table spans 'a…'-to-'z…' hosts). Probed only when the cheap
        # bounds test above kept the file: it decompresses a bitmap.
        bl = cs.get("bloom")
        if (bl is not None and op in ("=", "==") and isinstance(val, str)
                and not bloom_may_contain(bl, val)):
            return False
    return True


def _bounds_may_match(cs: dict, op: str, val: object) -> bool:
    """The min/max test for one predicate term against one column's
    stats record: False only on proof, True for every fail-open case
    (no recorded bounds, type-unsound comparison, float NaN ops)."""
    if "type" not in cs:
        return True  # bloom-only record (footer bounds were unusable)
    v = _coerce(cs["type"], val)
    if v is None:
        return True
    if isinstance(v, float) and v != v:
        # a NaN PREDICATE value: bounds can prove nothing (Spark orders
        # NaN above every double, so e.g. `x < NaN` matches every
        # non-NaN row). This must be EXPLICIT in the keep-oriented
        # phrasing below — `lo < v` is Python-False for NaN, which
        # would silently flip fail-open into fail-closed (caught in
        # review; the old prune-oriented ifs failed open by accident).
        return True
    if cs["type"] == "float" and op in ("!=", ">", ">="):
        # Parquet footers EXCLUDE NaN from min/max, but Spark and
        # DuckDB both order NaN greater than every other double, so a
        # NaN ROW matches any !=, > or >= predicate. The bounds
        # therefore cannot prove absence of a match for these ops on
        # float columns — fail open. (=, < and <= stay prunable:
        # NaN = v, NaN < v and NaN <= v are never true for the
        # non-NaN v values admitted above.)
        return True
    lo, hi = cs["min"], cs["max"]
    if op in ("=", "=="):
        return not (v < lo or v > hi)
    if op == "!=":
        # all non-null values equal v (and NULL never matches !=)
        return not (lo == hi == v)
    if op == "<":
        return lo < v
    if op == "<=":
        return lo <= v
    if op == ">":
        return hi > v
    if op == ">=":
        return hi >= v
    return True  # unknown op: never prune without proof


def spark_filter(where: Sequence[Predicate]):
    """The Catalyst Column equivalent of the conjunction ``where`` — what a
    pruned read applies so pruning can never change results.

    Naive datetimes are made UTC-aware BEFORE becoming literals: the
    pruning layer interprets them as UTC (:func:`_ts_micros`), but py4j's
    DatetimeConverter builds the literal with ``time.mktime`` — the
    DRIVER's local timezone, which the session timeZone=UTC config does
    not govern. On a non-UTC driver the two layers would otherwise
    disagree by the UTC offset and pruning could drop matching rows."""
    from pyspark.sql import functions as F

    cond = None
    for col, op, val in where:
        if isinstance(val, _dt.datetime) and val.tzinfo is None:
            val = val.replace(tzinfo=_dt.timezone.utc)
        c = F.col(col)
        term = {"=": c == val, "==": c == val, "!=": c != val,
                "<": c < val, "<=": c <= val,
                ">": c > val, ">=": c >= val}[op]
        cond = term if cond is None else cond & term
    return cond


def _path_stats(path: str,
                bloom_cols: Sequence[str] = ()) -> tuple[str, Optional[dict]]:
    """Executor-side worker for :meth:`SnapshotTable.analyze`: one footer
    read per file (plus, when ``bloom_cols`` is set, one column read of
    just those columns to build equality blooms — the only stats that
    need values), run inside a Spark job so a 10^5-file table's stats
    sweep is distributed instead of a serial driver pass. A file a
    concurrent expire/truncate unlinked mid-sweep yields None (skipped)
    rather than failing the whole job."""
    try:
        rec = stats_from_footer(path)
        if bloom_cols:
            add_blooms_from_file(rec, path, bloom_cols)
        return path, rec
    except OSError:  # pyarrow's ArrowIOError subclasses OSError
        return path, None


def collect_stats_distributed(spark, paths: Iterable[str],
                              parallelism: Optional[int] = None,
                              bloom_cols: Sequence[str] = ()) -> dict:
    """Footer stats for ``paths`` computed by a Spark job (one task per
    slice of files); the driver collects only the narrow stats records —
    the Iceberg "rewrite manifests / collect stats" maintenance shape."""
    paths = list(paths)
    if not paths:
        return {}
    n = parallelism or min(len(paths), spark.sparkContext.defaultParallelism)
    rdd = spark.sparkContext.parallelize(paths, n)
    cols = tuple(bloom_cols)
    return dict(rdd.map(lambda p: _path_stats(p, cols)).collect())


# ---------------------------------------------------------------------------
# Per-file equality blooms (Iceberg puffin / parquet bloom-filter analog).
#
# Zone maps prune RANGES; they are useless for point lookups on columns
# whose values interleave across files (every file of a log table spans
# 'a…'-to-z…' hosts, so `host = 'x'` scans all of them). A per-file bloom
# over the column's DISTINCT values answers "can this file contain v?"
# at plan time with a few bit probes. Opt-in per table via the
# `bloom_cols` property (see SnapshotTable) because blooms, unlike
# footer bounds, require reading the column's VALUES — free on the
# in-memory write paths (append_pandas, compact), one column read on
# add_files/analyze — and because they only earn their manifest bytes on
# moderate-cardinality string columns (hosts, langs, categories): past
# BLOOM_MAX_DISTINCT distinct values the false-positive rate makes the
# filter dead weight, so such files simply record no bloom (fail open).
# The bitmap is zlib-compressed in the manifest — a 64-host file's bloom
# is tens of bytes, not BLOOM_M_BITS/8.
# ---------------------------------------------------------------------------

BLOOM_M_BITS = 32_768   # 4 KiB raw; fpr ~6e-4 at 2k distinct, ~2% at 4k
BLOOM_K = 7
BLOOM_MAX_DISTINCT = 4_096


def _bloom_positions(value: str) -> list:
    """K bit positions for a value: md5 split into two 64-bit halves,
    double-hashed (h1 + i*h2). md5 is used for STABILITY across runs and
    Python versions — this hash never crosses an engine boundary, so
    cross-engine exactness rules do not apply here."""
    import hashlib

    d = hashlib.md5(value.encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    return [((h1 + i * h2) & 0xFFFFFFFFFFFFFFFF) % BLOOM_M_BITS
            for i in range(BLOOM_K)]


def bloom_from_values(values: Iterable[str]) -> Optional[dict]:
    """A bloom record from an iterable of DISTINCT non-null strings, or
    None when empty or past BLOOM_MAX_DISTINCT (fail open — the fpr
    would be useless and the manifest bytes wasted)."""
    import base64
    import zlib

    bits = bytearray(BLOOM_M_BITS // 8)
    n = 0
    for v in values:
        n += 1
        if n > BLOOM_MAX_DISTINCT:
            return None
        for p in _bloom_positions(v):
            bits[p >> 3] |= 1 << (p & 7)
    if n == 0:
        return None
    return {"m": BLOOM_M_BITS, "k": BLOOM_K, "n": n,
            "z64": base64.b64encode(zlib.compress(bytes(bits))).decode()}


@_functools.lru_cache(maxsize=8192)
def _bloom_bits(z64: str):
    """Decode+decompress a bloom bitmap, memoized: planning a predicate
    over 10^5 files re-probes the same manifests call after call, and
    the bitmap bytes are immutable once written. None on any decode
    failure (fail open)."""
    import base64
    import zlib

    try:
        bits = zlib.decompress(base64.b64decode(z64))
    except Exception:
        return None
    return bits if len(bits) == BLOOM_M_BITS // 8 else None


def bloom_may_contain(bloom: dict, value: str) -> bool:
    """False only when the bloom PROVES the file never wrote ``value``.
    A record with unexpected parameters or an undecodable bitmap fails
    open — a manifest written by a future format must never turn into
    wrong pruning here."""
    if bloom.get("m") != BLOOM_M_BITS or bloom.get("k") != BLOOM_K:
        return True
    bits = _bloom_bits(bloom.get("z64", ""))
    if bits is None:
        return True
    return all((bits[p >> 3] >> (p & 7)) & 1 for p in _bloom_positions(value))


def add_blooms(stats: dict, table, cols: Sequence[str]) -> dict:
    """Attach equality blooms for the listed STRING columns to a stats
    record, from an in-memory arrow table's distinct values. Non-string
    or absent columns are skipped; a column past the distinct cap stores
    nothing (fail open). EVERY passed column is recorded in the
    ``bloomed`` considered-set either way, so ``analyze`` can tell
    "swept, nothing to store" from "never swept" and stay a no-op on
    re-runs. Mutates and returns ``stats``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for c in cols:
        if c in table.schema.names and (
                pa.types.is_string(table.schema.field(c).type)
                or pa.types.is_large_string(table.schema.field(c).type)):
            distinct = pc.unique(pc.drop_null(
                table.column(c).combine_chunks()))
            if len(distinct) <= BLOOM_MAX_DISTINCT:
                bl = bloom_from_values(distinct.to_pylist())
                if bl is not None:
                    stats.setdefault("cols", {}) \
                        .setdefault(c, {})["bloom"] = bl
    stats["bloomed"] = sorted(set(stats.get("bloomed", [])) | set(cols))
    return stats


def add_blooms_from_file(rec: dict, path: str,
                         bloom_cols: Sequence[str]) -> dict:
    """:func:`add_blooms` against a parquet FILE: reads only the bloom
    columns physically present (one column read — blooms are the one
    stat footers cannot provide), marking ALL requested columns
    considered so a later sweep is a no-op. Shared by ``add_files`` and
    the distributed ``analyze`` worker."""
    present = [c for c in bloom_cols
               if c in (rec.get("schema_cols") or [])]
    return add_blooms(rec, pq.read_table(path, columns=present),
                      bloom_cols)


def needs_bloom_sweep(rec: Optional[dict],
                      bloom_cols: Sequence[str]) -> bool:
    """True when a stats record predates some of the table's requested
    bloom columns (or is absent entirely) — the analyze re-sweep test."""
    if rec is None:
        return True
    return bool(bloom_cols) and \
        not set(bloom_cols) <= set(rec.get("bloomed", []))


def carry_blooms(old: Optional[dict], new: dict) -> dict:
    """Graft blooms an older stats record holds for columns a fresh
    re-sweep did not consider into the fresh record (and union the
    considered-sets). Without this, narrowing then re-widening the
    ``bloom_cols`` property would silently DROP already-built blooms on
    the next analyze (replacing the whole record), turning point lookups
    back into full scans. Fresh blooms always win for columns both
    records cover. Mutates and returns ``new``."""
    if old is None:
        return new
    for c, cs in (old.get("cols") or {}).items():
        bl = cs.get("bloom")
        if bl is not None and \
                "bloom" not in (new.get("cols") or {}).get(c, {}):
            new.setdefault("cols", {}).setdefault(c, {})["bloom"] = bl
    new["bloomed"] = sorted(set(new.get("bloomed", []))
                            | set(old.get("bloomed", [])))
    return new
