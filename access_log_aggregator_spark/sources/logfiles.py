"""Raw access-log files as a Spark source — the reference's literal input.

The reference CLI is ``accessAgg -file a.log -file b.log`` over
newline-delimited JSON access logs (internal/config/flags.go:10-43,
internal/app/tail.go:19-43). This module maps that input mode onto a
distributed scan: ``spark.read.text`` splits each file into line rows at
HDFS-block granularity (parallel across executors, no driver loop), and
:func:`read_log_files` adapts the rows to the pages schema so the ENTIRE
existing pipeline — extraction (identity on a bare log line; byte-parity
proven on the reference corpus in tests/test_reference_corpus.py), the
dual parse engines, validation, enrich/route, salted aggregation —
runs unchanged on raw logs.

Semantics matched to the reference tailer:

- ``\\n`` is THE record delimiter and nothing else is: the reference reads
  ``ReadBytes('\\n')`` (tailer/tailer.go:14), so a ``\\r`` is ordinary line
  content (Go's ``json.Unmarshal`` then ignores it as trailing whitespace
  in the CRLF case). The scan sets ``lineSep="\\n"`` explicitly because
  ``spark.read.text``'s DEFAULT splits on ``\\r`` and ``\\r\\n`` too, which
  would both emit records the reference never sees (``a\\rb`` is ONE
  incomplete line to the reference, two rows to the default) and break the
  driver-side unterminated-tail probe below;
- the reference hands the line to ``json.Unmarshal`` INCLUDING the
  delimiter (and any CR before it), and Go's scanner skips exactly
  ``space \\t \\r \\n`` at both ends — so this source ``btrim``s that
  four-char set off each line before the pipeline's anchored extraction
  (``LINE_PATTERN`` requires the object flush at ``^``/``$``).
  Observationally identical to Go on every input: edge whitespace is
  ignored there, interior whitespace is untouched here;
- every delivered line is a record attempt — empty lines reach the parser
  and count as malformed, exactly like ``json.Unmarshal("")`` failing in
  ``model.go:18`` (``spark.read.text`` yields ``""`` for them);
- invalid UTF-8 becomes U+FFFD on both sides (Java's UTF-8 decode and
  Go's encoding/json both substitute the replacement rune inside string
  values), so the malformed/valid split agrees byte-for-byte;
- an UNTERMINATED final line is held back, not processed:
  ``tailer.go:13-25`` returns EOF without delivering a partial line (the
  newline is the record delimiter — the line may still be mid-write), so
  :func:`read_log_files` checks each file's final byte driver-side (one
  O(tail) read per FILE, not per row) and drops exactly one occurrence
  of the partial tail from that file. The drop uses a row_number window
  over rows identical in (file, text) — any one of them is the same row,
  so the nondeterministic pick does not affect results — and the window
  only ever runs when an unterminated file exists at all.

Paths are canonicalized with ``os.path.abspath`` — NOT ``resolve()`` —
and deduplicated before the scan: the held-tail join matches on
``input_file_name()``, which reports the path AS HANDED to the reader
(symlinks un-followed), so building the held rows from a symlink-resolved
path would silently never match and the partial line would leak through.
Listing the same file twice reads it once (the reference would tail a
double-listed file twice and double-count it — a degenerate shape; the
dedupe is the deliberate divergence).

At 100 TB: text-file splitting is per-block, so one huge log file still
scans wide; the hold-back check reads at most ``_TAIL_PROBE`` bytes per
file on the driver (file COUNT-proportional, like any listing); all
downstream processing is the audited pipeline (PLANS.md).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: bytes read from each file's end to recover the unterminated tail; a
#: partial line longer than this still holds correctly — the probe then
#: yields a strict SUFFIX of the tail and the drop matches on endswith
#: (only the one partial line in that file can end with its own suffix
#: at full probe length)
_TAIL_PROBE = 1 << 20


def canonical_paths(paths: Iterable[str | Path]) -> list[Path]:
    """Absolute (but NOT symlink-resolved — see module docstring), order-
    preserving, deduplicated path list: the single canonical form shared
    by the scan, the held-tail join and the CLI's idempotence marker."""
    return [Path(p) for p in dict.fromkeys(os.path.abspath(p) for p in paths)]


def _unterminated_tail(path: Path) -> tuple[str, bool] | None:
    """The file's trailing bytes after the last newline, decoded as the
    text source will decode them — or None when the file is empty or
    newline-terminated (nothing held). A trailing ``\\r`` does NOT
    terminate: the reference's delimiter is ``\\n`` alone. The bool is
    True when the probe captured the WHOLE tail (match on equality) and
    False when the tail is longer than the probe (match on endswith)."""
    size = path.stat().st_size
    if size == 0:
        return None
    with open(path, "rb") as f:
        f.seek(max(0, size - _TAIL_PROBE))
        chunk = f.read()
    if chunk.endswith(b"\n"):
        return None
    exact = b"\n" in chunk or size <= _TAIL_PROBE
    tail = chunk.rsplit(b"\n", 1)[-1]
    # same decode the JVM text source applies: invalid UTF-8 -> U+FFFD
    return tail.decode("utf-8", errors="replace"), exact


def read_log_files(spark: SparkSession, paths: Iterable[str | Path],
                   hold_unterminated: bool = True) -> DataFrame:
    """Raw newline-JSON access-log files -> a pages-shaped DataFrame.

    Output schema matches the pages table (url, warc_ts, html, text,
    lang): ``text`` is the raw line, ``url`` is ``log://<file>`` lineage,
    ``html`` re-encodes the line (UTF-8 valid by construction after the
    text source's decode), ``warc_ts`` is the epoch placeholder (the
    reference carries no per-file event time; the record's OWN ``time``
    field is what validation/aggregation read downstream), ``lang`` null.
    """
    paths = canonical_paths(paths)
    df = (spark.read.option("lineSep", "\n")  # \n ONLY — tailer parity
          .text([str(p) for p in paths])
          .select(F.col("value").alias("text"),
                  F.input_file_name().alias("_src")))

    if hold_unterminated:
        held = [(p.as_uri(), t[0], t[1])
                for p in paths
                for t in [_unterminated_tail(p)] if t is not None]
        if held:
            held_df = spark.createDataFrame(
                held, "_src string, _tail string, _exact boolean")
            df = df.join(F.broadcast(held_df), on="_src", how="left")
            affected = F.col("_tail").isNotNull() & F.when(
                F.col("_exact"), F.col("text") == F.col("_tail")
            ).otherwise(F.col("text").endswith(F.col("_tail")))
            # Split so the row_number shuffle carries ONLY the rows whose
            # text equals an unterminated file's tail (normally exactly
            # one row per held file) — a single conditional window over
            # the whole frame would hash-shuffle every line of every
            # file. Rows identical in (_src, text) are interchangeable,
            # so the unordered pick drops "the" partial tail
            # deterministically in effect: exactly one copy per file.
            rest = df.where(~affected)
            w = Window.partitionBy("_src", "text").orderBy(F.lit(1))
            extra_copies = (
                df.where(affected)
                .withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") > 1)
                .drop("_rn")
            )
            df = rest.unionByName(extra_copies).drop("_tail", "_exact")

    # Go-whitespace trim (see module docstring) AFTER the hold logic: the
    # held tail is matched against the raw line bytes, not the trim
    line = F.btrim(F.col("text"), F.lit(" \t\r\n"))
    return df.select(
        F.concat(F.lit("log://"), F.col("_src")).alias("url"),
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz").alias("warc_ts"),
        F.encode(line, "UTF-8").alias("html"),
        line.alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
