"""Canonical extraction + field-parse contract (the single source of truth).

The SAME compiled regexes back both the pure-Python oracle
(:mod:`access_log_aggregator_spark.oracle`) and the Spark-side parse stage
(:mod:`access_log_aggregator_spark.operators.parse`), so byte-identical
extraction per url holds by construction.

Reference semantics being re-expressed (citations into /root/reference/):
- record grammar: one JSON object per line with fields
  time/host/status_code/duration; extra fields ignored
  (internal/accesslog/model.go:9-14, model_test.go:19)
- validity: zero time OR empty host OR zero status_code OR zero duration
  => reject (internal/accesslog/model.go:24-26)
- an incomplete/unmatchable payload is never emitted as a record
  (internal/tailer/tailer_test.go:79-85) — here it routes to ``unparsed``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone
from typing import Optional

# ---------------------------------------------------------------------------
# The canonical regexes. Spark uses the *pattern strings* (Java regex) for
# regexp_extract/rlike; Python uses the compiled objects. The patterns are
# restricted to the syntax subset where Java and Python regex agree.
# ---------------------------------------------------------------------------

#: A page's embedded access-log payload is the FIRST newline-delimited line
#: that looks like a JSON object (starts with ``{"`` and ends with ``}``).
#: Byte-parity between engines is defined on this exact line.
LINE_PATTERN = r'^\{".*\}$'
LINE_RE = re.compile(LINE_PATTERN, re.MULTILINE)
LINE_RE_BYTES = re.compile(LINE_PATTERN.encode("ascii"), re.MULTILINE)

#: Grok-style field regex over the extracted line. The reference corpus
#: always emits keys in the order time,host,status_code,duration
#: (test/testdata/log.log:1-1001); extra fields only ever appear after
#: duration (model_test.go:19). A line that does not match is ``unparsed``.
FIELD_PATTERN = (
    r'^\{"time":"([^"]*)","host":"([^"]*)","status_code":(-?\d{1,18}),'
    r'"duration":(-?(?:\d+(?:\.\d+)?|\.\d+)(?:[eE][+-]?\d+)?)(?:,.*)?\}$'
)
FIELD_RE = re.compile(FIELD_PATTERN)

#: RFC3339 timestamps as produced by Go time.Time.MarshalJSON
#: (UTC 'Z' or numeric offset, optional 1-9 digit fraction).
TIME_PATTERN = (
    r"^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})"
    r"(?:\.(\d{1,9}))?(Z|[+-]\d{2}:\d{2})$"
)
TIME_RE = re.compile(TIME_PATTERN)

#: Go's zero time.Time marshals to this (time.Time.IsZero,
#: internal/accesslog/model.go:24 rejects it).
GO_ZERO_TIME = "0001-01-01T00:00:00Z"

#: Router classes (north_star match classes).
CLASS_PARSED = "parsed"
CLASS_UNPARSED = "unparsed"
CLASS_BOT = "bot"
CLASS_ERROR = "error"

#: reject_reason values for the unparsed/error sinks.
REASON_INVALID_UTF8 = "invalid_utf8"   # html bytes are not valid UTF-8
REASON_NO_PAYLOAD = "no_payload"       # no line matches LINE_RE
REASON_BAD_RECORD = "bad_record"       # extracted line fails FIELD_RE
REASON_INVALID_FIELD = "invalid_field" # model.go:24 validation failure


@dataclass(frozen=True)
class ParsedFields:
    """Raw string captures from FIELD_RE (pre-validation)."""

    time_str: str
    host: str
    status_str: str
    duration_str: str


def extract_line(text: str) -> Optional[str]:
    """Return the first JSON-object-looking line of ``text``, or None.

    This is THE extraction rule: both the oracle and the Spark pandas UDF
    evaluate exactly ``LINE_RE.search(text)``.
    """
    m = LINE_RE.search(text)
    return m.group(0) if m else None


def extract_line_bytes(data: bytes) -> Optional[bytes]:
    """Byte-level twin of :func:`extract_line` (parity is defined on bytes)."""
    m = LINE_RE_BYTES.search(data)
    return m.group(0) if m else None


def parse_fields(line: str) -> Optional[ParsedFields]:
    """Apply FIELD_RE to an extracted line; None when it doesn't match."""
    m = FIELD_RE.match(line)
    if m is None:
        return None
    return ParsedFields(m.group(1), m.group(2), m.group(3), m.group(4))


def parse_rfc3339(time_str: str) -> Optional[datetime]:
    """Parse an RFC3339 string to a tz-aware datetime (microsecond truncation).

    Returns None when the string does not parse (bad shape or an impossible
    calendar date — Go ``time.Parse`` rejects e.g. Feb 30). Fractional
    seconds beyond 6 digits are truncated toward zero, matching Spark's
    microsecond TimestampType (SURVEY.md §7.3: aggregation never uses
    sub-second precision, windows are hourly, so truncation is safe).
    """
    m = TIME_RE.match(time_str)
    if m is None:
        return None
    year, month, day, hh, mm, ss = (int(m.group(i)) for i in range(1, 7))
    frac = m.group(7) or ""
    micros = int(frac[:6].ljust(6, "0")) if frac else 0
    off = m.group(8)
    if off == "Z":
        tz = timezone.utc
    else:
        sign = 1 if off[0] == "+" else -1
        tz = timezone(sign * timedelta(hours=int(off[1:3]), minutes=int(off[4:6])))
    try:
        return datetime(year, month, day, hh, mm, ss, micros, tzinfo=tz)
    except ValueError:
        return None


def is_zero_time(time_str: str) -> bool:
    """Go ``time.Time.IsZero`` analog for RFC3339 strings.

    The zero instant is 0001-01-01T00:00:00 UTC (model.go:24). Offset
    variants of the same instant would underflow datetime; the reference
    corpus only emits 'Z', and any string that *parses* to year 1 Jan 1
    00:00:00.000000000 UTC counts as zero.
    """
    if time_str == GO_ZERO_TIME:
        return True
    dt = parse_rfc3339(time_str)
    if dt is None:
        return False
    try:
        return dt.astimezone(timezone.utc) == datetime(1, 1, 1, tzinfo=timezone.utc)
    except (OverflowError, ValueError):
        return False


def validate_fields(f: ParsedFields) -> Optional[str]:
    """Reference validation (model.go:24-26). Returns a reject reason or None.

    Rules, exactly: zero time, empty host, status_code == 0, duration == 0.0.
    A time string that fails to parse is equivalent to Go's json unmarshal
    error on the field — the record is rejected either way; we classify both
    as REASON_INVALID_FIELD (the reference folds every failure into one
    malformRecord counter, internal/app/aggregate.go:38-41).
    """
    ts = parse_rfc3339(f.time_str)
    if ts is None or is_zero_time(f.time_str):
        return REASON_INVALID_FIELD
    if f.host == "":
        return REASON_INVALID_FIELD
    try:
        status = int(f.status_str)
    except ValueError:  # pragma: no cover - regex guarantees digits
        return REASON_INVALID_FIELD
    if status == 0 or not (-(2**63) <= status < 2**63):
        # Go int is 64-bit; overflow is an unmarshal error => rejected.
        return REASON_INVALID_FIELD
    duration = float(f.duration_str)
    if duration == 0.0:
        return REASON_INVALID_FIELD
    return None
