"""Reference-exact parsing oracle.

Two layers:

1. :func:`go_parse_record` — a faithful emulation of the reference's
   ``NewRecord`` (internal/accesslog/model.go:16-29), i.e. Go
   ``encoding/json`` unmarshal into the 4-field struct followed by the
   zero-value validation. Used to port the reference's unit-test vectors
   (model_test.go, integration_test.go:159-287) verbatim.

2. :func:`classify_page` — the page-level canonical contract
   (extract -> field regex -> validate -> route) shared with the Spark
   parse stage. On the generated corpus the two layers agree; a dedicated
   test asserts that agreement.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime
from typing import Optional

from ..functions import extract as X


class GoParseError(Exception):
    """Raised where the reference's NewRecord returns an error."""


@dataclass
class Record:
    """The reference Record struct (model.go:9-14)."""

    time: datetime          # tz-aware, microsecond precision
    time_str: str           # original RFC3339 string (nanos preserved)
    host: str
    status_code: int
    duration: float


def go_parse_record(raw: bytes) -> Record:
    """NewRecord (model.go:16-29): unmarshal + zero-value validation.

    Raises GoParseError exactly where the reference returns an error:
    - JSON syntax error / trailing content (model_test.go:30) /
      NaN-Infinity literals / float64 range overflow,
    - field type mismatch (string into int, number into string, non-integer
      number into int, non-RFC3339 time string, bool anywhere),
    - zero time / empty host / zero status / zero duration (model.go:24).
    ``null`` for a field leaves the Go zero value (NOT a type error).

    Invalid UTF-8 input: Go coerces invalid bytes to U+FFFD when decoding
    into strings but still scans structure bytewise; decoding with 'replace'
    matches observable behavior on the test domain. The unmarshal grammar
    itself is the shared primitive :func:`...functions.extract.go_unmarshal_fields`.
    """
    s = raw.decode("utf-8", errors="replace")
    fields = X.go_unmarshal_fields(s)
    if fields is None:
        raise GoParseError("invalid JSON")
    time_str, host, status, duration, ts = fields

    # model.go:24-26 — the single validation line. The unmarshal already
    # parsed the time string (it validates every occurrence); ts is reused
    # here and by is_zero_time, so each record parses it exactly once.
    if X.is_zero_time(time_str, ts) or host == "" or status == 0 or duration == 0.0:
        raise GoParseError("missing or invalid required field")

    return Record(time=ts, time_str=time_str, host=host, status_code=status, duration=duration)


@dataclass
class PageClassification:
    """Oracle-side routing decision for one page row."""

    match_class: str                     # parsed | unparsed | bot | error
    reject_reason: Optional[str]         # None for parsed/bot
    extracted_text: Optional[bytes]      # exact extracted line bytes (parity fixture)
    record: Optional[Record]             # parsed fields (parsed/bot only)


def classify_page(
    html: Optional[bytes],
    text: Optional[str],
    bot_hosts: frozenset[str] = frozenset(),
) -> PageClassification:
    """The canonical page contract (mirrors the Spark parse+route stages).

    Priority: invalid-UTF-8 html => error; no payload / unmatchable line /
    invalid field => unparsed; valid + bot host => bot; else parsed.

    Extraction is independent of html validity: error rows still carry their
    extracted payload (byte-parity holds for EVERY url, including errors).
    """
    html_ok = True
    if html is not None:
        try:
            html.decode("utf-8")
        except UnicodeDecodeError:
            html_ok = False

    line = X.extract_line(text) if text is not None else None
    line_b = line.encode("utf-8") if line is not None else None

    if not html_ok:
        return PageClassification(X.CLASS_ERROR, X.REASON_INVALID_UTF8, line_b, None)

    if line is None or line_b is None:
        return PageClassification(X.CLASS_UNPARSED, X.REASON_NO_PAYLOAD, None, None)

    fields = X.parse_fields(line)
    if fields is not None:
        # fast path: the corpus-grammar regex (escape-free captures, so
        # raw capture == unescaped Go value)
        reason, ts = X.validate_and_parse(fields)
        if reason is not None:
            return PageClassification(X.CLASS_UNPARSED, reason, line_b, None)
        time_str, host = fields.time_str, fields.host
        status, duration = int(fields.status_str), float(fields.duration_str)
    else:
        # wide-grammar fallback: full Go json.Unmarshal semantics
        # (reordered keys, whitespace, escaped strings, duplicate keys)
        wide = X.go_unmarshal_fields(line)
        if wide is None:
            return PageClassification(X.CLASS_UNPARSED, X.REASON_BAD_RECORD, line_b, None)
        time_str, host, status, duration, ts = wide
        if (X.is_zero_time(time_str, ts) or host == ""
                or status == 0 or duration == 0.0):
            return PageClassification(
                X.CLASS_UNPARSED, X.REASON_INVALID_FIELD, line_b, None
            )

    # Both branches parsed the time string exactly once (the fast path in
    # validate_and_parse, the wide path inside the unmarshal loop); ts is
    # reused here instead of a second (historically up to fourth) parse.
    rec = Record(
        time=ts,  # type: ignore[arg-type]
        time_str=time_str,
        host=host,
        status_code=status,
        duration=duration,
    )
    cls = X.CLASS_BOT if rec.host in bot_hosts else X.CLASS_PARSED
    return PageClassification(cls, None, line_b, rec)
