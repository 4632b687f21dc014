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

import json
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


def _go_json_decode(raw: bytes) -> dict:
    """Emulate Go json.Unmarshal's top-level behavior for a JSON object.

    - invalid UTF-8: Go coerces invalid bytes to U+FFFD when decoding into
      strings; for the *structure* it still scans bytes. We decode with
      'replace' which matches observable behavior on the test domain.
    - trailing non-whitespace after the top-level value is an error
      (model_test.go:30 — a trailing ',' after the object is invalid JSON).
    - duplicate keys: last wins (Python dict literal behavior matches).
    """
    s = raw.decode("utf-8", errors="replace")
    dec = json.JSONDecoder()
    try:
        obj, end = dec.raw_decode(s.lstrip())
    except (json.JSONDecodeError, ValueError) as e:
        raise GoParseError(f"invalid JSON: {e}") from e
    if s.lstrip()[end:].strip() != "":
        raise GoParseError("invalid JSON: trailing content after top-level value")
    if not isinstance(obj, dict):
        raise GoParseError("invalid JSON: not an object")
    return obj


def go_parse_record(raw: bytes) -> Record:
    """NewRecord (model.go:16-29): unmarshal + zero-value validation.

    Raises GoParseError exactly where the reference returns an error:
    - JSON syntax error / trailing content,
    - field type mismatch (string into int, number into string, non-integer
      number into int, non-RFC3339 time string, bool anywhere),
    - zero time / empty host / zero status / zero duration (model.go:24).
    ``null`` for a field leaves the Go zero value (NOT a type error).
    """
    obj = _go_json_decode(raw)

    # time time.Time `json:"time"` — UnmarshalJSON requires an RFC3339 string.
    tval = obj.get("time")
    if tval is None:
        time_str = X.GO_ZERO_TIME
        ts: Optional[datetime] = None
    elif isinstance(tval, str):
        ts = X.parse_rfc3339(tval)
        if ts is None:
            raise GoParseError("invalid JSON: cannot parse time")
        time_str = tval
    else:
        raise GoParseError("invalid JSON: time is not a string")

    # host string
    hval = obj.get("host")
    if hval is None:
        host = ""
    elif isinstance(hval, str):
        host = hval
    else:
        raise GoParseError("invalid JSON: host is not a string")

    # status_code int (Go int = 64-bit; non-integer JSON numbers error)
    sval = obj.get("status_code")
    if sval is None:
        status = 0
    elif isinstance(sval, bool):
        raise GoParseError("invalid JSON: status_code is bool")
    elif isinstance(sval, int):
        if not (-(2**63) <= sval < 2**63):
            raise GoParseError("invalid JSON: status_code overflows int")
        status = sval
    else:
        raise GoParseError("invalid JSON: status_code is not an integer")

    # duration float64
    dval = obj.get("duration")
    if dval is None:
        duration = 0.0
    elif isinstance(dval, bool):
        raise GoParseError("invalid JSON: duration is bool")
    elif isinstance(dval, (int, float)):
        duration = float(dval)
    else:
        raise GoParseError("invalid JSON: duration is not a number")

    # model.go:24-26 — the single validation line.
    if ts is None or X.is_zero_time(time_str) or host == "" or status == 0 or duration == 0.0:
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
    if fields is None:
        return PageClassification(X.CLASS_UNPARSED, X.REASON_BAD_RECORD, line_b, None)

    reason = X.validate_fields(fields)
    if reason is not None:
        return PageClassification(X.CLASS_UNPARSED, reason, line_b, None)

    rec = Record(
        time=X.parse_rfc3339(fields.time_str),  # type: ignore[arg-type]
        time_str=fields.time_str,
        host=fields.host,
        status_code=int(fields.status_str),
        duration=float(fields.duration_str),
    )
    cls = X.CLASS_BOT if rec.host in bot_hosts else X.CLASS_PARSED
    return PageClassification(cls, None, line_b, rec)
