"""Property tests: the canonical page contract agrees with the Go-JSON
oracle on the whole corpus grammar (hypothesis-generated records)."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from access_log_aggregator_spark.oracle import GoParseError, classify_page, go_parse_record

_time_strategy = st.one_of(
    st.just("2025-08-14T02:07:12.680651416Z"),
    st.just("2025-09-28T17:12:09Z"),
    st.just("0001-01-01T00:00:00Z"),
    st.just("2025-02-30T00:00:00Z"),      # impossible calendar date
    st.just("not-a-time"),
    st.just(""),
    st.none(),                             # key absent
)
_host_strategy = st.one_of(
    st.just("chatgpt.com"), st.just("a.b"), st.just(""), st.none(),
    st.text(alphabet="abcdefghij.-", min_size=1, max_size=12),
)
_status_strategy = st.one_of(
    st.integers(min_value=-5, max_value=999), st.just(0), st.none()
)
_duration_strategy = st.one_of(
    st.just(0.0), st.just(0), st.none(),
    st.floats(min_value=1e-9, max_value=1e6, allow_nan=False),
)


def _line(time, host, status, duration, extra: bool) -> str:
    """Corpus-grammar record: fixed key order, only present keys emitted."""
    parts = []
    if time is not None:
        parts.append(f'"time":{json.dumps(time)}')
    if host is not None:
        parts.append(f'"host":{json.dumps(host)}')
    if status is not None:
        parts.append(f'"status_code":{status}')
    if duration is not None:
        parts.append(f'"duration":{json.dumps(duration)}')
    if extra:
        parts.append('"level":"INFO","size":16')
    return "{" + ",".join(parts) + "}"


@given(
    time=_time_strategy, host=_host_strategy, status=_status_strategy,
    duration=_duration_strategy, extra=st.booleans(),
)
@settings(max_examples=500, deadline=None)
def test_canon_matches_go_semantics(time, host, status, duration, extra):
    """For any corpus-grammar line: classify_page validity == NewRecord
    validity. (The canon may reject more specific *reasons*, but the
    valid/invalid verdict — what the reference's malformRecord counter sees —
    must agree exactly.)"""
    line = _line(time, host, status, duration, extra)
    c = classify_page(None, f"boilerplate words\n{line}\nmore words")
    try:
        rec = go_parse_record(line.encode())
        go_valid = True
    except GoParseError:
        rec = None
        go_valid = False
    canon_valid = c.match_class in ("parsed", "bot")
    assert canon_valid == go_valid, (line, c.match_class, c.reject_reason)
    if rec is not None and c.record is not None:
        assert (c.record.host, c.record.status_code) == (rec.host, rec.status_code)
        assert c.record.duration == rec.duration


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_classify_never_crashes(text):
    c = classify_page(None, text)
    assert c.match_class in ("parsed", "unparsed", "bot", "error")
