"""Property tests: the canonical page contract agrees with the Go-JSON
oracle on the WIDE record grammar — shuffled key order, interstitial
whitespace, escaped strings, absent keys, extra fields — not just the
fixed-order corpus grammar (hypothesis-generated records)."""

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
    # escape-requiring hosts: quotes, backslashes, unicode escapes — these
    # always miss the fast-path regex and exercise the json fallback
    st.just('a"b.com'), st.just("a\\b.com"), st.just("aAb.comé"),
)
_status_strategy = st.one_of(
    st.integers(min_value=-5, max_value=999), st.just(0), st.none(),
    st.just(2**63 - 1), st.just(2**63),    # int64 edge / overflow
)
_duration_strategy = st.one_of(
    st.just(0.0), st.just(0), st.none(),
    st.floats(min_value=1e-9, max_value=1e6, allow_nan=False),
)


def _line(time, host, status, duration, extra: bool,
          order: int = 0, spaced: bool = False) -> str:
    """Wide-grammar record line: ``order`` rotates the key order and
    ``spaced`` injects interstitial whitespace — both accepted by Go's
    json.Unmarshal, both beyond the fast-path regex."""
    parts = []
    if time is not None:
        parts.append(("time", json.dumps(time)))
    if host is not None:
        parts.append(("host", json.dumps(host)))
    if status is not None:
        parts.append(("status_code", str(status)))
    if duration is not None:
        parts.append(("duration", json.dumps(duration)))
    if extra:
        parts.append(("level", '"INFO"'))
        parts.append(("size", "16"))
    if parts:
        k = order % len(parts)
        parts = parts[k:] + parts[:k]
    sep, colon = (" , ", " : ") if spaced else (",", ":")
    body = sep.join(f'"{k}"{colon}{v}' for k, v in parts)
    return "{" + body + "}"


@given(
    time=_time_strategy, host=_host_strategy, status=_status_strategy,
    duration=_duration_strategy, extra=st.booleans(),
    order=st.integers(min_value=0, max_value=5), spaced=st.booleans(),
)
@settings(max_examples=800, deadline=None)
def test_canon_matches_go_semantics(time, host, status, duration, extra,
                                    order, spaced):
    """For any wide-grammar line: classify_page validity == NewRecord
    validity, and parsed field values agree exactly. (The canon may reject
    more specific *reasons*, but the valid/invalid verdict — what the
    reference's malformRecord counter sees — must agree.)"""
    line = _line(time, host, status, duration, extra, order, spaced)
    if not line.startswith('{"'):
        return  # e.g. the all-keys-absent "{}" — un-extractable by LINE_RE
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
        assert c.record.time == rec.time


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_classify_never_crashes(text):
    c = classify_page(None, text)
    assert c.match_class in ("parsed", "unparsed", "bot", "error")


@given(st.text(alphabet='{}[]",:0123456789.eE+-\\ tfnul', max_size=80))
@settings(max_examples=400, deadline=None)
def test_json_fuzz_agreement(payload):
    """JSON-shaped fuzz: for any brace-wrapped line, classification verdict
    equals Go's unmarshal+validate verdict."""
    line = '{"' + payload + "}"
    c = classify_page(None, line)
    try:
        go_parse_record(line.encode())
        go_valid = True
    except GoParseError:
        go_valid = False
    assert (c.match_class in ("parsed", "bot")) == go_valid, (line, c.match_class)


# -- vectorized token-hash fuzz (the simhash reduceat path) -------------------
# The r3 review found a hand-picked-vector miss: trailing-separator texts
# truncated the last token's hash. Fuzz _token_hashes (one reduceat pass over
# all tokens) against the scalar per-token fold across arbitrary token lists,
# including empty tokens at every position and astral-plane code points.

@st.composite
def _token_lists(draw):
    tok = st.text(
        alphabet=st.characters(
            codec="utf-32-le",
            # only the actual split class [ \t\n\f\r] is excluded; \x0b is
            # NOT a split char and real tokens can contain it
            exclude_characters=" \t\n\f\r",
        ),
        max_size=12,
    )
    return draw(st.lists(tok, min_size=1, max_size=8))


@settings(max_examples=300, deadline=None)
@given(_token_lists())
def test_token_hashes_match_scalar_fold(tokens):
    import numpy as np

    from access_log_aggregator_spark.functions import xsql as x
    from access_log_aggregator_spark.functions.fingerprint_arrow import _polyhash
    from access_log_aggregator_spark.functions.simhash_arrow import _token_hashes

    max_len = max((len(t) for t in tokens), default=1)
    powers = np.empty(max(max_len, 1) + 1, dtype=np.int64)
    powers[0] = 1
    for i in range(1, powers.shape[0]):
        powers[i] = powers[i - 1] * 31 % x.P

    got = _token_hashes(tokens, powers)
    want = [
        _polyhash(np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
                  .astype(np.int64), powers) if t else 0
        for t in tokens
    ]
    assert got.tolist() == want
