"""Oracle unit tests — reference test vectors ported verbatim.

Sources (in /root/reference/): internal/accesslog/model_test.go:17-70,
summaries_test.go:104-249, print_test.go:65-107,
test/integration/integration_test.go:159-287.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from access_log_aggregator_spark.functions import extract as X
from access_log_aggregator_spark.oracle import (
    GoParseError,
    Summaries,
    classify_page,
    fold_records,
    format_summaries,
    go_parse_record,
)
from access_log_aggregator_spark.oracle.parser import Record

VALID_LINE = (
    b'{"time":"2025-08-14T02:07:12.680651416Z","level":"INFO","msg":"access",'
    b'"scheme":"https","method":"POST","request_uri":"/ces/v1/t","status_code":200,'
    b'"size":16,"action":"passthrough","host":"chatgpt.com","client_ip":"192.168.2.42",'
    b'"server_ip":"104.18.32.47","duration":0.224254673,"details":""}'
)


def _variant(**overrides) -> bytes:
    """Rebuild the 14-field reference record with fields removed/replaced."""
    import json

    obj = {
        "time": "2025-08-14T02:07:12.680651416Z",
        "level": "INFO",
        "msg": "access",
        "scheme": "https",
        "method": "POST",
        "request_uri": "/ces/v1/t",
        "status_code": 200,
        "size": 16,
        "action": "passthrough",
        "host": "chatgpt.com",
        "client_ip": "192.168.2.42",
        "server_ip": "104.18.32.47",
        "duration": 0.224254673,
        "details": "",
    }
    for k, v in overrides.items():
        if v is ...:
            del obj[k]
        else:
            obj[k] = v
    return json.dumps(obj, separators=(",", ":")).encode()


class TestGoParseRecord:
    """model_test.go:17-70 — the 8-case parse matrix."""

    def test_valid_with_extra_fields(self):
        rec = go_parse_record(VALID_LINE)
        assert rec.host == "chatgpt.com"
        assert rec.status_code == 200
        assert rec.duration == 0.224254673
        # nanosecond string preserved; datetime truncated to micros
        assert rec.time_str == "2025-08-14T02:07:12.680651416Z"
        assert rec.time == datetime(2025, 8, 14, 2, 7, 12, 680651, tzinfo=timezone.utc)

    def test_invalid_json_trailing_comma(self):
        # model_test.go:30: trailing ',' after the object => invalid JSON
        with pytest.raises(GoParseError):
            go_parse_record(VALID_LINE + b",")

    @pytest.mark.parametrize("missing", ["time", "host", "status_code", "duration"])
    def test_missing_field(self, missing):
        with pytest.raises(GoParseError):
            go_parse_record(_variant(**{missing: ...}))

    def test_zero_status_code(self):
        # integration_test.go:194-201: explicit 0 is rejected like absent
        with pytest.raises(GoParseError):
            go_parse_record(_variant(status_code=0))

    def test_zero_duration(self):
        with pytest.raises(GoParseError):
            go_parse_record(_variant(duration=0))

    def test_garbage_line(self):
        with pytest.raises(GoParseError):
            go_parse_record(b"not json at all")

    def test_null_fields_are_zero_values(self):
        # Go: null leaves the zero value => validation reject, not JSON error
        for f in ("time", "host", "status_code", "duration"):
            with pytest.raises(GoParseError):
                go_parse_record(_variant(**{f: None}))

    def test_type_mismatch(self):
        with pytest.raises(GoParseError):
            go_parse_record(_variant(status_code="200"))
        with pytest.raises(GoParseError):
            go_parse_record(_variant(status_code=200.5))
        with pytest.raises(GoParseError):
            go_parse_record(_variant(host=42))
        with pytest.raises(GoParseError):
            go_parse_record(_variant(time=12345))

    def test_zero_time_literal(self):
        with pytest.raises(GoParseError):
            go_parse_record(_variant(time="0001-01-01T00:00:00Z"))

    def test_corpus_line(self):
        # test/testdata/log.log:1
        rec = go_parse_record(
            b'{"time":"2025-09-28T17:12:09Z","host":"grok.com","status_code":595,"duration":0.558182951}'
        )
        assert (rec.host, rec.status_code, rec.duration) == ("grok.com", 595, 0.558182951)


def _rec(status: int, duration: float, host: str = "chatgpt.com") -> Record:
    t = datetime(2025, 8, 14, 2, 7, 12, 680651, tzinfo=timezone.utc)
    return Record(time=t, time_str="2025-08-14T02:07:12.680651416Z",
                  host=host, status_code=status, duration=duration)


class TestFold:
    """summaries_test.go:104-249 — 2xx boundaries, sums, multi-key map."""

    @pytest.mark.parametrize(
        "status,want_2xx",
        [(199, 0), (200, 1), (201, 1), (299, 1), (300, 0), (301, 0), (400, 0)],
    )
    def test_2xx_boundary(self, status, want_2xx):
        ss = fold_records([_rec(status, 0.224254673)])
        s = ss.by_host["chatgpt.com"]
        assert s.request_total == 1
        assert s.request_2xx == want_2xx
        assert abs(s.duration_total - 0.224254673) <= 1e-9

    def test_mixed_edge_cases(self):
        ss = fold_records([_rec(s, 0.224254673) for s in (199, 200, 201, 299, 300, 301)])
        s = ss.by_host["chatgpt.com"]
        assert s.request_total == 6
        assert s.request_2xx == 3
        assert abs(s.duration_total - 1.345528038) <= 1e-9

    def test_multiple_hosts(self):
        ss = fold_records(
            [_rec(200, 0.5, "a.com"), _rec(500, 0.25, "b.com"), _rec(204, 0.25, "a.com")]
        )
        assert ss.by_host["a.com"].request_total == 2
        assert ss.by_host["a.com"].request_2xx == 2
        assert ss.by_host["b.com"].request_total == 1
        rows = ss.rows()
        assert [r[0] for r in rows] == ["a.com", "b.com"]  # lexicographic
        assert rows[0][4] == pytest.approx(0.375, abs=1e-9)  # avg

    def test_malformed_counter(self):
        ss = Summaries()
        ss.aggregate_raw(VALID_LINE)
        ss.aggregate_raw(b"garbage")
        ss.aggregate_raw(_variant(duration=0))
        assert ss.malformed == 2
        assert ss.by_host["chatgpt.com"].request_total == 1


class TestFormat:
    """print.go:26-49 / print_test.go — fixed-width layout with injected clock."""

    def test_format_golden(self):
        ss = fold_records([_rec(200, 0.2), _rec(500, 0.4), _rec(301, 0.3, "x.io")])
        out = format_summaries(ss, now=datetime(2025, 1, 2, 3, 4, 5))
        lines = out.split("\n")
        assert lines[1] == "*** Access Log Summary as of 2025-01-02 03:04:05 ***"
        # maxHostLen = len('chatgpt.com') + 2 = 13; width = 85
        assert lines[2] == "=" * 85
        assert lines[4] == "-" * 85
        assert lines[5] == ("%-13s %15d %15d %18d %18.3f" % ("chatgpt.com", 2, 1, 1, 0.300))
        assert lines[6] == ("%-13s %15d %15d %18d %18.3f" % ("x.io", 1, 0, 1, 0.300))
        assert lines[7] == "=" * 85

    def test_empty(self):
        out = format_summaries(Summaries(), now=datetime(2025, 1, 2, 3, 4, 5))
        # maxHostLen = 0 + 2 => width 74 (print_test.go empty-map case)
        assert "=" * 74 in out


class TestClassifyPage:
    """Canonical page contract: extraction + routing (FIXTURES.md §4)."""

    PAGE = "Some page text here.\n%s\nmore boilerplate text"

    def test_parsed(self):
        line = '{"time":"2025-09-28T17:12:09Z","host":"grok.com","status_code":595,"duration":0.558182951}'
        c = classify_page(None, self.PAGE % line)
        assert c.match_class == "parsed"
        assert c.extracted_text == line.encode()
        assert c.record.status_code == 595

    def test_bot(self):
        line = '{"time":"2025-09-28T17:12:09Z","host":"crawler.ai","status_code":200,"duration":0.5}'
        c = classify_page(None, self.PAGE % line, bot_hosts=frozenset({"crawler.ai"}))
        assert c.match_class == "bot"

    def test_no_payload(self):
        c = classify_page(None, "just words\nno json here")
        assert (c.match_class, c.reject_reason) == ("unparsed", "no_payload")
        assert c.extracted_text is None

    def test_bad_record(self):
        # syntax error (trailing content, model_test.go:30) => unmarshal error
        c = classify_page(None, self.PAGE % '{"a":1},{"x":2}')
        assert (c.match_class, c.reject_reason) == ("unparsed", "bad_record")

    def test_wellformed_but_foreign_json(self):
        # Go unmarshal SUCCEEDS on a foreign object (fields left at zero
        # values), then model.go:24 validation rejects => invalid_field
        c = classify_page(None, self.PAGE % '{"not":"a log line"}')
        assert (c.match_class, c.reject_reason) == ("unparsed", "invalid_field")

    def test_invalid_field(self):
        line = '{"time":"2025-09-28T17:12:09Z","host":"grok.com","status_code":0,"duration":0.5}'
        c = classify_page(None, self.PAGE % line)
        assert (c.match_class, c.reject_reason) == ("unparsed", "invalid_field")

    def test_invalid_utf8_html(self):
        c = classify_page(b"<html>\xff\xfe</html>", self.PAGE % "{}")
        assert (c.match_class, c.reject_reason) == ("error", "invalid_utf8")

    def test_first_matching_line_wins(self):
        t = 'pre\n{"a":1}\n{"time":"2025-09-28T17:12:09Z","host":"h","status_code":1,"duration":1}'
        c = classify_page(None, t)
        # first JSON-looking line is {"a":1} -> bad_record (extraction is
        # first-match, not first-*valid*-match — keeps both engines trivially
        # identical)
        assert c.extracted_text == b'{"a":1}'
        assert c.match_class == "unparsed"


class TestCanonAgreesWithGoParser:
    """On FIELD_RE-matching lines, canon classify == go_parse_record verdict."""

    @pytest.mark.parametrize(
        "line",
        [
            '{"time":"2025-09-28T17:12:09Z","host":"grok.com","status_code":595,"duration":0.558182951}',
            '{"time":"2025-08-14T02:07:12.680651416Z","host":"a.b","status_code":200,"duration":0.1,"extra":"x"}',
            '{"time":"2025-09-28T17:12:09Z","host":"","status_code":595,"duration":0.5}',
            '{"time":"0001-01-01T00:00:00Z","host":"h","status_code":1,"duration":1}',
            '{"time":"2025-02-30T00:00:00Z","host":"h","status_code":1,"duration":1}',
            '{"time":"2025-09-28T17:12:09Z","host":"h","status_code":0,"duration":0.5}',
            '{"time":"2025-09-28T17:12:09Z","host":"h","status_code":200,"duration":0}',
            '{"time":"2025-09-28T17:12:09Z","host":"h","status_code":200,"duration":0.0}',
            '{"time":"not a time","host":"h","status_code":200,"duration":0.5}',
        ],
    )
    def test_agreement(self, line):
        c = classify_page(None, line)
        try:
            go_parse_record(line.encode())
            go_valid = True
        except GoParseError:
            go_valid = False
        canon_valid = c.match_class in ("parsed", "bot")
        assert canon_valid == go_valid
