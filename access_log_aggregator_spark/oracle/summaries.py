"""Aggregation-fold + summary-format oracle.

Reimplements, in plain Python with identical observable semantics:
- the per-host fold (internal/accesslog/summaries.go:3-27): three
  accumulators — request count, 2xx count (200 <= s < 300), float64 sum of
  duration in arrival order;
- the malformed counter (internal/app/aggregate.go:15,38-41);
- the fixed-width table format (internal/accesslog/print.go:26-49),
  with an injectable clock (the reference embeds wall time in the header,
  which its own tests dodge via substring asserts — print_test.go).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from typing import Iterable, Optional

from .parser import GoParseError, Record, go_parse_record


@dataclass
class Summary:
    """summary struct (model.go:31-35)."""

    request_total: int = 0
    request_2xx: int = 0
    duration_total: float = 0.0

    def update(self, rec: Record) -> None:
        """updateSummary (summaries.go:3-11) — same accumulation order."""
        self.duration_total = self.duration_total + rec.duration
        if 200 <= rec.status_code < 300:
            self.request_2xx += 1
        self.request_total += 1


@dataclass
class Summaries:
    """Summaries map + malformed counter (model.go:42-46, aggregate.go:15)."""

    by_host: dict[str, Summary] = field(default_factory=dict)
    malformed: int = 0

    def aggregate_raw(self, raw: bytes) -> None:
        """Summaries.Aggregate (summaries.go:13-27) + malformRecord counting."""
        try:
            rec = go_parse_record(raw)
        except GoParseError:
            self.malformed += 1
            return
        self.aggregate_record(rec)

    def aggregate_record(self, rec: Record) -> None:
        self.by_host.setdefault(rec.host, Summary()).update(rec)

    def rows(self) -> list[tuple[str, int, int, int, float]]:
        """(host, total, 2xx, non_2xx, avg_duration_s) in lexicographic host
        order — sort() + the derived columns of Format (print.go:10-24,43-44).
        """
        out = []
        for h in sorted(self.by_host):
            s = self.by_host[h]
            out.append(
                (h, s.request_total, s.request_2xx,
                 s.request_total - s.request_2xx,
                 s.duration_total / float(s.request_total))
            )
        return out


def fold_records(records: Iterable[Record]) -> Summaries:
    """Fold already-validated records in iteration order."""
    ss = Summaries()
    for rec in records:
        ss.aggregate_record(rec)
    return ss


def format_summaries(ss: Summaries, now: Optional[datetime] = None) -> str:
    """Format (print.go:26-49): header, rules, %-*s %15d %15d %18d %18.3f rows.

    ``now`` is injectable so tests can golden-match the full string.
    """
    hosts = sorted(ss.by_host)
    max_host_len = max((len(h) for h in hosts), default=0) + 2
    width = max_host_len + 72
    clock = (now or datetime.now()).strftime("%Y-%m-%d %H:%M:%S")

    lines = [
        "",
        f"*** Access Log Summary as of {clock} ***",
        "=" * width,
        "%-*s %15s %15s %18s %18s"
        % (max_host_len, "Host", "total_requests", "2xx_requests",
           "non_2xx_requests", "avg_duration_s"),
        "-" * width,
    ]
    # rows() owns the derived-column math (non-2xx, avg) — single source
    for h, total, ok2xx, non2xx, avg in ss.rows():
        lines.append(
            "%-*s %15d %15d %18d %18.3f"
            % (max_host_len, h, total, ok2xx, non2xx, avg)
        )
    lines.append("=" * width)
    return "\n".join(lines) + "\n"
