"""Deterministic synthetic `pages` corpus generator (FIXTURES.md §1-§4).

Generates the Common-Crawl-style input table the pipeline runs on:
``(url string, warc_ts timestamp, html binary, text string, lang string)``,
with one embedded access-log JSON line per page (reference record format,
internal/accesslog/model.go:9-14; corpus key order time,host,status_code,
duration as in test/testdata/log.log).

Distribution cloned from the reference corpus (SURVEY.md §5.3): ~74/13/12%
host skew across chatgpt.com/grok.com/bard.com plus a long tail of rare
hosts (so skew handling is measurable, SURVEY.md §7.3), status uniform
[100,599], duration uniform (0,1) at 9 decimal digits, timestamps uniform
Nov 2024 - Nov 2025. Planted edge-case variants exercise every router class
and every validation arm of model.go:24-26.

Everything is seeded and pure-Python — no external data, reproducible at
any scale.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone
from typing import Optional

import pandas as pd

# hot hosts measured from the reference corpus + graft long tail
HOT_HOSTS = [("chatgpt.com", 0.715), ("grok.com", 0.130), ("bard.com", 0.117)]
N_TAIL_HOSTS = 1000
TAIL_SHARE = 0.038
BOT_HOSTS = ["crawler.example.ai", "googlebot.example.com", "bingbot.example.net"]

LANGS = ["en", "EN", "en-US", "id", "de", ""]

# planted variant classes (FIXTURES.md §4) with shares; remainder = valid
VARIANTS = [
    ("valid_extra", 0.05),    # + 10 extra JSON fields (model_test.go:19)
    ("invalid_json", 0.03),   # trailing content / truncated / garbage
    ("missing_field", 0.04),  # one of time/host/status_code/duration absent
    ("zero_value", 0.02),     # status_code:0 or duration:0 (model.go:24)
    ("dup_key", 0.01),        # primary key re-specified in the extras tail:
                              # Go last-wins => the trailing zero rejects it
                              # (the fast path must NOT take the first values)
    ("no_payload", 0.02),     # no JSON-looking line at all
    ("bot", 0.05),            # valid record on an is_bot_host host
    ("error", 0.01),          # html carries invalid UTF-8
]

EXTRA_FIELDS = (
    '"level":"INFO","msg":"access","scheme":"https","method":"POST",'
    '"request_uri":"/ces/v1/t","size":16,"action":"passthrough",'
    '"client_ip":"192.168.2.42","server_ip":"104.18.32.47","details":""'
)

_WORDS = (
    "web crawl page content index archive corpus token stream batch shard "
    "partition shuffle join scan filter window host request status latency "
    "render script style header footer nav article section paragraph"
).split()

_TS_LO = datetime(2024, 11, 1, tzinfo=timezone.utc)
_TS_HI = datetime(2025, 11, 5, tzinfo=timezone.utc)
_SPAN_S = int((_TS_HI - _TS_LO).total_seconds())


def _pick_host(rng: random.Random) -> str:
    r = rng.random()
    acc = 0.0
    for h, p in HOT_HOSTS:
        acc += p
        if r < acc:
            return h
    return f"host{rng.randrange(N_TAIL_HOSTS)}.example.net"


def _log_time(rng: random.Random) -> str:
    ts = _TS_LO + timedelta(seconds=rng.randrange(_SPAN_S))
    base = ts.strftime("%Y-%m-%dT%H:%M:%S")
    if rng.random() < 0.10:  # some records carry nanosecond precision
        return f"{base}.{rng.randrange(1_000_000_000):09d}Z"
    return base + "Z"


def _log_line(rng: random.Random, host: str, extra: bool = False,
              status: Optional[int] = None, duration: Optional[float] = None) -> str:
    s = status if status is not None else rng.randint(100, 599)
    d = f"{duration:.9f}" if duration is not None else f"{rng.random():.9f}"
    core = f'"time":"{_log_time(rng)}","host":"{host}","status_code":{s},"duration":{d}'
    return "{" + core + ("," + EXTRA_FIELDS if extra else "") + "}"


def _boilerplate(rng: random.Random, n: int) -> list[str]:
    # never starts with '{"' so it can't shadow the payload line
    return [" ".join(rng.choices(_WORDS, k=rng.randint(4, 12))) for _ in range(n)]


def _page_text(rng: random.Random, payload: Optional[str],
               lines_range: tuple[int, int] = (2, 6)) -> str:
    lines = _boilerplate(rng, rng.randint(*lines_range))
    if payload is not None:
        lines.insert(rng.randrange(len(lines) + 1), payload)
    return "\n".join(lines)


#: generation is chunked so corpora parallelize: chunk k is seeded by
#: (seed, chunk_start) and rows are independent across chunks, making
#: generate_pages(n) == concat(generate_pages_chunk(k*CHUNK, ...)) for any
#: worker layout.
CHUNK_ROWS = 10_000


def generate_pages(n_rows: int, seed: int = 42,
                   lines: tuple[int, int] = (2, 6)) -> pd.DataFrame:
    """Build the pages corpus as a pandas DataFrame (row order == url order).

    ``lines`` sets the boilerplate line-count range per page: the default
    keeps unit corpora tiny; bench corpora use (15, 40) for KB-scale pages
    (Common-Crawl-realistic parse density).
    """
    parts = [
        generate_pages_chunk(lo, min(CHUNK_ROWS, n_rows - lo), seed, lines)
        for lo in range(0, n_rows, CHUNK_ROWS)
    ]
    if not parts:  # n_rows == 0: empty frame, same schema (--generate 0)
        return generate_pages_chunk(0, 0, seed, lines)
    return pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]


def generate_pages_chunk(start: int, n_rows: int, seed: int = 42,
                         lines: tuple[int, int] = (2, 6)) -> pd.DataFrame:
    """Rows [start, start+n_rows) of the corpus (deterministic per chunk)."""
    rng = random.Random((seed << 32) ^ start)
    rows = []
    for i in range(start, start + n_rows):
        r = rng.random()
        variant = "valid"
        acc = 0.0
        for name, p in VARIANTS:
            acc += p
            if r < acc:
                variant = name
                break

        host = _pick_host(rng)
        if variant == "bot":
            host = rng.choice(BOT_HOSTS)

        payload: Optional[str]
        if variant == "valid":
            payload = _log_line(rng, host)
        elif variant == "valid_extra":
            payload = _log_line(rng, host, extra=True)
        elif variant == "bot":
            payload = _log_line(rng, host)
        elif variant == "invalid_json":
            kind = rng.randrange(3)
            good = _log_line(rng, host)
            if kind == 0:   # trailing content after the object (model_test.go:30)
                payload = good + ',{"x":1}'
            elif kind == 1:  # truncated object (never matches LINE_RE)
                payload = good[: len(good) // 2]
            else:            # JSON-looking garbage line
                payload = '{"garbage":true,"noise":%d}' % rng.randrange(10**6)
        elif variant == "missing_field":
            drop = rng.choice(["time", "host", "status_code", "duration"])
            line = _log_line(rng, host)
            import re as _re
            payload = _re.sub(r'"%s":("[^"]*"|[0-9.eE+-]+),?' % drop, "", line, count=1)
            payload = payload.replace(",}", "}")
        elif variant == "zero_value":
            if rng.random() < 0.5:
                payload = _log_line(rng, host, status=0)
            else:
                payload = _log_line(rng, host, duration=0.0)
        elif variant == "dup_key":
            # fast-path-shaped head + a re-specified primary key in the
            # tail; json.Unmarshal is last-wins so the record is INVALID
            # (trailing zero). A first-wins fast path would misclassify
            # this as parsed with the head's valid values.
            line = _log_line(rng, host)
            dup = ('"status_code":0' if rng.random() < 0.5
                   else '"duration":0.000000000')
            payload = line[:-1] + "," + dup + "}"
        elif variant == "no_payload":
            payload = None
        else:  # error
            payload = _log_line(rng, host)

        text = _page_text(rng, payload, lines)
        html = b"<html><body>" + text.encode("utf-8") + b"</body></html>"
        if variant == "error":
            html = b"<html><body>\x80\xfe\xff" + text.encode("utf-8") + b"</body></html>"

        warc_ts = _TS_LO + timedelta(seconds=rng.randrange(_SPAN_S),
                                     microseconds=rng.randrange(1_000_000))
        rows.append(
            {
                "url": f"https://{host}/p/{i:09d}?id={i}",
                "warc_ts": warc_ts.replace(tzinfo=None),  # stored UTC-naive
                "html": html,
                "text": text,
                "lang": rng.choice(LANGS),
            }
        )
    pdf = pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )  # explicit columns: n_rows == 0 must still carry the schema
    pdf["warc_ts"] = pdf["warc_ts"].astype("datetime64[us]")
    return pdf


def generate_host_lookup(seed: int = 42) -> pd.DataFrame:
    """Broadcast enrichment dim (FIXTURES.md §3): host -> geo/category/is_bot.

    Covers every generatable host EXCEPT tail hosts whose index ends in 7 —
    the deliberately-absent rows that exercise the left-join null path.
    """
    rng = random.Random(seed + 1)
    geos = ["US", "ID", "DE", "JP", "BR", "IN", "GB", "FR"]
    cats = ["ai", "search", "social", "news", "other"]
    rows = []
    hot = [h for h, _ in HOT_HOSTS]
    for h in hot + BOT_HOSTS + [f"host{k}.example.net" for k in range(N_TAIL_HOSTS) if k % 10 != 7]:
        rows.append(
            {
                "host": h,
                "geo": geos[rng.randrange(len(geos))],
                "category": "ai" if h in hot else cats[rng.randrange(len(cats))],
                "is_bot_host": h in BOT_HOSTS,
            }
        )
    return pd.DataFrame(rows)
