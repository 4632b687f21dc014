"""The reference's own 1000-line test corpus through the Spark pipeline.

`/root/reference/test/testdata/log.log` is the reference repo's fixture
(74.3% chatgpt.com skew — SURVEY.md §5.3). Each line is embedded into a
synthetic page and run through the full parse -> enrich -> route pipeline;
the per-host aggregate must equal the corpus goldens the reference's own
semantics produce (oracle fold: chatgpt.com 743/138, grok.com 135/30,
bard.com 122/21, zero malformed), and every extracted payload must be
byte-identical to the original line (the input_hint per-row invariant,
demonstrated on the reference's real data rather than generated data).
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd
import pytest
from pyspark.sql import functions as F

from access_log_aggregator_spark.oracle import Summaries
from access_log_aggregator_spark.plans.pipeline import build_routed

REF_LOG = Path("/root/reference/test/testdata/log.log")

pytestmark = pytest.mark.skipif(
    not REF_LOG.exists(), reason="reference corpus not present"
)


@pytest.fixture(scope="module")
def ref_lines() -> list[bytes]:
    return [l for l in REF_LOG.read_bytes().split(b"\n") if l]


@pytest.fixture(scope="module")
def ref_pages(ref_lines) -> pd.DataFrame:
    rows = []
    for i, line in enumerate(ref_lines):
        text = f"<title>page {i}</title>\n{line.decode('utf-8')}\nfooter text"
        rows.append(
            {
                "url": f"https://ref.example.com/page/{i}",
                "warc_ts": pd.Timestamp("2025-01-01") + pd.Timedelta(seconds=i),
                "html": text.encode("utf-8"),
                "text": text,
                "lang": "en",
            }
        )
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def ref_routed(spark, ref_pages, lookup_sdf):
    df = build_routed(
        spark.createDataFrame(ref_pages).repartition(8), lookup_sdf
    )
    df = df.persist()
    df.count()
    yield df
    df.unpersist()


def test_reference_corpus_all_parse(ref_routed, ref_lines):
    """Every reference line is a valid record (the corpus has no malformed
    lines); none route to unparsed/error."""
    counts = {r["match_class"]: r["n"] for r in
              ref_routed.groupBy("match_class").agg(F.count("*").alias("n")).collect()}
    assert counts.get("unparsed", 0) == 0 and counts.get("error", 0) == 0
    assert sum(counts.values()) == len(ref_lines)


def test_reference_corpus_byte_identical_extraction(ref_routed, ref_lines):
    """extracted_text == the exact original line, for every url."""
    got = {
        int(r["url"].rsplit("/", 1)[1]): r["extracted_text"]
        for r in ref_routed.select("url", "extracted_text").collect()
    }
    assert len(got) == len(ref_lines)
    for i, line in enumerate(ref_lines):
        assert got[i].encode("utf-8") == line, f"line {i} extraction differs"


def test_reference_corpus_aggregate_matches_goldens(ref_routed, ref_lines):
    """Spark per-host aggregate == oracle fold == the documented goldens."""
    from access_log_aggregator_spark.operators.aggregate import aggregate_by_host

    oracle = Summaries()
    for line in ref_lines:
        oracle.aggregate_raw(line)
    assert oracle.malformed == 0

    valid = ref_routed.filter(F.col("match_class").isin("parsed", "bot"))
    rows = {r["host"]: r for r in aggregate_by_host(valid).collect()}
    assert set(rows) == set(oracle.by_host) == {"chatgpt.com", "grok.com", "bard.com"}
    assert (rows["chatgpt.com"]["total_requests"], rows["chatgpt.com"]["requests_2xx"]) == (743, 138)
    assert (rows["grok.com"]["total_requests"], rows["grok.com"]["requests_2xx"]) == (135, 30)
    assert (rows["bard.com"]["total_requests"], rows["bard.com"]["requests_2xx"]) == (122, 21)
    for host, s in oracle.by_host.items():
        r = rows[host]
        assert r["total_requests"] == s.request_total
        assert r["requests_2xx"] == s.request_2xx
        assert float(r["sum_duration_s"]) == pytest.approx(s.duration_total, abs=1e-9)
