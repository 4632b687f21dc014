"""Spark parse stage vs oracle: byte-identical extraction + identical
classification per url (the BASELINE.json per-row invariant)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from access_log_aggregator_spark.operators.enrich import enrich
from access_log_aggregator_spark.operators.parse import parse_stage
from access_log_aggregator_spark.operators.route import route


def _routed(pages_df, lookup_sdf, use_arrow_udf):
    return route(enrich(parse_stage(pages_df, use_arrow_udf), lookup_sdf))


@pytest.fixture(scope="module", params=[True, False], ids=["arrow_udf", "jvm_expr"])
def spark_rows(request, pages_df, lookup_sdf):
    df = _routed(pages_df, lookup_sdf, request.param)
    rows = df.select(
        "url", "extracted_text", "match_class", "reject_reason",
        "host", "status_code", "duration", "log_ts",
    ).collect()
    return {r["url"]: r for r in rows}


def test_extraction_byte_identical(spark_rows, corpus):
    """For EVERY url: Spark extracted_text == oracle extracted bytes."""
    mismatches = []
    for page, c in zip(corpus.pages.itertuples(), corpus.classifications):
        got = spark_rows[page.url]["extracted_text"]
        got_b = got.encode("utf-8") if got is not None else None
        if got_b != c.extracted_text:
            mismatches.append((page.url, got_b, c.extracted_text))
    assert not mismatches, f"{len(mismatches)} extraction mismatches, first: {mismatches[:3]}"


def test_classification_identical(spark_rows, corpus):
    """match_class and reject_reason agree with the oracle for every url."""
    bad = []
    for page, c in zip(corpus.pages.itertuples(), corpus.classifications):
        r = spark_rows[page.url]
        if (r["match_class"], r["reject_reason"]) != (c.match_class, c.reject_reason):
            bad.append((page.url, r["match_class"], r["reject_reason"],
                        c.match_class, c.reject_reason))
    assert not bad, f"{len(bad)} classification mismatches, first: {bad[:5]}"


def test_parsed_fields_identical(spark_rows, corpus):
    """host/status/duration/log_ts agree with the oracle on valid records."""
    bad = []
    for page, c in zip(corpus.pages.itertuples(), corpus.classifications):
        if c.record is None:
            continue
        r = spark_rows[page.url]
        ts = r["log_ts"].replace(tzinfo=c.record.time.tzinfo) if r["log_ts"] else None
        if (
            r["host"] != c.record.host
            or r["status_code"] != c.record.status_code
            or r["duration"] != c.record.duration
            or ts != c.record.time
        ):
            bad.append((page.url, r, c.record))
    assert not bad, f"{len(bad)} field mismatches, first: {bad[:3]}"


def test_row_conservation(spark_rows, corpus):
    assert len(spark_rows) == len(corpus.pages)


def test_udf_and_expr_paths_agree(pages_df, lookup_sdf):
    """The pandas-UDF extractor and the pure-JVM regexp extractor are twins."""
    a = _routed(pages_df, lookup_sdf, True).select("url", "extracted_text", "match_class")
    b = _routed(pages_df, lookup_sdf, False).select("url", "extracted_text", "match_class")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_byte_level_extraction_rule(corpus):
    """Byte-parity is DEFINED on bytes (functions/extract.py): LINE_RE over
    the raw UTF-8 bytes of ``text`` (extract_line_bytes) yields exactly the
    oracle's extracted bytes for every page — the same rule, evaluated at
    the byte level, with no str/bytes drift."""
    from access_log_aggregator_spark.functions.extract import extract_line_bytes

    for page, c in zip(corpus.pages.itertuples(), corpus.classifications):
        got = extract_line_bytes(page.text.encode("utf-8")) if page.text is not None else None
        assert got == c.extracted_text, page.url
