"""Parse stage: extraction -> field capture -> validation, all declarative.

Re-expresses the reference's per-line NewRecord path
(internal/accesslog/model.go:16-29) as Catalyst expressions over the
extracted payload column:

- field capture: ``regexp_extract`` with the canonical FIELD_PATTERN
  (JVM-side, whole-stage-codegen friendly — the projection-at-parse analog
  of the reference's struct tags, model.go:9-14);
- validation: the model.go:24 predicate, with present-but-zero handled
  exactly (``status_code == 0`` / ``duration == 0.0`` reject);
- timestamp: RFC3339 with optional 1-9 digit fraction; nanoseconds truncate
  to Spark's microsecond TimestampType (SURVEY.md §7.3 — aggregation never
  reads sub-second precision).

Column pruning note: this stage reads ``text`` and ``html`` once each
(extraction + UTF-8 validity); everything downstream selects narrow columns
so the wide page body never crosses a shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import extract as X
from ..functions.parse_udf import extract_payload_expr, extract_payload_udf

_TS_BASE_RE = r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})"
_TS_FRAC_RE = r"^[^.]*\.(\d{1,9})"
_TS_OFF_RE = r"(Z|[+-]\d{2}:\d{2})$"
_GO_ZERO = "0001-01-01T00:00:00+00:00"


def _log_ts(time_str: Column) -> Column:
    """RFC3339 string -> TimestampType (UTC instant, micros, null if invalid).

    try_to_timestamp also rejects impossible calendar dates (Feb 30), the
    analog of Go time.Parse failing inside json unmarshal.
    """
    base = F.regexp_extract(time_str, _TS_BASE_RE, 1)
    off = F.regexp_extract(time_str, _TS_OFF_RE, 1)
    frac = F.regexp_extract(time_str, _TS_FRAC_RE, 1)
    ts0 = F.try_to_timestamp(
        F.concat(base, F.when(off == "Z", F.lit("+00:00")).otherwise(off)),
        F.lit("yyyy-MM-dd'T'HH:mm:ssxxx"),
    )
    micros = F.when(
        frac != "", F.rpad(F.substring(frac, 1, 6), 6, "0").cast("long")
    ).otherwise(F.lit(0))
    return F.timestamp_add("MICROSECOND", micros, ts0)


def parse_stage(pages: DataFrame, use_arrow_udf: bool = True) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> parsed frame with validity flags.

    Output columns: url, warc_ts, lang, html_valid, extracted_text,
    log_time_str, host, status_code, duration, log_ts, record_valid,
    parse_reason (null when record_valid), source_partition (lineage).
    """
    extractor = extract_payload_udf if use_arrow_udf else extract_payload_expr
    df = pages.withColumn("html_valid", F.is_valid_utf8(F.col("html")))
    df = df.withColumn("extracted_text", extractor(F.col("text")))

    et = F.col("extracted_text")
    # Gate on one anchored rlike, then pack all four capture groups in a
    # SINGLE regexp_replace pass (separator \x01 — unreachable: the capture
    # grammar admits no control chars from the generator corpus, and a page
    # that did smuggle one would fail parity tests immediately). 2 regex
    # evaluations per row instead of 5 (rlike + 4 regexp_extract).
    field_matched = et.rlike(X.FIELD_PATTERN)
    df = df.withColumn("field_matched", F.coalesce(field_matched, F.lit(False)))
    df = df.withColumn(
        "_packed",
        F.when(
            F.col("field_matched"),
            F.regexp_replace(et, X.FIELD_PATTERN, "$1$2$3$4"),
        ),
    )
    for i, name in enumerate(["log_time_str", "host_raw", "status_str", "duration_str"]):
        df = df.withColumn(name, F.split(F.col("_packed"), "").getItem(i))

    df = (
        df.withColumn("log_ts", _log_ts(F.col("log_time_str")))
        .withColumn("status_code", F.col("status_str").try_cast("long"))
        .withColumn("duration", F.col("duration_str").try_cast("double"))
    )

    time_ok = (
        F.col("log_time_str").rlike(X.TIME_PATTERN)
        & F.col("log_ts").isNotNull()
        & (F.col("log_ts") != F.to_timestamp(F.lit(_GO_ZERO), "yyyy-MM-dd'T'HH:mm:ssxxx"))
    )
    record_valid = (
        F.col("field_matched")
        & time_ok
        & (F.col("host_raw") != "")
        & F.col("status_code").isNotNull()
        & (F.col("status_code") != 0)
        & F.col("duration").isNotNull()
        & (F.col("duration") != 0.0)
    )
    df = df.withColumn("record_valid", F.coalesce(record_valid, F.lit(False)))
    df = df.withColumn(
        "parse_reason",
        F.when(F.col("record_valid"), F.lit(None).cast("string"))
        .when(et.isNull(), F.lit(X.REASON_NO_PAYLOAD))
        .when(~F.col("field_matched"), F.lit(X.REASON_BAD_RECORD))
        .otherwise(F.lit(X.REASON_INVALID_FIELD)),
    )
    df = df.withColumn("host", F.when(F.col("record_valid"), F.col("host_raw")))
    # per-partition lineage (north_rule: per-partition lineage + metrics)
    df = df.withColumn("source_partition", F.spark_partition_id())
    return df.drop("host_raw", "status_str", "duration_str", "field_matched", "_packed")


#: The narrow column set that survives past the parse stage — html/text are
#: dropped here so the multi-KB page body never reaches a shuffle or sink.
NARROW_COLUMNS = [
    "url", "warc_ts", "lang", "html_valid", "extracted_text", "log_time_str",
    "host", "status_code", "duration", "log_ts", "record_valid",
    "parse_reason", "source_partition",
]


def narrow(parsed: DataFrame) -> DataFrame:
    return parsed.select(*NARROW_COLUMNS)
