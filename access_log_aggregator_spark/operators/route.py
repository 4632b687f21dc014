"""Fan-out router: one ``when()`` chain assigns every page to exactly one sink.

Reference analog: the reference merely counts invalid lines into one
malformRecord counter and drops them (internal/app/aggregate.go:15,38-41);
the graft routes every row to one of four classes (north_star match classes)
so nothing is dropped and per-sink counts are auditable:

    error    — html bytes are not valid UTF-8 (decode failure path)
    unparsed — no payload / unmatchable record / model.go:24 validation fail
    bot      — valid record on a host flagged is_bot_host in the lookup dim
    parsed   — everything else (a valid reference record)

Priority is error > unparsed > bot > parsed and each row matches exactly one
class, so per-sink counts always sum to the input count (an invariant test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import extract as X

ALL_CLASSES = [X.CLASS_PARSED, X.CLASS_UNPARSED, X.CLASS_BOT, X.CLASS_ERROR]


def route(enriched: DataFrame) -> DataFrame:
    """Add ``match_class`` and final ``reject_reason`` columns."""
    df = enriched.withColumn(
        "match_class",
        F.when(~F.col("html_valid"), F.lit(X.CLASS_ERROR))
        .when(~F.col("record_valid"), F.lit(X.CLASS_UNPARSED))
        .when(F.coalesce(F.col("is_bot_host"), F.lit(False)), F.lit(X.CLASS_BOT))
        .otherwise(F.lit(X.CLASS_PARSED)),
    )
    return df.withColumn(
        "reject_reason",
        F.when(F.col("match_class") == X.CLASS_ERROR, F.lit(X.REASON_INVALID_UTF8))
        .when(F.col("match_class") == X.CLASS_UNPARSED, F.col("parse_reason")),
    )


def sink_counts(routed: DataFrame) -> dict[str, int]:
    """Exact per-class row counts (one job, one pass)."""
    rows = routed.groupBy("match_class").count().collect()
    out = {c: 0 for c in ALL_CLASSES}
    out.update({r["match_class"]: r["count"] for r in rows})
    return out


def malformed_count(sink_counts_: dict[str, int]) -> int:
    """The reference's malformRecord counter (aggregate.go:15) equals the
    rows that fail parse/validate: unparsed + error."""
    return sink_counts_[X.CLASS_UNPARSED] + sink_counts_[X.CLASS_ERROR]
