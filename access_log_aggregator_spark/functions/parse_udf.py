"""Vectorized payload extraction — the ONLY Python on the hot path.

An Arrow-batched pandas UDF (iterator form, so the compiled regex is bound
once per executor worker rather than once per batch — SURVEY.md §4.2 item 5)
that applies the canonical LINE_RE to the ``text`` column and returns the
extracted access-log line. Everything downstream (field parse, validation,
routing, aggregation) is pure Catalyst.

A pure-JVM twin (:func:`extract_payload_expr`) implements the identical
contract with ``regexp_extract``; the pipeline can run either (the pandas UDF
is the north-star-mandated component; the JVM expression is the zero-Python
alternative) and a test asserts they agree row-for-row.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from . import extract as X

# pandas .str.extract needs a capture group; wrap the canonical pattern.
_EXTRACT_RE = re.compile("(" + X.LINE_PATTERN + ")", re.MULTILINE)


# explicit DataType (not a DDL string) so the UDF can be defined without an
# active SparkSession (the DDL parser needs one)
@pandas_udf(StringType())
def extract_payload_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Series[str] text -> Series[str|None] first JSON-object-looking line.

    ``Series.str.extract`` takes the FIRST match, exactly like the oracle's
    ``LINE_RE.search`` (functions/extract.py). NaN/None text => None.
    """
    pat = _EXTRACT_RE  # bound once per worker process
    for s in batches:
        out = s.str.extract(pat, expand=True)[0]
        yield out.where(out.notna(), None)


def extract_payload_expr(text: Column) -> Column:
    """JVM twin: regexp_extract with the same canonical pattern.

    Java regex semantics match Python's for this pattern subset: '.' does not
    cross newlines, and MULTILINE '^'/'$' anchor at '\\n' boundaries (the
    corpus never contains '\\r', where the two engines would differ).
    regexp_extract yields '' on no-match; a real payload always starts with
    '{' so '' unambiguously means "no payload" -> NULL.
    """
    got = F.regexp_extract(text, "(?m)(" + X.LINE_PATTERN + ")", 1)
    return F.nullif(got, F.lit(""))
