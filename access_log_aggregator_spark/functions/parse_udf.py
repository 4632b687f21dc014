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
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import extract as X

# pandas .str.extract needs a capture group; wrap the canonical pattern.
_EXTRACT_RE = re.compile("(" + X.LINE_PATTERN + ")", re.MULTILINE)

#: RE2 form for pyarrow.compute.extract_regex: named group + inline (?m).
#: On the pattern subset used (ASCII literals, '.', anchors) RE2 and Python
#: re produce identical leftmost matches over valid UTF-8 — asserted per-url
#: by the byte-parity suite.
_EXTRACT_RE2 = "(?m)(?P<line>" + X.LINE_PATTERN + ")"


def _extract_arrow(s: pd.Series) -> pd.Series:
    """C++-vectorized first-match extraction (RE2 via pyarrow.compute).

    GIL-free and ~10x faster than pandas .str.extract — this is what keeps
    the Python stage from capping pipeline scaling at high core counts.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.Array.from_pandas(s, type=pa.string())
    line = pc.struct_field(pc.extract_regex(arr, _EXTRACT_RE2), "line")
    return line.to_pandas()


def _extract_pandas(s: pd.Series) -> pd.Series:
    """Fallback path: pandas .str.extract (Python re, first match)."""
    out = s.str.extract(_EXTRACT_RE, expand=True)[0]
    return out.where(out.notna(), None)


try:  # prefer the RE2 path when the runtime supports it
    import pyarrow.compute as _pc

    _EXTRACT_IMPL = _extract_arrow if hasattr(_pc, "extract_regex") else _extract_pandas
except Exception:  # pragma: no cover
    _EXTRACT_IMPL = _extract_pandas


# explicit DataType (not a DDL string) so the UDF can be defined without an
# active SparkSession (the DDL parser needs one)
@pandas_udf(StringType())
def extract_payload_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Series[str] text -> Series[str|None] first JSON-object-looking line.

    First match per row, exactly like the oracle's ``LINE_RE.search``
    (functions/extract.py). NaN/None text => None.
    """
    impl = _EXTRACT_IMPL  # bound once per worker process
    for s in batches:
        yield impl(s)


#: Output schema of the wide-grammar fallback parse (Go zero values for
#: missing/null fields; json_ok=False exactly where json.Unmarshal errors).
_FALLBACK_SCHEMA = StructType([
    StructField("time_str", StringType()),
    StructField("host", StringType()),
    StructField("status_code", LongType()),
    StructField("duration", DoubleType()),
    StructField("json_ok", BooleanType()),
])


@pandas_udf(_FALLBACK_SCHEMA)
def go_fallback_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    """Wide-grammar record parse: exact Go ``json.Unmarshal`` semantics via
    the shared :func:`...extract.go_unmarshal_fields` primitive.

    The caller feeds NULL for every row the fast-path regex already handled
    (operators/parse.py gates the input column on ``~field_matched``), so the
    per-row Python here runs only on the rare remainder — reordered keys,
    interstitial whitespace, escaped strings, malformed JSON — while the
    Arrow batch transfer of a mostly-null column stays cheap. This preserves
    the "no per-row Python on the hot path" posture: the hot path is the
    regex; this is the exactness escape hatch json.Unmarshal requires
    (trailing-content and duplicate-key rules are not regex-expressible).
    """
    unmarshal = X.go_unmarshal_fields  # bound once per worker process
    cols = ["time_str", "host", "status_code", "duration", "json_ok"]
    for s in batches:
        out = []
        for line in s:
            if line is None or (isinstance(line, float) and pd.isna(line)):
                out.append((None, None, None, None, None))
                continue
            f = unmarshal(line)
            if f is None:
                out.append((None, None, None, None, False))
            else:
                out.append((*f, True))
        # object dtype everywhere: pandas would otherwise infer float64 for
        # a None+int status column and silently mangle int64-edge values
        yield pd.DataFrame(
            {c: pd.Series([r[i] for r in out], dtype="object")
             for i, c in enumerate(cols)}
        )


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
