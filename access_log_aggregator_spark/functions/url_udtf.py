"""Python UDTF surface: a table function expanding url query params.

One url row -> N (param, value) rows via a lateral join — the UDTF shape
(SURVEY §2.6 "UDF/UDAF/UDTF surface"; the scalar-UDF and grouped-map
surfaces live in parse_udf.py / aggregate.robust_stats_by_group). Python
UDTFs evaluate row-at-a-time, so this is a DEMO of the extension surface,
not a hot-path operator: at scale, prefer the equivalent Catalyst
explode(str_to_map(...)) — the registry query's DuckDB oracle re-derives
the same expansion with pure string SQL, which is also the proof that this
particular function never NEEDED Python.

Grammar note: stdlib parse_qsl also URL-unescapes %xx/+ sequences; the
corpus generator emits unescaped params, and the oracle matches on that
grammar (documented restriction).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="param string, value string")
class UrlParamsUDTF:
    """yield one (param, value) row per query parameter of ``url``."""

    def eval(self, url: str):  # noqa: D102 - contract is the class docstring
        from urllib.parse import parse_qsl, urlsplit

        if url is None:
            return
        for k, v in parse_qsl(urlsplit(url).query):
            yield (k, v)
