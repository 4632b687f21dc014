"""Enrichment: broadcast lookup join + language normalization.

The graft's single join (SURVEY.md §2.6): ``parsed LEFT JOIN host_lookup ON
host`` with an explicit ``broadcast()`` hint — a BroadcastHashJoin, so the
TB-scale fact side never shuffles and host skew (74% one key) cannot create
a hot reducer. Lang normalization is a pure Catalyst expression (no join,
no Python), per the north_star's "without per-row Python".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LOOKUP_COLUMNS = ["host", "geo", "category", "is_bot_host"]


def normalize_lang(df: DataFrame, col: str = "lang") -> DataFrame:
    """'en-US'/'EN'/'' -> 'en'/'en'/NULL (canonical lowercase primary subtag)."""
    return df.withColumn(
        "lang_norm",
        F.nullif(F.lower(F.split_part(F.col(col), F.lit("-"), F.lit(1))), F.lit("")),
    )


def enrich(parsed: DataFrame, lookup: DataFrame) -> DataFrame:
    """Left-join the (small) host dim with a broadcast hint.

    Rows with hosts absent from the dim (or invalid rows with NULL host)
    keep NULL geo/category and is_bot_host=false downstream.
    """
    dim = F.broadcast(lookup.select(*LOOKUP_COLUMNS))
    out = parsed.join(dim, on="host", how="left")
    return normalize_lang(out)
