"""Driver-contract sanity: oracle SQL parses, and a representative subset
matches DuckDB exactly at sf0.001 (the full sweep lives in
tests/run_entry_check.py, which mirrors the driver at sf0.01)."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod
from access_log_aggregator_spark.queries import QUERIES, TABLES

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "events_agg_by_type",
    "events_route_fanout",
    "q1_pricing_summary",
    "doc_fingerprints",
    "dedup_simhash",
    "ann_cosine_topk",
    "text_langid_quality",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def test_registry_shape():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25
    # every oracle-less entry is a deliberate rows-only op
    # (stub_features gained a byte-arithmetic DuckDB oracle in round 3)
    rows_only = set(qs) - set(oracles)
    assert rows_only == {"multimodal_resize", "multimodal_frame_sample"}
    # every oracled entry sits inside the driver's 50-row CORRECTNESS
    # window (the r2 gap: 52 oracled queries in 55 positions left 2 unseen)
    names = list(qs)
    assert all(n in oracles for n in names[:50])
    assert len(oracles) <= 50


def test_all_oracles_parse_in_duckdb(duck):
    for name, sql in entry_mod.oracle_sql().items():
        duck.sql(f"explain {sql}")  # raises on syntax/binding errors


@pytest.mark.parametrize("name", SUBSET)
def test_subset_matches_duckdb(name, spark, duck):
    from tests.run_entry_check import compare

    sdf = QUERIES[name].spark_fn(spark, SF_DIR).toPandas()
    ddf = duck.sql(QUERIES[name].oracle).df()
    problems = compare(name, sdf, ddf)
    assert not problems, problems


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
