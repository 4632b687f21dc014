"""The full-chain DuckDB pipeline oracle is not seed-specific: on a corpus
with a DIFFERENT seed and size than the registry fixture, the Spark
parse->enrich->route->aggregate results still match the independent SQL
re-derivation row-for-row, hash-exact."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from access_log_aggregator_spark.plans.pipeline import build_routed
from access_log_aggregator_spark.queries import (
    _pipeline_agg_by_host_oracle,
    _pipeline_route_counts_oracle,
)
from access_log_aggregator_spark.sources.pages import (
    generate_host_lookup,
    generate_pages,
)
from tests.run_entry_check import compare


@pytest.fixture(scope="module")
def alt_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("altcorpus")
    (root / "pages").mkdir()
    pq.write_table(
        pa.Table.from_pandas(generate_pages(1500, seed=99), preserve_index=False),
        root / "pages" / "part-0.parquet",
    )
    pq.write_table(
        pa.Table.from_pandas(generate_host_lookup(), preserve_index=False),
        root / "lookup.parquet",
    )
    return root


@pytest.fixture(scope="module")
def alt_routed(spark, alt_root):
    pages = spark.read.parquet(str(alt_root / "pages"))
    lookup = spark.read.parquet(str(alt_root / "lookup.parquet"))
    return build_routed(pages, lookup)


def test_generate_pages_zero_rows_keeps_schema():
    """--generate 0 is a valid degenerate corpus: empty frame, same
    columns and dtypes (previously an IndexError on parts[0])."""
    empty = generate_pages(0)
    ref = generate_pages(3)
    assert len(empty) == 0
    assert list(empty.columns) == list(ref.columns)
    assert empty.dtypes.equals(ref.dtypes)


def test_route_counts_cross_seed(alt_routed, alt_root):
    sdf = (
        alt_routed.groupBy("match_class").agg(F.count(F.lit(1)).alias("hits"))
        .orderBy("match_class").toPandas()
    )
    con = duckdb.connect()
    ddf = con.sql(_pipeline_route_counts_oracle(alt_root)).df()
    assert not compare("route_counts_seed99", sdf, ddf)
    assert sdf["hits"].sum() == 1500


def test_agg_by_host_cross_seed(alt_routed, alt_root):
    from access_log_aggregator_spark.operators.aggregate import aggregate_by_host

    valid = alt_routed.filter(F.col("match_class").isin("parsed", "bot"))
    agg = aggregate_by_host(valid, salt_buckets=8)
    sum_s = F.col("sum_duration_dec").cast("decimal(28,9)").cast("double")
    sdf = agg.select(
        "host", "total_requests", "requests_2xx", "requests_non_2xx",
        sum_s.alias("sum_duration_s"),
        (sum_s / F.col("total_requests")).alias("avg_duration_s"),
    ).toPandas()
    con = duckdb.connect()
    ddf = con.sql(_pipeline_agg_by_host_oracle(alt_root)).df()
    assert not compare("agg_by_host_seed99", sdf, ddf)
    assert len(sdf) > 10
