"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the log-pipeline analog:
parse -> route -> aggregate over the events table at sf0.001).
``queries()``/``oracle_sql()`` expose the full operator registry from
``access_log_aggregator_spark.queries`` — each Spark implementation paired
with a DuckDB oracle over the same parquet views (rows-only entries are the
pages-pipeline and multimodal-plumbing queries, which have no SQL analog).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from access_log_aggregator_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: events parse->route->aggregate at sf0.001 (driver smoke)."""
    return QUERIES["events_agg_by_type"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark_fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    # the pipeline_* oracles read the cached pages corpus parquet directly;
    # make sure it exists even when the oracle runs before the Spark side
    from access_log_aggregator_spark.queries import ensure_pipeline_fixtures

    ensure_pipeline_fixtures()
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}
