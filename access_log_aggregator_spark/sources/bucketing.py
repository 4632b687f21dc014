"""Bucketed tables — co-located joins with zero exchange.

The north_rule calls for "bucketing for co-located joins": when two large
tables are repeatedly joined on the same key (fact-to-fact joins that no
broadcast can absorb), writing BOTH bucketed by the join key with the same
bucket count lets Catalyst plan the join with NO Exchange on either side —
each task reads the matching bucket files directly, so the recurring
shuffle of the bigger table becomes a scan. A ``sortBy`` on the same key
additionally removes the per-task sort from sort-merge joins.

This is the durable twin of the dedup modules' localCheckpoint
materialization: at 100 TB you bucket the routed/doc tables once at write
time and every downstream self-join, near-dup banding join, or enrichment
by a co-bucketed dim rides the layout for free.

``tests/test_plans.py::test_bucketed_join_is_shuffle_free`` pins the
zero-Exchange plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                   sort: bool = True) -> None:
    """Write ``df`` as a parquet table bucketed (and by default sorted)
    by ``key``. ``table`` may be database-qualified; the caller owns the
    database's location (tests point it at a tmp dir)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  left_key: str, right_key: str, how: str = "inner") -> DataFrame:
    """Join two co-bucketed tables on their bucket keys. With equal bucket
    counts the physical plan contains no Exchange (asserted in tests)."""
    lt, rt = spark.table(left_table), spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key], how)
