"""Point-in-interval (range) join — an operator OSS Spark lacks natively.

``points JOIN intervals ON key AND start <= ts < end`` planned naively is a
BroadcastNestedLoopJoin (or worse, a cartesian product) because Catalyst
has no range-join optimization outside proprietary forks. This operator
re-expresses it as an EQUI-join by time bucketing:

- each interval row is exploded to the buckets it spans (one narrow row
  per bucket);
- each point row computes its single bucket (pure map);
- the join is then ``(key, bucket)`` equality plus the exact
  ``start <= ts < end`` residual filter.

A point lives in exactly one bucket, so no dedup is needed: every
qualifying (point, interval) pair is produced exactly once. The shuffle
moves (key, bucket) equi-join rows — the same cost class as any join —
instead of planning a nested loop, and AQE splits skewed buckets.

Pick ``bucket_width_s`` near the typical interval length: intervals
explode to O(length/width) rows while each bucket keeps O(width-density)
points (the classic time-bucketing tradeoff).

Reference analog: none (the reference has no joins at all); this is part
of the graft's §2.6 join surface, oracled by DuckDB's native non-equi
join in the ``events_session_interval_join`` query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    ts: str,
    start: str,
    end: str,
    bucket_width_s: int = 1800,
) -> DataFrame:
    """Join every point row to the interval rows (same ``on`` key) with
    ``start <= ts < end``. Time columns are timestamps at-or-after the
    epoch; buckets are exact integer division of epoch-microseconds (no
    double rounding anywhere near bucket boundaries). Output = point
    columns + interval payload columns (names must not collide).
    Empty/inverted intervals (end <= start) match nothing, like the
    predicate itself."""
    overlap = (set(points.columns) & set(intervals.columns)) - set(on)
    if overlap:
        raise ValueError(f"column collision between sides: {overlap}")
    if "_bucket" in set(points.columns) | set(intervals.columns):
        raise ValueError("columns collide with range-join internals: _bucket")

    w_us = int(bucket_width_s) * 1_000_000

    def bucket(col: str) -> Column:
        # cast: accept TIMESTAMP and TIMESTAMP_NTZ alike (session tz is UTC)
        return F.expr(f"unix_micros(cast({col} as timestamp)) div {w_us}")

    p = points.withColumn("_bucket", bucket(ts))
    iv = intervals.where(F.col(end) > F.col(start)).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                bucket(start),
                # end is exclusive: last spanned bucket holds end - 1 us
                F.expr(f"(unix_micros(cast({end} as timestamp)) - 1) div {w_us}"),
            )
        ),
    )
    # INNER only: the residual range filter runs after the bucket equi-join,
    # which would silently discard the null-extended rows of an outer join —
    # unmatched-point semantics belong to a left-anti composition on top.
    joined = p.join(iv, [*on, "_bucket"], "inner").where(
        (F.col(start) <= F.col(ts)) & (F.col(ts) < F.col(end))
    )
    return joined.drop("_bucket")
