"""Point-in-interval join semantics (operators/rangejoin.py): boundary
inclusivity, multi-bucket intervals, empty intervals, collision guards —
and equivalence with the naive non-equi join."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from access_log_aggregator_spark.operators.rangejoin import point_in_interval_join


def _t(h, m=0, s=0):
    return datetime(2025, 5, 1, h, m, s)


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [
            (1, "a", _t(10, 0)),    # == start: IN
            (2, "a", _t(10, 59, 59)),  # just inside
            (3, "a", _t(11, 0)),    # == end: OUT
            (4, "a", _t(9, 59, 59)),   # before: OUT
            (5, "b", _t(10, 30)),   # other key, long interval
            (6, "zz", _t(10, 30)),  # key with no interval at all: OUT
            (7, "c", _t(12, 0)),    # key with empty interval: OUT
        ],
        "event_id long, k string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("a", _t(10, 0), _t(11, 0), "iv_a"),
            ("b", _t(8, 0), _t(14, 0), "iv_b"),     # spans many 30-min buckets
            ("c", _t(12, 0), _t(12, 0), "iv_empty"),  # empty: matches nothing
        ],
        "k string, iv_start timestamp, iv_end timestamp, iv_name string",
    )
    return points, intervals


def test_semantics(frames):
    points, intervals = frames
    out = point_in_interval_join(
        points, intervals, on=["k"], ts="ts", start="iv_start", end="iv_end"
    )
    got = {(r["event_id"], r["iv_name"]) for r in out.collect()}
    assert got == {(1, "iv_a"), (2, "iv_a"), (5, "iv_b")}


def test_matches_naive_join(frames):
    points, intervals = frames
    fast = point_in_interval_join(
        points, intervals, on=["k"], ts="ts", start="iv_start", end="iv_end",
        bucket_width_s=60,  # narrow buckets: intervals explode to many rows
    ).select("event_id", "iv_name")
    naive = (
        points.join(intervals, "k")
        .where((F.col("iv_start") <= F.col("ts")) & (F.col("ts") < F.col("iv_end")))
        .select("event_id", "iv_name")
    )
    assert fast.exceptAll(naive).count() == 0 and naive.exceptAll(fast).count() == 0


def test_fuzz_matches_naive(spark):
    """Seeded fuzz: random boundary-heavy points/intervals, three bucket
    widths (including widths that do NOT divide the interval lengths) —
    bucketized output == naive non-equi join every time."""
    import random
    from datetime import timedelta

    rng = random.Random(3)
    base = _t(0)
    keys = ["a", "b", "c"]
    pts = []
    for i in range(300):
        # second-granularity offsets, biased toward round values so exact
        # boundary collisions actually occur
        off = rng.choice([rng.randrange(86400),
                          rng.randrange(24) * 3600,
                          rng.randrange(1440) * 60])
        pts.append((i, rng.choice(keys), base + timedelta(seconds=off)))
    ivs = []
    for i in range(60):
        s = rng.choice([rng.randrange(86400), rng.randrange(24) * 3600])
        ln = rng.choice([0, 1, 59, 60, 3600, rng.randrange(20000)])
        ivs.append((rng.choice(keys), base + timedelta(seconds=s),
                    base + timedelta(seconds=s + ln), f"iv{i}"))
    points = spark.createDataFrame(pts, "event_id long, k string, ts timestamp")
    intervals = spark.createDataFrame(
        ivs, "k string, iv_start timestamp, iv_end timestamp, iv_name string")
    naive = (
        points.join(intervals, "k")
        .where((F.col("iv_start") <= F.col("ts")) & (F.col("ts") < F.col("iv_end")))
        .select("event_id", "iv_name")
    )
    naive_rows = {tuple(r) for r in naive.collect()}
    for width in (7, 60, 3600):
        fast = point_in_interval_join(
            points, intervals, on=["k"], ts="ts",
            start="iv_start", end="iv_end", bucket_width_s=width,
        ).select("event_id", "iv_name")
        assert {tuple(r) for r in fast.collect()} == naive_rows, width


def test_rejects_collisions(frames):
    points, intervals = frames
    with pytest.raises(ValueError, match="collision"):
        point_in_interval_join(
            points, intervals.withColumnRenamed("iv_name", "ts"),
            on=["k"], ts="ts", start="iv_start", end="iv_end",
        )
    with pytest.raises(ValueError, match="_bucket"):
        point_in_interval_join(
            points.withColumn("_bucket", F.lit(1)), intervals,
            on=["k"], ts="ts", start="iv_start", end="iv_end",
        )
