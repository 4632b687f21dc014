"""As-of join semantics on hand-built frames (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from access_log_aggregator_spark.operators.asof import asof_join


def _t(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _t("2024-01-01T10:00:00")),  # before any right row
            (2, "a", _t("2024-01-01T12:00:00")),  # exactly AT a right ts
            (3, "a", _t("2024-01-01T13:30:00")),  # between right rows
            (4, "a", _t("2024-01-01T15:00:00")),  # after the last right row
            (5, "b", _t("2024-01-01T12:00:00")),  # key with no right rows
        ],
        "event_id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", _t("2024-01-01T12:00:00"), 100),
            ("a", _t("2024-01-01T14:00:00"), 200),
        ],
        "k string, r_ts timestamp, r_val long",
    )
    return left, right


def test_asof_semantics(frames):
    left, right = frames
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="r_ts")
    rows = {r["event_id"]: (r["r_ts"], r["r_val"]) for r in out.collect()}
    assert rows[1] == (None, None)                         # nothing yet
    assert rows[2] == (_t("2024-01-01T12:00:00"), 100)     # ts == r_ts matches
    assert rows[3] == (_t("2024-01-01T12:00:00"), 100)     # latest <=
    assert rows[4] == (_t("2024-01-01T14:00:00"), 200)     # after last
    assert rows[5] == (None, None)                         # key unmatched
    assert out.count() == left.count()                     # left-join row count


def test_asof_null_timestamps_match_sql_semantics(spark, frames):
    """NULL timestamps compare as unknown (DuckDB ASOF emits no match) —
    but Spark's asc window order is NULLS FIRST, so an unfiltered null
    right row would sit at the partition head and leak its payload onto
    every left row. Pin both directions: a null right ts never matches,
    and a null left ts emits the row with a null payload."""
    left, right = frames
    null_right = right.union(
        spark.createDataFrame([("a", None, 999)],
                              "k string, r_ts timestamp, r_val long")
    )
    out = asof_join(left, null_right, on=["k"], left_ts="ts", right_ts="r_ts")
    rows = {r["event_id"]: (r["r_ts"], r["r_val"]) for r in out.collect()}
    assert rows[1] == (None, None)      # null right row must NOT match here
    assert rows[2] == (_t("2024-01-01T12:00:00"), 100)  # unchanged elsewhere
    assert rows[5] == (None, None)

    null_left = left.union(
        spark.createDataFrame([(6, "a", None)],
                              "event_id long, k string, ts timestamp")
    )
    out2 = asof_join(null_left, right, on=["k"], left_ts="ts", right_ts="r_ts")
    rows2 = {r["event_id"]: (r["r_ts"], r["r_val"]) for r in out2.collect()}
    assert rows2[6] == (None, None)     # row kept, payload null
    assert out2.count() == null_left.count()


def test_asof_rejects_column_collision(frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("r_val", "event_id"),
                  on=["k"], left_ts="ts", right_ts="r_ts")


def test_asof_rejects_internal_name_collision(frames):
    """A left frame already carrying _side/_asof_ts/... would silently
    produce duplicate columns in the union; reject instead."""
    left, right = frames
    with pytest.raises(ValueError, match="internals"):
        asof_join(left.withColumn("_side", left.event_id), right,
                  on=["k"], left_ts="ts", right_ts="r_ts")
    with pytest.raises(ValueError, match="internals"):
        asof_join(left, right.withColumnRenamed("r_val", "_payload"),
                  on=["k"], left_ts="ts", right_ts="r_ts")
