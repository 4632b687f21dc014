"""Sketch operators (operators/sketch.py): HLL + count-min invariants.

Cross-engine value parity for the registry queries is covered by the
driver gate (pipeline_approx_distinct_hll / pipeline_heavy_hitters_cms in
tests/run_entry_check.py); these tests pin the SKETCH-algebra properties
that make the operators usable at scale — mergeability, the overestimate
bound, both estimator regimes, and the bounded-state plan shapes.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from access_log_aggregator_spark.functions import xsql as x
from access_log_aggregator_spark.operators.sketch import (
    cms_counter_table,
    cms_estimate,
    cms_heavy_hitters,
    cms_merge_counters,
    histogram_merge,
    histogram_quantiles,
    histogram_table,
    hll_distinct,
    hll_estimate,
    hll_merge_registers,
    hll_register_table,
)


@pytest.fixture(scope="module")
def keys_df(spark):
    """5,000 rows over 2,600 distinct keys with one planted heavy hitter
    ('hot' appears 2,401 times; 2,599 singletons)."""
    return spark.range(5000).select(
        F.when(F.col("id") < 2401, F.lit("hot"))
        .otherwise(F.concat(F.lit("key-"), F.col("id")))
        .alias("k"),
        (F.col("id") % 2).alias("half"),
    )


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def _est(df) -> float:
    [row] = df.collect()
    return row.approx_distinct


def test_hll_raw_regime_accuracy(spark):
    # 3,000 distinct keys >> 2.5 * M = 320 -> the raw-estimate branch;
    # std error ~ 1.04/sqrt(128) = 9.2%, assert a 3-sigma-ish bound
    df = spark.range(3000).select(
        F.concat(F.lit("u-"), F.col("id")).alias("k"))
    est = _est(hll_distinct(df, "k"))
    assert abs(est - 3000) / 3000 < 0.28


def test_hll_linear_counting_regime_accuracy(spark):
    # 120 distinct keys < 320 -> the linear-counting branch
    df = spark.range(120).select(F.concat(F.lit("v-"), F.col("id")).alias("k"))
    est = _est(hll_distinct(df, "k"))
    assert abs(est - 120) / 120 < 0.25


def test_hll_duplicates_do_not_move_the_estimate(spark, keys_df):
    # cardinality estimation must ignore multiplicity: the 5,000-row frame
    # and its distinct projection sketch identically
    a = _est(hll_distinct(keys_df, "k"))
    b = _est(hll_distinct(keys_df.select("k").distinct(), "k"))
    assert a == b


def test_hll_register_table_is_mergeable(spark, keys_df):
    """sketch(A union B) == merge(sketch(A), sketch(B)) — the property that
    lets per-partition/per-day register tables re-aggregate without
    re-reading raw rows."""
    whole = hll_register_table(keys_df, "k").orderBy("hll_reg")
    parts = [
        hll_register_table(keys_df.where(F.col("half") == i), "k")
        for i in (0, 1)
    ]
    merged = hll_merge_registers(parts[0].unionAll(parts[1])).orderBy("hll_reg")
    assert [tuple(r) for r in whole.collect()] == \
           [tuple(r) for r in merged.collect()]
    # and the estimate built from the merged sketch matches end-to-end
    assert _est(hll_estimate(merged)) == _est(hll_distinct(keys_df, "k"))


def test_hll_grouped_matches_per_group_sketches(spark, keys_df):
    grouped = {r.half: r.approx_distinct
               for r in hll_distinct(keys_df, "k", ["half"]).collect()}
    for h in (0, 1):
        solo = _est(hll_distinct(keys_df.where(F.col("half") == h), "k"))
        assert grouped[h] == solo


def test_hll_register_table_bounded_and_shuffles_once(spark, keys_df):
    from access_log_aggregator_spark.plans.audit import shape_facts

    regs = hll_register_table(keys_df, "k")
    assert regs.count() <= x.HLL_M
    # partial+final hash aggregate around exactly one exchange: the shuffle
    # carries <= HLL_M rows per upstream partition, never the raw keys
    f = shape_facts(regs)
    assert f["ex_hash"] == 1 and f["ex_range"] == 0 and f["ex_single"] == 0
    # the avalanche rounds must stay lambda-bound: a flat formulation let
    # CollapseProject duplicate the per-char polyhash fold 2^rounds times
    # (observed); reg + rho legitimately carry one fold each
    from access_log_aggregator_spark.plans.audit import plan_string

    assert plan_string(regs).count("aggregate(transform(split(") <= 2


# ---------------------------------------------------------------------------
# Count-min
# ---------------------------------------------------------------------------

def test_cms_never_underestimates(spark, keys_df):
    exact = keys_df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    est = cms_estimate(cms_counter_table(keys_df, "k"),
                       keys_df.select("k").distinct(), "k")
    joined = est.join(exact, "k")
    assert joined.where(F.col("est_count") < F.col("n")).count() == 0


def test_cms_heavy_hitters_full_recall(spark, keys_df):
    # overestimate-only semantics guarantee every true heavy hitter
    # appears; the planted one must be estimated exactly or above
    hh = {r.k: r.est_count
          for r in cms_heavy_hitters(keys_df, "k", 100).collect()}
    assert "hot" in hh and hh["hot"] >= 2401
    # singletons can only reach 100 through 4-row collision pileups, which
    # 2,600 keys in 4 x 512 cells cannot produce
    assert set(hh) == {"hot"}


def test_cms_counter_table_bounded_and_mergeable(spark, keys_df):
    whole = cms_counter_table(keys_df, "k")
    assert whole.count() <= x.CMS_D * x.CMS_W
    parts = [cms_counter_table(keys_df.where(F.col("half") == i), "k")
             for i in (0, 1)]
    merged = cms_merge_counters(parts[0].unionAll(parts[1]))
    key = ["cms_row", "cms_bucket"]
    assert sorted(map(tuple, whole.collect())) == \
           sorted(map(tuple, merged.collect()))


def test_cms_probing_novel_keys_returns_zero_not_false_hitters(spark, keys_df):
    """The probe set need not come from the sketched data: a novel key's
    cells are (mostly) empty, and empty cells must count 0 in the min —
    an inner join dropped them, turning one collision with a hot key
    into a false heavy hitter and an all-empty key into a missing row
    (found in review)."""
    counters = cms_counter_table(keys_df, "k")
    novel = spark.range(200).select(
        F.concat(F.lit("novel-"), F.col("id")).alias("k"))
    est = cms_estimate(counters, novel, "k")
    rows = {r.k: r.est_count for r in est.collect()}
    assert len(rows) == 200          # nobody vanishes
    # 200 novel keys x 4 cells vs 2,600 occupied of 2,048... most cells
    # carry singleton counts; a novel key's min over 4 cells is ~always 0
    # and NEVER anywhere near the heavy hitter
    assert all(v < 100 for v in rows.values())
    assert sum(1 for v in rows.values() if v == 0) > 100


def test_sketches_ignore_null_keys(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("",), (None,)], "k string")
    # HLL: NULL not counted (countDistinct semantics); '' IS a value
    [row] = hll_distinct(df, "k").collect()
    two = spark.createDataFrame([("a",), ("",)], "k string")
    [row2] = hll_distinct(two, "k").collect()
    assert row.approx_distinct == row2.approx_distinct
    # CMS: null rows contribute no cells; probing returns only non-null
    counters = cms_counter_table(df, "k")
    assert counters.agg(F.sum("cell_count")).collect()[0][0] == \
        2 * x.CMS_D
    est = cms_estimate(counters, df.select("k").distinct(), "k")
    assert {r.k for r in est.collect()} == {"a", ""}


def test_hll_empty_input_estimates_zero(spark):
    df = spark.createDataFrame([], "k string")
    [row] = hll_distinct(df, "k").collect()
    assert row.approx_distinct == 0.0   # not NULL (found in review)


def test_cms_estimate_join_is_broadcast(spark, keys_df):
    from access_log_aggregator_spark.plans.audit import shape_facts

    est = cms_estimate(cms_counter_table(keys_df, "k"),
                       keys_df.select("k").distinct(), "k")
    f = shape_facts(est)
    assert f["bhj"] >= 1 and f["smj"] == 0 and f["nl"] == 0


# ---------------------------------------------------------------------------
# Fixed-bucket histogram (quantile sketch)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def latencies(spark):
    """10,000 deterministic 'durations' in (0, 1), skewed toward small
    values like real latencies, with a stratifying host column."""
    return spark.range(10_000).select(
        (F.expr("pmod(id * 2654435761, 1000003)") / 1000003.0)
        .alias("u"),
        F.expr("case pmod(id, 3) when 0 then 'a.net' when 1 then 'b.net' "
               "else 'c.net' end").alias("host"),
    ).select("host", (F.col("u") * F.col("u")).alias("duration"))


def test_histogram_quantiles_within_bucket_width(spark, latencies):
    B = 256
    hist = histogram_table(latencies, "duration", 0.0, 1.0, B, ["host"])
    est = histogram_quantiles(hist, [0.5, 0.95, 0.99], 0.0, 1.0, B,
                              ["host"])
    exact = latencies.groupBy("host").agg(
        F.expr("percentile(duration, array(0.5, 0.95, 0.99))").alias("p"))
    ex = {r.host: r.p for r in exact.collect()}
    for r in est.collect():
        want = ex[r.host][{0.5: 0, 0.95: 1, 0.99: 2}[r.q]]
        assert abs(r.quantile_est - want) <= 2.0 / B, (r, want)


def test_histogram_state_bounded_and_mergeable(spark, latencies):
    B = 64
    whole = histogram_table(latencies, "duration", 0.0, 1.0, B, ["host"])
    assert whole.count() <= 3 * B
    # split by a value predicate so both shards hold every host
    parts = [
        histogram_table(latencies.where(f"duration {op} 0.25"),
                        "duration", 0.0, 1.0, B, ["host"])
        for op in ("<", ">=")
    ]
    merged = histogram_merge(parts[0].unionAll(parts[1]), ["host"])
    assert sorted(map(tuple, whole.collect())) == \
        sorted(map(tuple, merged.collect()))


def test_histogram_clamps_out_of_range_and_skips_nulls(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.5,), (99.0,), (None,)], "v double")
    hist = histogram_table(df, "v", 0.0, 1.0, 4)
    rows = {r.hist_bucket: r.bucket_count for r in hist.collect()}
    assert rows == {0: 1, 2: 1, 3: 1}  # clamped low, mid, clamped high
    assert sum(rows.values()) == 3     # NULL not counted


def test_histogram_single_shuffle_plan(spark, latencies):
    from access_log_aggregator_spark.plans.audit import shape_facts

    f = shape_facts(histogram_table(latencies, "duration", 0.0, 1.0, 256,
                                    ["host"]))
    assert f["ex_hash"] == 1 and f["ex_range"] == 0 and f["ex_single"] == 0


def test_histogram_validation(spark, latencies):
    with pytest.raises(ValueError):
        histogram_table(latencies, "duration", 1.0, 0.0)
    with pytest.raises(ValueError):
        histogram_table(latencies, "duration", 0.0, 1.0, 0)
    hist = histogram_table(latencies, "duration", 0.0, 1.0, 8)
    with pytest.raises(ValueError):
        histogram_quantiles(hist, [], 0.0, 1.0, 8)
    with pytest.raises(ValueError):
        histogram_quantiles(hist, [1.5], 0.0, 1.0, 8)


def test_histogram_extreme_values_clamp_not_crash(spark):
    """Unclamped floor/cast of huge or infinite values overflowed under
    Spark's default ANSI mode (found in review); NaN routes to the TOP
    bucket, matching the NaN-greatest ordering exact percentile uses."""
    df = spark.createDataFrame(
        [(1e300,), (float("inf"),), (float("-inf"),), (float("nan"),),
         (0.5,)], "v double")
    hist = histogram_table(df, "v", 0.0, 1.0, 4)
    rows = {r.hist_bucket: r.bucket_count for r in hist.collect()}
    assert rows == {3: 3, 0: 1, 2: 1}  # 1e300/inf/NaN top, -inf bottom


def test_histogram_quantiles_accept_unmerged_unions(spark, latencies):
    """A raw union of shard histograms must quantile identically to the
    merged table (duplicate bucket rows were RANGE-frame peers emitting
    conflicting rows — found in review)."""
    B = 64
    parts = [
        histogram_table(latencies.where(f"duration {op} 0.25"),
                        "duration", 0.0, 1.0, B, ["host"])
        for op in ("<", ">=")
    ]
    union = parts[0].unionAll(parts[1])
    merged = histogram_merge(union, ["host"])
    a = sorted(map(tuple, histogram_quantiles(
        union, [0.5, 0.95], 0.0, 1.0, B, ["host"]).collect()))
    b = sorted(map(tuple, histogram_quantiles(
        merged, [0.5, 0.95], 0.0, 1.0, B, ["host"]).collect()))
    assert a == b
    assert len(a) == 6  # 3 hosts x 2 quantiles, exactly one row each
