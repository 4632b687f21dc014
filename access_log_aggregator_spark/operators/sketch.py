"""Bounded-state sketch operators: HyperLogLog, count-min, histogram.

The reference keeps one EXACT counter per host in an unbounded Go map
(internal/accesslog/summaries.go:3-27, print.go:10-27) — fine for one
log file, unbounded state at 10^12 rows. These are the approximate twins
for that scale, covering the three operational log metrics (unique
visitors, top hosts, latency percentiles):

- **HyperLogLog** (Flajolet/Fusy/Gandon/Meunier 2007): distinct counting
  in ``HLL_M`` registers per group. The register table is the sketch —
  mergeable by register-wise ``max`` — so per-partition/per-day sketches
  union and re-aggregate without touching raw rows again.
- **Count-min** (Cormode/Muthukrishnan 2005): frequency estimation in a
  fixed ``CMS_D x CMS_W`` grid of counters, mergeable by cell-wise ``+``;
  estimates upper-bound the true count (min over rows), so heavy hitters
  are never missed.
- **Fixed-bucket histogram**: quantiles over a known value range (the
  reference's duration lives in (0, 1)) in ``<= n_buckets`` counts per
  group, mergeable by cell-wise ``+``; estimate error is bounded by one
  bucket width.

Both build phases are one partial+final hash aggregate whose SHUFFLED key
space is bounded by the sketch size (groups x HLL_M rows, CMS_D x CMS_W
cells), not by the data's key cardinality — that bound is the point at
100 TB. Formulas come from functions/xsql.py (SPARK dialect) so every
value is bit-identical to the DuckDB-oracled registry queries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import xsql as x
from .materialize import Materializer, pin


def _e(sql: str) -> Column:
    return F.expr(sql)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def hll_register_table(df: DataFrame, key_col: str,
                       group_cols: list[str] | None = None) -> DataFrame:
    """The HLL sketch itself: per group, the max first-1-bit position of
    every register that saw a key (``<= HLL_M`` rows per group).

    This frame IS the persistable/mergeable artifact — union two register
    tables and :func:`hll_merge_registers` them to sketch the union of the
    inputs without re-reading either (tested associative/idempotent).
    """
    group_cols = group_cols or []
    # NULL keys are not counted, matching COUNT(DISTINCT)'s null
    # semantics (and NULL would otherwise hash like '' — polyhash's
    # empty-input 0 — silently merging two different "values");
    # F.expr, not F.col: key_col may be a SQL expression like upper(k)
    df = df.where(F.expr(key_col).isNotNull())
    # reg and rho are emitted through ONE `inline` generator over the
    # singleton mix array: a generator evaluates its child once, so the
    # per-char polyhash fold and the avalanche rounds run exactly once
    # per row (a flat-expression formulation let CollapseProject duplicate
    # the fold 2^rounds times — observed in the physical plan; two
    # separate reg/rho columns still cost two folds)
    arr = x.hll_mix_arr(x.polyhash(key_col, x.SPARK), x.SPARK)
    both = (f"inline(transform({arr}, v -> named_struct("
            f"'hll_reg', {x.hll_reg('v', x.SPARK)}, "
            f"'_rho', {x.hll_rho('v', x.SPARK)})))")
    return (
        df.select(*group_cols, _e(both))
        .groupBy(*group_cols, "hll_reg")
        .agg(F.max("_rho").alias("max_rho"))
    )


def hll_merge_registers(regs: DataFrame,
                        group_cols: list[str] | None = None) -> DataFrame:
    """Merge a union of register tables: register-wise max per group."""
    group_cols = group_cols or []
    return regs.groupBy(*group_cols, "hll_reg").agg(
        F.max("max_rho").alias("max_rho")
    )


def hll_estimate(regs: DataFrame,
                 group_cols: list[str] | None = None) -> DataFrame:
    """Cardinality estimate per group from a register table.

    The harmonic sum is accumulated EXACTLY (bigint powers of two, order-
    independent), so the only floating-point work is one fixed-length IEEE
    expression over two exact integers — deterministic across engines,
    partitionings and merge orders. The estimate is deliberately NOT
    rounded: IEEE arithmetic is bit-identical cross-engine, while decimal
    rounding of a double is not (Spark rounds the exact binary value
    HALF_UP, DuckDB rounds a scaled double — they disagreed on a real
    corpus value 2.5e-7 from a .0005 boundary)."""
    group_cols = group_cols or []
    term = x.hll_pow2_term("max_rho", x.SPARK)
    # coalesce: a global aggregate over an EMPTY register table still
    # emits one row (sum NULL, count 0) — with the sum pinned to 0 the
    # estimator's V = M arm reports cardinality exactly 0, not NULL
    agg = regs.groupBy(*group_cols).agg(
        F.expr(f"coalesce(sum({term}), 0L)").alias("_s"),
        F.count(F.lit(1)).alias("_nreg"),
    )
    est = x.hll_estimate("_s", "_nreg", x.SPARK)
    return agg.select(*group_cols, _e(est).alias("approx_distinct"))


def hll_distinct(df: DataFrame, key_col: str,
                 group_cols: list[str] | None = None) -> DataFrame:
    """``approx count distinct key_col`` per group, end to end."""
    return hll_estimate(hll_register_table(df, key_col, group_cols),
                        group_cols)


# ---------------------------------------------------------------------------
# Count-min
# ---------------------------------------------------------------------------

def _cms_cells(key_col: str) -> Column:
    """``inline`` generator emitting the CMS_D (cms_row, cms_bucket) cells
    of a key. The polyhash binds to a lambda variable over a singleton
    array, so the per-char fold runs ONCE per row — the naive
    explode(array(struct...)) form inlined it once per sketch row, which
    both cost 4 folds per input row and pushed the generated projection
    method past HotSpot's 8000-byte JIT cap (46 kB, observed)."""
    coeffs = ", ".join(
        f"named_struct('i', {i}, 'a', {a}, 'b', {b})"
        for i, (a, b) in enumerate(x.CMS_COEFFS)
    )
    cells = (
        f"flatten(transform(array({x.polyhash(key_col, x.SPARK)}), p -> "
        f"transform(array({coeffs}), c -> named_struct("
        f"'cms_row', c.i, "
        f"'cms_bucket', ((c.a * p + c.b) % {x.P}) % {x.CMS_W}))))"
    )
    return _e(f"inline({cells})")


def cms_counter_table(df: DataFrame, key_col: str) -> DataFrame:
    """The count-min sketch: ``CMS_D x CMS_W`` cell counts (one pass,
    partial aggregation map-side; mergeable by cell-wise sum). NULL keys
    are not counted (matching the register-table convention — NULL would
    otherwise collide with the empty string at polyhash 0)."""
    return (
        df.where(F.expr(key_col).isNotNull())
        .select(_cms_cells(key_col))
        .groupBy("cms_row", "cms_bucket")
        .agg(F.count(F.lit(1)).alias("cell_count"))
    )


def cms_merge_counters(counters: DataFrame) -> DataFrame:
    """Merge a union of counter tables: cell-wise sum."""
    return counters.groupBy("cms_row", "cms_bucket").agg(
        F.sum("cell_count").alias("cell_count")
    )


def cms_estimate(counters: DataFrame, keys: DataFrame,
                 key_col: str) -> DataFrame:
    """Estimated frequency of every row of ``keys`` (distinct keys frame):
    min over the D rows' cells — always >= the true count, so a threshold
    scan over the estimates can never miss a true heavy hitter.

    The counter table is at most CMS_D * CMS_W rows by construction, so
    the lookup join is a broadcast (asserted by the plan tests). The
    join is a LEFT join with empty cells counting 0: probe keys need
    not come from the sketched data (the whole point of probing), and
    an inner join would silently drop a novel key's empty cells —
    inflating its min (a false heavy hitter on one collision) or
    erasing the key from the output when all its cells are empty.

    ``key_col`` must be a real column of ``keys`` (it is selected and
    grouped by name), unlike the build-side operators which accept any
    SQL expression."""
    probes = keys.where(F.col(key_col).isNotNull()) \
        .select(key_col, _cms_cells(key_col))
    joined = probes.join(F.broadcast(counters), ["cms_row", "cms_bucket"],
                         "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cell_count"), F.lit(0)))
        .alias("est_count")
    )


def cms_heavy_hitters(df: DataFrame, key_col: str, threshold: int,
                      materializer: Materializer | None = None) -> DataFrame:
    """Keys whose count-min estimate is >= threshold, with the estimate.

    The distinct-keys probe frame makes this exact-recall (no false
    negatives); at 100 TB the probe set is whatever candidate list you
    care about (e.g. yesterday's heavy hitters + a sampled novelty set),
    NOT all keys — the sketch's value is that the counter state, unlike
    the reference's per-host map, never grows past CMS_D * CMS_W cells.

    The key projection is pinned (operators/materialize.py) so the
    upstream — at 100 TB typically a full parse — feeds the counter build
    AND the probe set from one evaluation."""
    base = pin(df.select(key_col), "cms_keys", materializer)
    counters = cms_counter_table(base, key_col)
    keys = base.distinct()
    est = cms_estimate(counters, keys, key_col)
    return est.where(F.col("est_count") >= threshold)


# ---------------------------------------------------------------------------
# Fixed-bucket histogram (quantile sketch)
# ---------------------------------------------------------------------------

def histogram_table(df: DataFrame, value_col: str, lo: float, hi: float,
                    n_buckets: int = 256,
                    group_cols: list[str] | None = None) -> DataFrame:
    """The third counter sketch: a fixed equi-width histogram over a
    KNOWN value range — with HLL (distinct) and count-min (frequency)
    this completes the operational log-metric trio, here for latency
    quantiles (the reference's `duration` lives in (0, 1)).

    State is ``<= n_buckets`` rows per group, mergeable by cell-wise
    sum (union two tables and re-aggregate), built in one partial+final
    hash aggregate. Values outside [lo, hi) clamp into the edge buckets
    (documented bias instead of unbounded state — the known-range
    requirement is what keeps this sketch trivially mergeable where
    t-digest/KLL need weighted centroid merging); NULLs are not
    counted, matching SQL aggregate semantics; NaN clamps into the TOP
    bucket, matching Spark/DuckDB's NaN-greatest double ordering (so
    the estimate diverges from exact `percentile` the same way a
    largest-value outlier would, not silently downward).

    The clamp runs on the DOUBLE scaled value BEFORE floor/cast:
    flooring an unclamped huge value (or +-inf) overflows long/int and
    under Spark's default ANSI mode kills the job instead of clamping
    (found in review). Spark's least/greatest order NaN above every
    double, which is exactly what routes NaN to the top bucket."""
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    if n_buckets < 1:
        raise ValueError(f"need n_buckets >= 1, got {n_buckets}")
    group_cols = group_cols or []
    width = (hi - lo) / n_buckets
    scaled = F.least(
        F.lit(float(n_buckets - 1)),
        F.greatest(F.lit(0.0),
                   (F.expr(value_col) - F.lit(lo)) / F.lit(width)),
    )
    bucket = F.floor(scaled).cast("int")
    return (
        df.where(F.expr(value_col).isNotNull())
        .select(*group_cols, bucket.alias("hist_bucket"))
        .groupBy(*group_cols, "hist_bucket")
        .agg(F.count(F.lit(1)).alias("bucket_count"))
    )


def histogram_merge(hist: DataFrame,
                    group_cols: list[str] | None = None) -> DataFrame:
    """Merge a union of histogram tables: cell-wise sum per group."""
    group_cols = group_cols or []
    return hist.groupBy(*group_cols, "hist_bucket").agg(
        F.sum("bucket_count").alias("bucket_count")
    )


def histogram_quantiles(hist: DataFrame, qs: list[float],
                        lo: float, hi: float, n_buckets: int = 256,
                        group_cols: list[str] | None = None) -> DataFrame:
    """Quantile estimates from a histogram table: for each q, find the
    bucket where the cumulative count crosses q * total and interpolate
    linearly inside it — error is bounded by one bucket width of the
    value range. Output: (group_cols..., q, quantile_est), one row per
    group per requested q.

    Everything stays distributed: the cumulative sum is a window over
    the <= n_buckets rows of each group's sketch, and the q probes are
    a broadcast-joined literal frame — no driver-side collection. The
    input is re-merged first, so a raw union of shard histograms (the
    natural way sketches arrive) is as valid as a merged one — without
    that, duplicate bucket rows become RANGE-frame window peers and the
    crossing test can emit conflicting rows per (group, q) (found in
    review)."""
    from pyspark.sql import Window

    if not qs:
        raise ValueError("need at least one quantile in qs")
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantiles must be in [0, 1], got {q}")
    group_cols = group_cols or []
    hist = histogram_merge(hist, group_cols)  # no-op on merged input
    width = (hi - lo) / n_buckets
    w = Window.partitionBy(*[F.col(c) for c in group_cols]) \
        .orderBy("hist_bucket")
    cum = (
        hist.withColumn("cum", F.sum("bucket_count").over(w))
        .withColumn("total", F.sum("bucket_count").over(
            Window.partitionBy(*[F.col(c) for c in group_cols])))
    )
    probes = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    # rank = the target cumulative mass for q (at least 1 so q=0 lands
    # in the first occupied bucket)
    joined = cum.select("*", probes).withColumn(
        "rank", F.greatest(F.lit(1.0), F.col("q") * F.col("total")))
    hit = joined.where(
        (F.col("cum") >= F.col("rank"))
        & (F.col("cum") - F.col("bucket_count") < F.col("rank"))
    )
    frac = (F.col("rank") - (F.col("cum") - F.col("bucket_count"))) \
        / F.col("bucket_count")
    est = F.lit(lo) + (F.col("hist_bucket") + frac) * F.lit(width)
    return hit.select(*group_cols, "q", est.alias("quantile_est")) \
        .orderBy(*group_cols, "q")
