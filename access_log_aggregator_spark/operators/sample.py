"""Deterministic hash-threshold sampling (Bernoulli, stratified, per-group).

Training-data pipelines sample constantly — eval splits, ablation
subsets, per-domain quotas — and at 100 TB the sample must be (a)
reproducible across reruns and Spark versions, (b) independent of
partitioning and row order, and (c) coordination-free (a pure map-side
filter, no global pass). ``rand(seed)``-based sampling fails (a)+(b):
Spark seeds per-partition, so a repartition reshuffles the sample.
Hash-threshold sampling keys the decision on the ROW (keep iff
avalanche-mixed hash(key || salt) < fraction * P), which also gives two
properties rand() cannot:

- **nested**: sample(f1) is a subset of sample(f2) whenever f1 <= f2
  (same salt) — growing an eval set never discards collected labels;
- **union-stable**: sample(A union B) == sample(A) union sample(B) —
  per-day samples concatenate into exactly the all-time sample.

The hash is the sketch family's avalanche mix (functions/xsql.py:
polyhash alone is structured on short keys), and the formulas are
dual-dialect, so the DuckDB twin selects the identical rows
(tests/test_sample.py runs both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import xsql as x


def sample_predicate(key_col: str, fraction: float, salt: str = "",
                     d: str = x.SPARK) -> str:
    """SQL predicate: keep iff mix(polyhash(key || salt)) < fraction * P.

    The threshold is computed in Python (int(fraction * P)) so both
    engines compare against the same exact integer; ``salt`` gives
    independent draws over the same keys (different salts -> different,
    uncorrelated samples)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    keyed = (f"concat({key_col}, '{salt}')" if salt else key_col)
    mixed = x.hll_mix(x.polyhash(keyed, d), d)
    return f"({mixed} < {int(fraction * x.P)})"


def hash_sample(df: DataFrame, key_col: str, fraction: float,
                salt: str = "") -> DataFrame:
    """Deterministic Bernoulli sample: a pure map-side filter (no
    shuffle, no state, plan-tested), reproducible under any
    partitioning."""
    return df.where(F.expr(sample_predicate(key_col, fraction, salt)))


def stratified_hash_sample(df: DataFrame, stratum_col: str, key_col: str,
                           fractions: dict[str, float], salt: str = "",
                           default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum fractions (e.g. per-language quotas): one CASE over
    the stratum column picks the threshold; still a single map-side
    filter. Strata missing from ``fractions`` keep ``default_fraction``
    of their rows."""
    for f in [*fractions.values(), default_fraction]:
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction must be in [0, 1], got {f}")
    keyed = (f"concat({key_col}, '{salt}')" if salt else key_col)
    mixed = x.hll_mix(x.polyhash(keyed, x.SPARK), x.SPARK)
    arms = " ".join(
        f"when '{s}' then {int(f * x.P)}" for s, f in sorted(fractions.items())
    )
    thresh = (f"(case {stratum_col} {arms} "
              f"else {int(default_fraction * x.P)} end)")
    return df.where(F.expr(f"{mixed} < {thresh}"))


def top_k_by_hash(df: DataFrame, group_cols: list[str], key_col: str,
                  k: int, salt: str = "") -> DataFrame:
    """Exactly-k-per-group deterministic subset: rank rows inside each
    group by their mixed hash (ties broken by the key itself) and keep
    the k smallest — a fixed-size quota per group where a fraction would
    over/under-shoot small groups. One hash-partition shuffle on the
    group key; the window never holds more than a partition's rows."""
    from pyspark.sql import Window

    mixed = x.hll_mix(x.polyhash(key_col, x.SPARK) if not salt else
                      x.polyhash(f"concat({key_col}, '{salt}')", x.SPARK),
                      x.SPARK)
    w = Window.partitionBy(*group_cols).orderBy(
        F.expr(mixed).asc(), F.col(key_col).asc())
    return (
        df.withColumn("_hrank", F.row_number().over(w))
        .where(F.col("_hrank") <= k)
        .drop("_hrank")
    )
