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


def mixed_key(key_col: str, salt: str = "", d: str = x.SPARK) -> str:
    """The sampling hash in [0, P): avalanche mix of polyhash over a
    marked key, folded back mod P — shared by every sampler here so the
    draw semantics live in ONE place.

    - The ``'v' ||`` marker keeps the empty string off hash 0
      (mix(polyhash('')) = 0, which every nonzero threshold would keep —
      a 100%-sampled stratum of empty keys, observed in review).
    - NULL keys hash as the distinct marker ``'n'`` BEFORE the concat
      (Spark concat null-propagates while DuckDB's skips null arguments
      — inlining null into concat diverged across engines).
    - ``salt`` is escaped per dialect (apostrophes broke the predicate)
      and gives independent draws over the same keys.
    - The final ``% P`` folds the mix's small over-P spill ([P, P+2^14),
      the last xor step) back into the threshold domain, so
      fraction 1.0 keeps EVERY row; the fold double-weights ~1.3e-5 of
      the space — far below any sampling tolerance."""
    keyed = (f"(case when {key_col} is null then 'n' "
             f"else 'v' || {key_col} end)")
    if salt:
        keyed = f"concat({keyed}, {x.lit_str(salt, d)})"
    return f"({x.hll_mix(x.polyhash(keyed, d), d)} % {x.P})"


def sample_predicate(key_col: str, fraction: float, salt: str = "",
                     d: str = x.SPARK) -> str:
    """SQL predicate: keep iff :func:`mixed_key` < fraction * P. The
    threshold is computed in Python (int(fraction * P)) so both engines
    compare against the same exact integer."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return f"({mixed_key(key_col, salt, d)} < {int(fraction * x.P)})"


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
    arms = " ".join(
        f"when {x.lit_str(s, x.SPARK)} then {int(f * x.P)}"
        for s, f in sorted(fractions.items())
    )
    thresh = (f"(case {stratum_col} {arms} "
              f"else {int(default_fraction * x.P)} end)")
    return df.where(F.expr(f"{mixed_key(key_col, salt)} < {thresh}"))


def top_k_by_hash(df: DataFrame, group_cols: list[str], key_col: str,
                  k: int, salt: str = "") -> DataFrame:
    """Exactly-k-per-group deterministic subset: rank rows inside each
    group by their mixed hash (ties broken by the key, then by an
    xxhash64 over the row's hashable columns so duplicate keys still
    rank deterministically — only rows identical in every hashable
    column tie, where the choice is immaterial) and keep the k smallest
    — a fixed-size quota per group where a fraction would over/under-
    shoot small groups. One hash-partition shuffle on the group key; the
    window never holds more than a partition's rows.

    Map-typed columns are excluded from the tiebreak (xxhash64 rejects
    MAP anywhere in a type — Spark's map equality is undefined, so maps
    cannot break ties deterministically anyway); rows differing ONLY in
    map columns therefore still tie arbitrarily.

    ``key_col`` accepts any SQL expression (e.g. ``"upper(k)"``), same
    as :func:`mixed_key` and the sibling samplers — both the hash and
    the tiebreak parse it with ``F.expr``."""
    from pyspark.sql import Window
    from pyspark.sql.types import ArrayType, DataType, MapType, StructType

    def _mappy(t: DataType) -> bool:
        if isinstance(t, MapType):
            return True
        if isinstance(t, ArrayType):
            return _mappy(t.elementType)
        if isinstance(t, StructType):
            return any(_mappy(f.dataType) for f in t.fields)
        return False

    hashable = [f.name for f in df.schema.fields if not _mappy(f.dataType)]
    order = [F.expr(mixed_key(key_col, salt)).asc(), F.expr(key_col).asc()]
    if hashable:
        order.append(F.xxhash64(*[F.col(c) for c in hashable]).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("_hrank", F.row_number().over(w))
        .where(F.col("_hrank") <= k)
        .drop("_hrank")
    )
