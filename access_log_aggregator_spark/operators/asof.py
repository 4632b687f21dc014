"""As-of (most-recent-at-or-before) join — an operator Spark lacks natively.

Implemented as a composition of built-in DataFrame ops (the task brief's
preferred route for missing operators): tag and union both sides, then one
``last(..., ignorenulls=True)`` window per key ordered by (ts, side) carries
the latest right-side payload forward onto every left row. Right rows sort
before left rows at equal timestamps, so a right row AT the left row's
timestamp matches (the ``l.ts >= r.ts`` convention, same as DuckDB's
ASOF JOIN, which serves as the oracle).

Scale shape: ONE hash shuffle on the key (the window partition) — the same
cost as any equi-join — and the window is a single forward pass per
partition; no range explosion, no nested loop. Skewed keys are ordinary
window-partition skew: pre-split hot keys or bound partitions upstream.

Determinism: callers must ensure at most one right row per (key, ts) —
dedupe first (e.g. groupBy(key, ts).agg(max(...))) — otherwise which
same-timestamp row wins is tie-dependent in ANY engine's as-of semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str = "ts", right_ts: str = "ts") -> DataFrame:
    """Left as-of join: every ``left`` row + the ``right`` row with the
    greatest ``right_ts`` <= ``left_ts`` for the same ``on`` key (null
    payload when no match exists yet). The right side's non-key columns —
    including its timestamp — keep their names in the output, so
    ``right_ts`` must not collide with a left column name.
    """
    payload_cols = [c for c in right.columns if c not in on]  # incl. right_ts
    overlap = set(payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"right payload columns collide with left: {overlap}")
    internal = {"_asof_ts", "_side", "_payload", "_match"}
    taken = internal & (set(left.columns) | set(right.columns))
    if taken:
        raise ValueError(
            f"columns {taken} collide with asof_join internals — rename them"
        )

    # A NULL right timestamp can never be the most-recent-at-or-before
    # match (SQL comparison with NULL is unknown — DuckDB's ASOF emits no
    # match), but Spark's asc ordering is NULLS FIRST: an unfiltered null
    # _asof_ts row would sit at the partition head and its payload would be
    # carried onto EVERY left row. Drop such rows up front. (A null LEFT
    # timestamp needs no special case: with right nulls gone it sorts at
    # the head, sees no preceding payload, and correctly emits null.)
    r = right.where(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_payload"),
        *[F.lit(None).cast(t).alias(c)
          for c, t in left.dtypes if c not in on],
    )
    l = left.select(
        *left.columns,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
    )
    u = l.unionByName(r.select(l.columns))
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_asof_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
    return matched.where(F.col("_side") == 1).select(
        *left.columns,
        *[F.col("_match").getField(c).alias(c) for c in payload_cols],
    )
