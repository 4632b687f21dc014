"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline; sign-random-projection
LSH bucketing is the scale path (probe only same-bucket candidates). All
math uses the bit-exact double-fold recipe (functions/xsql.py) so results
match the DuckDB oracles exactly.

Scale notes: brute-force against ONE query is a broadcast-free single pass
(the query vector is a literal in the plan); batch-query top-k at 100 TB is
a crossJoin pruned by LSH bucket equality — bucket assignment is
embarrassingly parallel, the candidate join shuffles only (bucket, id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import xsql as x


def _e(sql: str) -> Column:
    return F.expr(sql)


def cosine_to(df: DataFrame, query_df: DataFrame, dim: int = 64,
              vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """cosine(row, query) for every row; query_df is a 1-row frame."""
    q = query_df.select(F.col(vec_col).alias("_qvec"))
    joined = df.crossJoin(F.broadcast(q))
    cos = x.cosine_double(vec_col, "_qvec", dim, x.SPARK)
    return joined.select(id_col, _e(cos).alias("cosine"))


def topk_cosine(df: DataFrame, query_df: DataFrame, k: int = 10, dim: int = 64,
                vec_col: str = "embedding", id_col: str = "vec_id",
                exclude_id=None) -> DataFrame:
    out = cosine_to(df, query_df, dim, vec_col, id_col)
    if exclude_id is not None:
        out = out.where(F.col(id_col) != exclude_id)
    return out.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def with_lsh_bucket(df: DataFrame, dim: int = 64, n_planes: int = 12,
                    vec_col: str = "embedding") -> DataFrame:
    """Sign-LSH bucket id from deterministic hyperplanes
    (xsql.lsh_plane_consts family) — same formula as the oracle SQL. The
    12-plane default gives 4096 buckets, a partition of the space that does
    not degenerate into O(n^2/16) self-joins at corpus scale."""
    return df.withColumn(
        "lsh_bucket", _e(x.lsh_bucket(vec_col, dim, n_planes, x.SPARK))
    )


def ivf_assign(df: DataFrame, n_cells: int = 8, dim: int = 64,
               vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest centroid
    with ZERO exchanges — a pure map-side argmax.

    Centroids are the embeddings of the ``n_cells`` lowest-id vectors — a
    deterministic, data-dependent coarse codebook (a k-means codebook drops
    in unchanged; assignment logic is what matters here). The codebook is
    collected to the driver (bounded: n_cells rows, exactly like a trained
    k-means model artifact) and inlined as a literal struct array, so each
    row computes its n_cells cosines and takes the argmax inside one
    whole-stage-codegen projection — no crossJoin row duplication, no
    window shuffle, nothing exchanged (tested: count("Exchange") == 0).
    Ties break to the lowest cell id via a sequential strict-> fold over
    cells in ascending order (same rule as the DuckDB oracle's
    row_number over cosine desc, cell asc).
    """
    cents = (
        df.select(F.col(id_col).alias("cell"), F.col(vec_col).alias("cv"))
        .orderBy("cell")
        .limit(n_cells)
        .collect()
    )
    cent_structs = ", ".join(
        "named_struct('cell', {c}L, 'cv', array({vs}))".format(
            c=int(r["cell"]),
            vs=", ".join(repr(float(v)) + "D" for v in r["cv"]),
        )
        for r in cents
    )
    # cosine per centroid with the exact dot_double recipe: per-element
    # double cast + sequential index-order fold (bit-identical to DuckDB)
    dot = ("aggregate(zip_with(cast({v} as array<double>), c.cv, "
           "(x, y) -> x * y), 0D, (acc, p) -> acc + p)").format(v=vec_col)
    nrm_v = ("sqrt(aggregate(zip_with(cast({v} as array<double>), "
             "cast({v} as array<double>), (x, y) -> x * y), 0D, "
             "(acc, p) -> acc + p))").format(v=vec_col)
    nrm_c = ("sqrt(aggregate(zip_with(c.cv, c.cv, (x, y) -> x * y), 0D, "
             "(acc, p) -> acc + p))")
    scored = (
        f"transform(array({cent_structs}), c -> named_struct("
        f"'cos', ({dot} / ({nrm_v} * {nrm_c})), 'cell', c.cell))"
    )
    best = (
        f"aggregate({scored}, "
        f"named_struct('cos', cast(-2.0 as double), 'cell', cast(-1 as bigint)), "
        f"(acc, s) -> if(s.cos > acc.cos, s, acc))"
    )
    return df.withColumn("cell", _e(best + ".cell"))


def ivf_topk_cosine(df: DataFrame, query_df: DataFrame, k: int = 10,
                    n_cells: int = 8, nprobe: int = 2, dim: int = 64,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    exclude_id=None) -> DataFrame:
    """Approximate top-k: score only vectors in the query's ``nprobe``
    closest cells (the IVF scale path — at 100 TB the assigned table is
    written partitioned by cell, so probing is partition pruning, not a
    scan)."""
    assigned = ivf_assign(df, n_cells, dim, vec_col, id_col)
    cents = (
        df.select(F.col(id_col).alias("cell"), F.col(vec_col).alias("_cvec"))
        .orderBy("cell")
        .limit(n_cells)
    )
    qcos = x.cosine_double(vec_col, "_cvec", dim, x.SPARK)
    probe = (
        query_df.crossJoin(F.broadcast(cents))
        .select(F.col("cell"), _e(qcos).alias("_qc"))
        .orderBy(F.col("_qc").desc(), F.col("cell").asc())
        .limit(nprobe)
        .select("cell")
    )
    q = query_df.select(F.col(vec_col).alias("_qvec"))
    cand = assigned.join(F.broadcast(probe), "cell").crossJoin(F.broadcast(q))
    if exclude_id is not None:
        cand = cand.where(F.col(id_col) != exclude_id)
    cos = x.cosine_double(vec_col, "_qvec", dim, x.SPARK)
    return (
        cand.select(id_col, "cell", _e(cos).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def lsh_topk_cosine(df: DataFrame, query_df: DataFrame, k: int = 10, dim: int = 64,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: only candidates in the query's LSH bucket are scored."""
    b = with_lsh_bucket(df, dim, vec_col=vec_col)
    qb = with_lsh_bucket(query_df, dim, vec_col=vec_col).select(
        F.col("lsh_bucket").alias("_qbucket"), F.col(vec_col).alias("_qvec")
    )
    cand = b.crossJoin(F.broadcast(qb)).where(F.col("lsh_bucket") == F.col("_qbucket"))
    cos = x.cosine_double(vec_col, "_qvec", dim, x.SPARK)
    return (
        cand.select(id_col, "lsh_bucket", _e(cos).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )
