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


def with_lsh_bucket(df: DataFrame, dim: int = 64, n_planes: int = 4,
                    vec_col: str = "embedding") -> DataFrame:
    """Sign-LSH bucket id from deterministic integer hyperplanes
    (w[j][i] = ((i*(j+3)+11) % 17) - 8) — same formula as the oracle SQL."""
    return df.withColumn(
        "lsh_bucket", _e(x.lsh_bucket(vec_col, dim, n_planes, x.SPARK))
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
