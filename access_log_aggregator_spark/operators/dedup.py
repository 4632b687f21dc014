"""Deduplication operators (exact, MinHash+LSH, SimHash, n-gram Jaccard).

DataFrame-API surface over the same canonical formulas as the SQL registry
(functions/xsql.py SPARK dialect), so results are identical to the
DuckDB-oracled queries. Scale notes per operator:

- exact: one hash-groupBy shuffle on md5(text) — the cheapest possible
  exact dedup; at 100 TB bucket/partition the table by the hash prefix.
- minhash_lsh: signatures are embarrassingly parallel (no shuffle); the
  band join shuffles only (doc_id, band) pairs — tiny rows — and AQE
  handles banding skew (hot bands from boilerplate-heavy corpora).
- simhash: same shape; near-pair join is a self-equi-join on simhash
  prefix buckets at scale (here: direct hamming filter for exactness).
- ngram_jaccard: the shingle inverted-index join explodes |doc|·|grams|
  rows; at scale, cap per-gram document frequency (drop stop-shingles)
  before the self-join — the df_cap parameter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import xsql as x
from .materialize import Materializer, pin


def _e(sql: str) -> Column:
    return F.expr(sql)


def exact_dedup_keep_first(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per exact text (hash groupBy + semi join)."""
    keep = df.groupBy(F.md5(F.col(text_col)).alias("_h")).agg(
        F.min(id_col).alias(id_col)
    )
    return df.join(keep.select(id_col), on=id_col, how="left_semi")


def with_minhash(df: DataFrame, text_col: str = "text",
                 engine: str = "arrow") -> DataFrame:
    """Append mh0..mh{K-1} minhash signature columns (no shuffle).

    ``engine="arrow"`` (default) computes the canonical values with the
    numpy-vectorized pandas UDF (functions/minhash_arrow.py) — 3x faster
    than the Catalyst formulation because higher-order array lambdas are
    evaluated interpreted, outside whole-stage codegen.

    ``engine="catalyst"`` keeps the pure-expression plan (xsql: distinct
    5-char shingles -> polyhash -> K affine mins, computed via a faster
    equivalent single-aggregate struct fold):

    - shingle hash = weighted char-code sum mod P (congruent to the
      stepwise ``(acc*31+c) % P`` fold — intermediates stay < 2^63);
    - no ``distinct``: duplicate shingles can never change a minimum;
    - one aggregate pass carries all K minima in a struct accumulator
      instead of K transform+array_min passes over K temporary arrays.

    Both paths emit identical values (arrow == catalyst == DuckDB oracle,
    pinned by tests/test_training_ops.py).
    """
    k = len(x.MINHASH_COEFFS)
    if engine == "arrow":
        from ..functions.minhash_arrow import minhash_signature

        out = df.withColumn("_sig", minhash_signature(text_col))
        for i in range(k):
            out = out.withColumn(f"mh{i}", F.col("_sig").getItem(i))
        return out.drop("_sig")
    codes, hs, agg = x.minhash_fast_spark(text_col)
    out = (
        df.withColumn("_codes", _e(codes))
        .withColumn("_hs", _e(hs))
        .withColumn("_mh", _e(agg))
    )
    for i in range(k):
        # canonical array_min over an empty shingle set is NULL
        out = out.withColumn(
            f"mh{i}",
            F.when(F.size("_hs") > 0, F.col("_mh").getField(f"m{i}")),
        )
    return out.drop("_codes", "_hs", "_mh")


def _minhash_band_frame(sig: DataFrame, id_col: str,
                        materializer: Materializer | None = None) -> DataFrame:
    """(id, band_no, band_val) rows from a signature frame — one inline
    pass, pinned via the materializer seam (see minhash_lsh_candidates
    docstring and operators/materialize.py for the durable alternative)."""
    band_structs = ", ".join(
        f"named_struct('band_no', {b}, "
        f"'band_val', (mh{2 * b} * 31 + mh{2 * b + 1}) % {x.P})"
        for b in range(4)
    )
    return pin(
        sig.select(F.col(id_col), F.expr(f"inline(array({band_structs}))")),
        "minhash_bands", materializer,
    )


def minhash_jaccard_estimates(df: DataFrame, id_col: str = "doc_id",
                              text_col: str = "text",
                              materializer: Materializer | None = None) -> DataFrame:
    """Signature-based Jaccard ESTIMATE for every LSH candidate pair: the
    fraction of the K minhash functions on which the two docs agree — the
    classic estimator (E[match] = true Jaccard), computed WITHOUT touching
    the original texts again. The signature frame is checkpointed once and
    reused for both the banding join and the per-pair comparison, so the
    plan reads signatures, never documents, after the first pass — exactly
    the 100 TB shape (signatures table ~1% of the corpus bytes).
    """
    k = len(x.MINHASH_COEFFS)
    sig = pin(with_minhash(df.select(id_col, text_col), text_col)
              .drop(text_col), "minhash_signatures", materializer)
    bands = _minhash_band_frame(sig, id_col, materializer)
    a, b_ = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(b_, (F.col("a.band_no") == F.col("b.band_no"))
               & (F.col("a.band_val") == F.col("b.band_val"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("doc_a"),
                F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )
    sa = sig.select(F.col(id_col).alias("doc_a"),
                    *[F.col(f"mh{i}").alias(f"a{i}") for i in range(k)])
    sb = sig.select(F.col(id_col).alias("doc_b"),
                    *[F.col(f"mh{i}").alias(f"b{i}") for i in range(k)])
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(k)
    ).cast("long")
    return (
        cands.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", matches.alias("matches"),
                (matches.cast("double") / k).alias("jaccard_est"))
    )


def minhash_lsh_candidates(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text",
                           materializer: Materializer | None = None) -> DataFrame:
    """Candidate near-dup pairs sharing at least one LSH band (4 bands x 2).

    The band rows are tiny (id, band_no, band_val) but their plan subtree —
    the full signature computation — would otherwise be re-evaluated once
    per band projection per self-join side (Catalyst inlines the shared
    subquery: 4 x 2 recomputations). ``localCheckpoint`` makes the banding
    a materialization point WITHOUT the CacheManager leak of ``persist()``
    (checkpoint RDD storage is freed by the ContextCleaner once the frame
    is garbage collected; cached plans accumulate until unpersist). The
    100 TB shape is the same idea made durable — write the signature table
    once, band-join the narrow table — and is CODE, not prose: pass
    ``materializer=TableMaterializer(dfs_dir)`` (or scope it with
    ``using_materializer``) to pin via a SnapshotTable write+read that
    survives executor loss (operators/materialize.py; equality with the
    localCheckpoint path is pinned by tests/test_materializer.py).
    """
    sig = with_minhash(df.select(id_col, text_col), text_col)
    # one pass over sig: explode the 4 band values instead of 4 projections
    bands = _minhash_band_frame(sig, id_col, materializer)
    a, b_ = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b_,
            (F.col(f"a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def with_simhash(df: DataFrame, text_col: str = "text",
                 engine: str = "arrow") -> DataFrame:
    """Append a SIMHASH_BITS-bit simhash column over token hashes.

    ``engine="arrow"`` (default) uses the numpy-vectorized twin
    (functions/simhash_arrow.py); ``engine="catalyst"`` keeps the pure
    expression plan. Identical values, pinned by the triangle tests."""
    if engine == "arrow":
        from ..functions.simhash_arrow import simhash

        return df.withColumn("simhash", simhash(text_col))
    th = x.transform(x.tokens(text_col, x.SPARK), "t", x.polyhash("t", x.SPARK), x.SPARK)
    return df.withColumn("_th", _e(th)).withColumn(
        "simhash", _e(x.simhash_expr("_th", x.SPARK))
    ).drop("_th")


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", max_hamming: int = 3,
                       blocked: bool = True,
                       materializer: Materializer | None = None) -> DataFrame:
    """Pairs within ``max_hamming`` simhash bits, EXACT under both plans.

    ``blocked`` (the scale path) splits the simhash into ``max_hamming + 1``
    bit-bands: two hashes within hamming distance h differ in at most h
    bands, so by pigeonhole they AGREE on at least one band — a banded
    equi-join finds every qualifying pair, and the exact hamming filter
    removes band-collision false positives. The self-join shuffles only
    (band, id, simhash) rows instead of planning an O(n^2) nested loop;
    the band frame is localCheckpoint-ed so the signature subtree runs once.
    ``blocked=False`` keeps the brute-force nested-loop formulation (the
    equivalence of the two is a test).
    """
    s = with_simhash(df.select(id_col, text_col), text_col).select(id_col, "simhash")
    if not blocked:
        a, b = s.alias("a"), s.alias("b")
        ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
        return (
            a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .where(ham <= max_hamming)
            .select(F.col(f"a.{id_col}").alias("doc_a"),
                    F.col(f"b.{id_col}").alias("doc_b"),
                    ham.alias("hamming"))
        )
    n_bands = max_hamming + 1
    if x.SIMHASH_BITS % n_bands:
        raise ValueError(f"SIMHASH_BITS={x.SIMHASH_BITS} not divisible by {n_bands}")
    width = x.SIMHASH_BITS // n_bands
    # mask (not %) so the top band of a negative int64 simhash stays exact:
    # arithmetic shiftright + low-bit mask == logical shift for width <= 48
    band_structs = ", ".join(
        f"named_struct('band_no', {b}, "
        f"'band_val', (shiftright(simhash, {b * width}) & {(1 << width) - 1}))"
        for b in range(n_bands)
    )
    bands = pin(
        s.select(F.col(id_col), F.col("simhash"),
                 F.expr(f"inline(array({band_structs}))")),
        "simhash_bands", materializer,
    )
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, (F.col("a.band_no") == F.col("b.band_no"))
               & (F.col("a.band_val") == F.col("b.band_val"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .where(ham <= max_hamming)
        .select(F.col(f"a.{id_col}").alias("doc_a"),
                F.col(f"b.{id_col}").alias("doc_b"),
                ham.alias("hamming"))
        .distinct()
    )


#: default multi-band OR construction: 12 bands x 8 planes. At cosine 0.9
#: (the near-DUP regime the blocker exists for) per-plane collision
#: probability is 1 - acos(0.9)/pi ~ 0.856, so band recall is 0.856^8 ~ 0.29
#: and 12-band recall 1-(1-0.29)^12 ~ 0.98 — while random pairs (cos ~ 0)
#: collide in a band with probability 0.5^8 ~ 0.004, i.e. ~5% of all pairs
#: become candidates. Measured-recall test: test_embedding_lsh_recall.
EMB_LSH_BANDS = 12
EMB_LSH_PLANES_PER_BAND = 8


def embedding_near_dup_pairs(df: DataFrame, id_col: str = "vec_id",
                             vec_col: str = "embedding", dim: int = 64,
                             threshold: float = 0.35,
                             n_bands: int = EMB_LSH_BANDS,
                             planes_per_band: int = EMB_LSH_PLANES_PER_BAND,
                             materializer: Materializer | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, multi-band sign-LSH blocked.

    Each band hashes the vector with its own disjoint set of
    ``planes_per_band`` hyperplanes (xsql.lsh_bucket with a plane offset);
    a pair is a candidate iff it agrees on AT LEAST ONE band — the OR
    construction whose recall is tunable via (n_bands, planes_per_band),
    unlike a single-bucket scheme that silently loses recall. The self-join
    shuffles ONLY narrow (band_no, band_val, id) rows — the vector itself
    never rides through the n_bands-way band explosion; after the candidate
    pairs are deduplicated, BOTH id sides join back to a checkpointed
    (id, vector) frame for the cosine filter, so each vector crosses a
    shuffle once per side instead of n_bands times, and the cosine is
    computed once per distinct pair instead of once per agreeing band.
    Equi-joins throughout (AQE splits skewed buckets), never the O(n^2)
    cross product. Cosine uses the bit-identical double-fold recipe, so the
    DuckDB oracle (same bands, same formula, same narrow-pairs shape)
    matches exactly. At 100 TB: write the band table once (localCheckpoint
    pins both narrow frames so Catalyst doesn't recompute the 96-plane
    projection per join side), and raise planes_per_band to keep per-bucket
    candidate counts bounded.
    """
    band_structs = ", ".join(
        "named_struct('band_no', {b}, 'band_val', {bucket})".format(
            b=b, bucket=x.lsh_bucket(vec_col, dim, planes_per_band, x.SPARK,
                                     plane_offset=b * planes_per_band))
        for b in range(n_bands)
    )
    vecs = pin(df.select(id_col, vec_col), "embedding_vectors", materializer)
    bands = pin(
        df.select(F.col(id_col), F.expr(f"inline(array({band_structs}))")),
        "embedding_bands", materializer,
    )
    a, c = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(c, (F.col("a.band_no") == F.col("b.band_no"))
               & (F.col("a.band_val") == F.col("b.band_val"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("vec_a"),
                F.col(f"b.{id_col}").alias("vec_b"))
        .distinct()
    )
    va, vb = vecs.alias("va"), vecs.alias("vb")
    cos = _e(x.cosine_double(f"va.{vec_col}", f"vb.{vec_col}", dim, x.SPARK))
    return (
        pairs.join(va, F.col("vec_a") == F.col(f"va.{id_col}"))
        .join(vb, F.col("vec_b") == F.col(f"vb.{id_col}"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.2,
                        df_cap: int | None = None) -> DataFrame:
    """Jaccard similarity over word n-gram sets via a shingle inverted index.

    ``df_cap`` drops shingles appearing in more than that many docs before
    the self-join (the stop-shingle guard that keeps the join bounded at
    corpus scale); None keeps exact semantics.
    """
    toks = x.tokens(text_col, x.SPARK)
    grams_expr = x.arr_distinct(x.word_ngrams(toks, n, x.SPARK), x.SPARK)
    g = df.select(id_col, _e(grams_expr).alias("grams"))
    sz = g.select(id_col, F.size("grams").alias("n"))
    e = g.select(id_col, F.explode("grams").alias("gram"))
    if df_cap is not None:
        rare = e.groupBy("gram").count().where(F.col("count") <= df_cap).select("gram")
        e = e.join(F.broadcast(rare), "gram")
    a, b = e.alias("a"), e.alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sz.withColumnRenamed(id_col, "doc_a").withColumnRenamed("n", "na")
    sb = sz.withColumnRenamed(id_col, "doc_b").withColumnRenamed("n", "nb")
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    ).cast("double")
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )
