"""DataFrame-API training-data operators == their SQL-registry twins.

The SQL registry (queries.py) is oracle-checked against DuckDB; these tests
close the triangle by asserting the DataFrame-API operators produce the
same results as the SQL formulations.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from access_log_aggregator_spark.operators import dedup, similarity, text
from access_log_aggregator_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _same(a, b):
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_minhash_matches_sql(spark, docs):
    """arrow UDF == catalyst higher-order-function SQL formulation (the
    DuckDB leg of the triangle is the driver's oracle check)."""
    from access_log_aggregator_spark.functions import xsql as x
    from access_log_aggregator_spark.queries import _minhash_build, load_views

    api = dedup.with_minhash(docs.select("doc_id", "text")).drop("text")
    load_views(spark, SF)
    sql = spark.sql(_minhash_build(x.SPARK))
    _same(api.select(sql.columns), sql)


def test_fingerprint_arrow_edge_vectors(spark):
    """arrow fingerprint/token UDF == catalyst expressions on the nasty
    cases: NULL (canonical fingerprint 0, n_tokens NULL), empty, spaces
    only, tab-led (Spark trim strips ONLY spaces), trailing separators
    (Java split limit -1 keeps trailing empties), \\x0B (token char under
    the explicit class), astral unicode, and a >CHUNK-length text (chunked
    mod reduction)."""
    from access_log_aggregator_spark.functions import xsql as x
    from access_log_aggregator_spark.functions.fingerprint_arrow import (
        fingerprint_tokens,
    )

    rows = [(0, None), (1, ""), (2, "   "), (3, "\ta b\t"), (4, "a b "),
            (5, "a\x0bb c"), (6, "a\U0001F600b cd"), (7, "word " * 3000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    arrow = (
        df.select("doc_id", fingerprint_tokens("text").alias("_ft"))
        .select("doc_id", F.col("_ft.fingerprint").alias("fingerprint"),
                F.col("_ft.n_tokens").alias("n_tokens"))
    )
    catalyst = df.selectExpr(
        "doc_id",
        f"{x.polyhash('text', x.SPARK)} as fingerprint",
        f"{x.arr_size(x.tokens('text', x.SPARK), x.SPARK)} as n_tokens",
    )
    _same(arrow, catalyst)


def test_minhash_arrow_edge_vectors(spark):
    """NULL / empty / sub-shingle / exactly-5 / astral-unicode texts:
    arrow and catalyst paths agree code-point-exactly."""
    rows = [(0, None), (1, ""), (2, "abcd"), (3, "abcde"),
            (4, "a\U0001F600bcdéf"), (5, "hello world hello")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = dedup.with_minhash(df, engine="arrow").drop("text")
    c = dedup.with_minhash(df, engine="catalyst").drop("text")
    _same(a, c)
    got = {r["doc_id"]: r["mh0"] for r in a.collect()}
    assert got[0] is None and got[1] is None and got[2] is None
    assert got[3] is not None and got[4] is not None


def test_lsh_pairs_match_sql(spark, docs):
    api = dedup.minhash_lsh_candidates(docs)
    sql = QUERIES["dedup_minhash_lsh_pairs"].spark_fn(spark, SF)
    _same(api, sql.select(api.columns))


def test_minhash_jaccard_est_matches_sql(spark, docs):
    api = dedup.minhash_jaccard_estimates(docs).orderBy("doc_a", "doc_b")
    sql = QUERIES["dedup_minhash_lsh_pairs"].spark_fn(spark, SF)
    _same(api, sql)
    # the estimator is exact 1.0 for identical texts: every exact-dup pair
    # that survives banding must estimate 1.0
    rows = api.collect()
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    for r in rows:
        if texts[r["doc_a"]] == texts[r["doc_b"]]:
            assert r["jaccard_est"] == 1.0, (r["doc_a"], r["doc_b"])


def test_simhash_matches_sql(spark, docs):
    """arrow simhash UDF == catalyst higher-order-function formulation."""
    from access_log_aggregator_spark.functions import xsql as x
    from access_log_aggregator_spark.queries import _simhash_build, load_views

    api = dedup.with_simhash(docs.select("doc_id", "text")).select("doc_id", "simhash")
    load_views(spark, SF)
    _same(api, spark.sql(_simhash_build(x.SPARK)))


def test_simhash_arrow_edge_vectors(spark):
    """NULL / empty / tab-led / \\x0B / astral / huge-single-token texts:
    arrow and catalyst simhash agree exactly (incl. the int64 sign bit
    and empty-token hash-0 lanes)."""
    rows = [(0, None), (1, ""), (2, "   "), (3, "\ta b\t"),
            (4, "a\x0bb c"), (5, "x\U0001F600y z"), (6, "q" * 5000 + " w"),
            (7, "the quick brown fox " * 40),
            # trailing separator after a >= 2-char token: the trailing empty
            # token's reduceat segment must not truncate the LAST REAL
            # token's hash (regression — the old start-clipping dropped
            # 'world's final char and diverged from canonical on every
            # newline-terminated document)
            (8, "hello world\n"), (9, "ab\t"), (10, "ab \n"),
            (11, "hello world\r\n"), (12, "\nab"), (13, "a\n")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = dedup.with_simhash(df, engine="arrow").select("doc_id", "simhash")
    c = dedup.with_simhash(df, engine="catalyst").select("doc_id", "simhash")
    _same(a, c)


def test_jaccard_matches_sql(spark, docs):
    api = dedup.ngram_jaccard_pairs(docs)
    sql = QUERIES["dedup_ngram_jaccard_pairs"].spark_fn(spark, SF)
    _same(api.select(sql.columns), sql)


def test_minhash_fast_path_edge_cases(spark):
    """The fast single-pass minhash == the canonical formulation on
    adversarial strings: empty, shorter than the shingle width, exactly the
    width, repeated shingles, multi-byte chars, embedded control chars."""
    from access_log_aggregator_spark.functions import xsql as x

    cases = ["", "a", "abcd", "abcde", "aaaaaaaaaa", "héllo wörld",
             "tab\there\nand\x01ctrl", "ααααα βββββ", "abcde" * 50]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id long, text string"
    )
    fast = dedup.with_minhash(df).orderBy("doc_id")
    df.createOrReplaceTempView("_mh_edge")
    # canonical formulation, evaluated by Spark itself
    sh = x.char_shingles("text", 5, x.SPARK)
    hs = x.transform(x.arr_distinct(sh, x.SPARK), "s", x.polyhash("s", x.SPARK), x.SPARK)
    cols = ", ".join(
        f"{e} as mh{i}" for i, e in enumerate(x.minhash_exprs("hs", x.SPARK))
    )
    canon = spark.sql(
        f"with t as (select doc_id, {hs} as hs from _mh_edge) "
        f"select doc_id, {cols} from t order by doc_id"
    )
    assert [r.asDict() for r in fast.select(canon.columns).collect()] == [
        r.asDict() for r in canon.collect()
    ]


def test_simhash_pairs_blocked_equals_brute(spark, docs):
    """The banded equi-join is EXACT: pigeonhole guarantees every pair
    within max_hamming shares a band, the hamming filter kills collisions."""
    blocked = dedup.simhash_near_pairs(docs)
    brute = dedup.simhash_near_pairs(docs, blocked=False)
    _same(blocked, brute)
    # the operator == the 'pair' arm of the merged registry union (r5:
    # dedup_simhash folded into this slot; the sig arm is checked against
    # with_simhash by test_simhash_matches_sql + the DuckDB oracle)
    merged = QUERIES["dedup_simhash_near_pairs"].spark_fn(spark, SF)
    pairs = (merged.where("part = 'pair'")
             .select("doc_a", "doc_b", F.col("val").alias("hamming")))
    _same(blocked.withColumn("hamming", F.col("hamming").cast("long")), pairs)


def test_simhash_discriminates(spark):
    """64-bit simhash has real discrimination: a planted near-duplicate pair
    (one token changed in ~60) lands within hamming 3; unrelated random docs
    never do (the 16-bit version flagged 28% of ALL pairs at <=3)."""
    import random

    rng = random.Random(99)
    vocab = [f"tok{i}" for i in range(5000)]
    base = [rng.choice(vocab) for _ in range(60)]
    near = list(base)
    near[30] = "changed"
    rows = [(0, " ".join(base)), (1, " ".join(near))] + [
        (i, " ".join(rng.choice(vocab) for _ in range(60))) for i in range(2, 30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in dedup.simhash_near_pairs(df).collect()}
    assert (0, 1) in pairs, "planted near-dup not found"
    others = {p for p in pairs if p != (0, 1)}
    assert not others, f"random docs flagged as near-dups: {others}"


def test_embedding_lsh_recall(spark):
    """Multi-band OR blocking has MEASURED recall at near-dup similarity,
    not a docstring promise: >= 90% of planted cosine>=0.9 pairs survive
    blocking, while the band join prunes most of the O(n^2) pair space."""
    import math
    import random

    rng = random.Random(7)
    dim, n_rand, n_planted = 64, 260, 20

    def unit():
        v = [rng.gauss(0, 1) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    rows, planted = [], []
    vid = 0
    for _ in range(n_rand):
        rows.append((vid, unit())); vid += 1
    for _ in range(n_planted):
        v = unit()
        w = [a + 0.22 * rng.gauss(0, 1) / math.sqrt(dim) for a in v]
        n = math.sqrt(sum(x * x for x in w))
        w = [x / n for x in w]
        cos = sum(a * b for a, b in zip(v, w))
        assert cos > 0.92, cos  # planted well above the 0.9 threshold
        rows.append((vid, v)); rows.append((vid + 1, w))
        planted.append((vid, vid + 1)); vid += 2

    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["vec_a"], r["vec_b"])
           for r in dedup.embedding_near_dup_pairs(df, threshold=0.9).collect()}
    recall = sum(1 for p in planted if p in got) / len(planted)
    assert recall >= 0.9, f"blocked recall {recall} on planted near-dups"

    # pruning: candidate pairs (threshold disabled) are a small fraction of
    # the O(n^2) pair space — the whole point of blocking
    n = len(rows)
    cands = dedup.embedding_near_dup_pairs(df, threshold=-2.0).count()
    assert cands < 0.2 * n * (n - 1) / 2, cands


def test_embedding_near_dup_matches_sql(spark, emb):
    api = dedup.embedding_near_dup_pairs(emb)
    sql = QUERIES["dedup_embedding_cosine_pairs"].spark_fn(spark, SF)
    _same(api.select(sql.columns), sql)
    assert api.count() > 0  # the threshold actually selects pairs


def test_jaccard_df_cap_is_subset(spark, docs):
    """The stop-shingle guard only removes pairs, never fabricates them."""
    full = dedup.ngram_jaccard_pairs(docs).select("doc_a", "doc_b")
    capped = dedup.ngram_jaccard_pairs(docs, df_cap=50).select("doc_a", "doc_b")
    assert capped.exceptAll(full).count() == 0


def test_exact_dedup_keep_first(spark, docs):
    out = dedup.exact_dedup_keep_first(docs)
    # sf corpus has no exact dupes -> identity; and the op is idempotent
    assert out.count() == docs.count()
    dup = docs.union(docs.withColumn("doc_id", F.col("doc_id") + 100000))
    assert dedup.exact_dedup_keep_first(dup).count() == docs.count()


def test_topk_cosine_matches_sql(spark, emb):
    q = emb.where(F.col("vec_id") == 0)
    api = similarity.topk_cosine(emb, q, k=10, exclude_id=0)
    sql = QUERIES["ann_cosine_topk"].spark_fn(spark, SF)
    _same(api, sql.select(api.columns))
    # the merged norm column is the canonical L2 formula on every row
    from access_log_aggregator_spark.functions import xsql as x
    want = {r["vec_id"]: r["n"] for r in emb.selectExpr(
        "vec_id", f"{x.norm_double('embedding', 64, x.SPARK)} as n").collect()}
    for r in sql.collect():
        assert r["l2_norm"] == want[r["vec_id"]]


def test_lsh_bucket_counts_match_sql(spark, emb):
    api = (similarity.with_lsh_bucket(emb)
           .groupBy(F.col("lsh_bucket").alias("bucket"))
           .agg(F.count(F.lit(1)).alias("n_vecs")))
    sql = QUERIES["ann_lsh_buckets"].spark_fn(spark, SF)
    _same(api, sql)


def test_ivf_topk_matches_sql(spark, emb):
    q = emb.where(F.col("vec_id") == 0)
    api = similarity.ivf_topk_cosine(emb, q, exclude_id=0)
    sql = QUERIES["ann_ivf_topk"].spark_fn(spark, SF)
    _same(api.select(sql.columns), sql)
    assert api.count() == 10


def test_ivf_assign_covers_all_vectors(spark, emb):
    assigned = similarity.ivf_assign(emb)
    assert assigned.count() == emb.count()  # exactly one cell per vector
    assert assigned.select("cell").distinct().count() <= 8
    # each centroid vector is assigned to its own cell (cosine 1 with itself)
    own = assigned.where(F.col("vec_id") < 8).where(F.col("vec_id") != F.col("cell"))
    assert own.count() == 0


def test_ivf_assign_ids_need_not_start_at_zero(spark, emb):
    """The codebook is the n_cells LOWEST-id vectors (order by id, limit),
    not `id < n_cells`: an id space starting at 100 must still yield a full
    codebook and identical cell structure, just with shifted labels."""
    shifted = emb.withColumn("vec_id", F.col("vec_id") + 100)
    base = {r["vec_id"]: r["cell"]
            for r in similarity.ivf_assign(emb).select("vec_id", "cell").collect()}
    got = {r["vec_id"]: r["cell"]
           for r in similarity.ivf_assign(shifted).select("vec_id", "cell").collect()}
    assert got == {i + 100: c + 100 for i, c in base.items()}


def test_lsh_topk_is_bucket_subset(spark, emb):
    """LSH top-k results all share the query's bucket and are a subset of
    the brute-force ranking's candidate pool."""
    q = emb.where(F.col("vec_id") == 0)
    rows = similarity.lsh_topk_cosine(emb, q, k=5).collect()
    assert len(rows) >= 1
    buckets = {r["lsh_bucket"] for r in rows}
    assert len(buckets) == 1


def test_text_ops_match_sql(spark, docs):
    merged = QUERIES["text_langid_quality"].spark_fn(spark, SF)

    api = text.with_quality_score(docs).select(
        "doc_id", "n_tokens", F.length("text").alias("n_chars"), "quality_score"
    )
    _same(api, merged.select("doc_id", "n_tokens", "n_chars", "quality_score"))

    api2 = text.with_lang_guess(docs).select(
        "doc_id", "lang", "hits_en", "hits_es", "hits_de", "hits_fr", "guessed_lang"
    )
    _same(api2, merged.select("doc_id", "lang", "hits_en", "hits_es",
                              "hits_de", "hits_fr", "guessed_lang"))

    api3 = text.with_fingerprint(text.with_token_count(docs)).select(
        "doc_id", "fingerprint", "n_tokens"
    )
    sql3 = QUERIES["doc_fingerprints"].spark_fn(spark, SF)
    _same(api3, sql3)


def test_whitespace_class_parity_on_vertical_tab(spark):
    """Java \\s includes \\x0B, RE2's does not — the explicit whitespace
    class must make both engines tokenize \\x0B-bearing text identically
    (here: \\x0B is a token character in BOTH)."""
    import duckdb

    from access_log_aggregator_spark.functions import xsql as x

    texts = ["a\x0bb c", "x \x0b y", "\x0b", "a\tb\x0bc\nd"]
    sdf = spark.createDataFrame([(t,) for t in texts], "text string")
    got_spark = [
        (r["n"], r["b"]) for r in sdf.selectExpr(
            f"{x.arr_size(x.tokens('text', x.SPARK), x.SPARK)} as n",
            f"{x.bpe_token_count('text', x.SPARK)} as b",
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("create table t(text varchar)")
    con.executemany("insert into t values (?)", [(t,) for t in texts])
    got_duck = con.execute(
        f"select {x.arr_size(x.tokens('text', x.DUCK), x.DUCK)},"
        f" {x.bpe_token_count('text', x.DUCK)} from t"
    ).fetchall()
    assert got_spark == [tuple(r) for r in got_duck]


def test_tfidf_matches_sql(spark, docs):
    """The operator == the 'tfidf' arm of the merged registry union (r5:
    text_top_tokens folded into this slot; the top_token arm is pure SQL
    checked by the DuckDB oracle directly)."""
    api = text.tfidf_top_terms(docs)
    merged = QUERIES["text_tfidf_top_terms"].spark_fn(spark, SF)
    sql = (merged.where("part = 'tfidf'")
           .select("doc_id", "token", "tf", "df", "score"))
    _same(api, sql)
    # the merged union re-sorts by (part, token, doc_id): exact-row compare
    # on that order against the operator's own top-k re-sorted the same way
    api_sorted = api.orderBy("token", "doc_id")
    assert [tuple(r) for r in api_sorted.collect()] == \
        [tuple(r) for r in sql.orderBy("token", "doc_id").collect()]


def test_bpe_token_stats_match_sql(spark, docs):
    """Java-regex and RE2 agree on the BPE-ish pre-tokenizer count: the
    per-lang aggregate from the DataFrame ops == the (merged) SQL-registry
    token-stats query, for BOTH whitespace and BPE-ish counts."""
    api = (
        text.with_bpe_token_count(text.with_token_count(docs))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias(
                "avg_tokens"
            ),
            F.sum("n_bpe_tokens").cast("bigint").alias("total_bpe_tokens"),
            (F.sum("n_bpe_tokens").cast("double") / F.count(F.lit(1))).alias(
                "avg_bpe_tokens"
            ),
        )
    )
    sql = QUERIES["text_token_stats"].spark_fn(spark, SF)
    _same(api.select(sql.columns), sql)
    # sanity: BPE-ish pre-tokens are at least as fine-grained as whitespace
    both = text.with_bpe_token_count(text.with_token_count(docs))
    assert both.filter(F.col("n_bpe_tokens") < F.col("n_tokens")).count() == 0
