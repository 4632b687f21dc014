"""Deterministic sampling operators (operators/sample.py).

Pins the properties that make hash-threshold sampling the right tool at
100 TB — partitioning-invariance, nesting, union-stability, cross-engine
row identity — none of which ``rand(seed)`` sampling has.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from access_log_aggregator_spark.functions import xsql as x
from access_log_aggregator_spark.operators.sample import (
    hash_sample,
    sample_predicate,
    stratified_hash_sample,
    top_k_by_hash,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(4000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        F.expr("case pmod(id, 4) when 0 then 'en' when 1 then 'de' "
               "when 2 then 'id' else 'fr' end").alias("lang"),
    )


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_sample_is_partitioning_invariant(spark, docs):
    a = _ids(hash_sample(docs.repartition(1), "doc_id", 0.1))
    b = _ids(hash_sample(docs.repartition(16), "doc_id", 0.1))
    assert a == b and 0 < len(a) < 4000


def test_sample_fraction_is_close(spark, docs):
    n = len(_ids(hash_sample(docs, "doc_id", 0.25)))
    # binomial(4000, 0.25): sd ~ 27; allow 4 sigma
    assert abs(n - 1000) < 110


def test_samples_nest(spark, docs):
    small = set(_ids(hash_sample(docs, "doc_id", 0.05)))
    big = set(_ids(hash_sample(docs, "doc_id", 0.2)))
    assert small <= big


def test_salt_gives_independent_draws(spark, docs):
    a = set(_ids(hash_sample(docs, "doc_id", 0.2, salt="run1")))
    b = set(_ids(hash_sample(docs, "doc_id", 0.2, salt="run2")))
    assert a != b
    # independent 20% draws overlap ~4%; correlated draws would overlap ~20%
    assert len(a & b) < 0.1 * 4000


def test_sample_is_union_stable(spark, docs):
    half1 = docs.where("doc_id < 'doc-3'")          # lexicographic split
    half2 = docs.where("doc_id >= 'doc-3'")
    whole = set(_ids(hash_sample(docs, "doc_id", 0.15)))
    parts = set(_ids(hash_sample(half1, "doc_id", 0.15))) | \
        set(_ids(hash_sample(half2, "doc_id", 0.15)))
    assert whole == parts


def test_sample_matches_duckdb_exactly(spark, docs):
    sp = _ids(hash_sample(docs, "doc_id", 0.1))
    con = duckdb.connect()
    con.execute("create table d(doc_id varchar)")
    con.executemany("insert into d values (?)",
                    [(f"doc-{i}",) for i in range(4000)])
    dk = sorted(r[0] for r in con.execute(
        f"select doc_id from d where "
        f"{sample_predicate('doc_id', 0.1, d=x.DUCK)}").fetchall())
    assert sp == dk


def test_sample_plans_no_shuffle(spark, docs):
    from access_log_aggregator_spark.plans.audit import shape_facts

    f = shape_facts(hash_sample(docs, "doc_id", 0.1))
    assert f["ex_hash"] == f["ex_range"] == f["ex_single"] == 0
    assert f["py_scalar"] == f["py_grouped"] == 0


def test_stratified_fractions_apply_per_stratum(spark, docs):
    out = stratified_hash_sample(
        docs, "lang", "doc_id",
        {"en": 0.5, "de": 0.05}, default_fraction=0.0)
    counts = {r.lang: r.n for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"en", "de"}          # fr/id fully dropped
    assert abs(counts["en"] - 500) < 70         # 1000 * 0.5, 4 sigma
    assert 10 <= counts["de"] <= 110            # 1000 * 0.05
    # the en sample is exactly the plain 50% sample of the en stratum
    plain = hash_sample(docs.where("lang = 'en'"), "doc_id", 0.5)
    assert _ids(out.where("lang = 'en'")) == _ids(plain)


def test_empty_and_null_keys_are_not_always_kept(spark):
    """polyhash('') = polyhash(NULL) = 0 would put empty/NULL keys in
    EVERY sample at any fraction > 0 (found in review); the 'v'/'n'
    key marking keeps them ordinary draws."""
    df = spark.createDataFrame(
        [("",), (None,), ("x",)] * 5, "doc_id string")
    out = hash_sample(df, "doc_id", 0.001)
    assert out.count() == 0          # none of the three keys survives 0.1%
    # fraction 1.0 keeps every row, NULLs included (the % P fold: mix
    # output can exceed P, which a raw < P*1.0 threshold dropped)
    assert hash_sample(df, "doc_id", 1.0).count() == 15


def test_full_fraction_keeps_every_row(spark, docs):
    assert hash_sample(docs, "doc_id", 1.0).count() == 4000


def test_quoted_salt_and_stratum_values(spark):
    """Apostrophes in salts or stratum values reach the SQL as escaped
    literals, not syntax errors (found in review)."""
    df = spark.createDataFrame(
        [("d1", "o'brien"), ("d2", "plain")] * 50,
        "doc_id string, lang string")
    assert hash_sample(df, "doc_id", 0.5, salt="it's").count() > 0
    out = stratified_hash_sample(df, "lang", "doc_id",
                                 {"o'brien": 1.0}, default_fraction=0.0)
    assert {r.lang for r in out.collect()} == {"o'brien"}


def test_null_key_parity_with_duckdb_under_salt(spark):
    """Spark concat propagates NULL while DuckDB concat skips NULL
    arguments — inlining NULL keys into a salted concat diverged across
    engines (found in review); the CASE marker hashes NULL before any
    concat so both engines draw identically."""
    df = spark.createDataFrame([(None,), ("a",), ("b",)], "doc_id string")
    sp = sorted(r.doc_id or "<null>" for r in
                hash_sample(df, "doc_id", 0.5, salt="s1").collect())
    con = duckdb.connect()
    con.execute("create table d(doc_id varchar)")
    con.executemany("insert into d values (?)", [(None,), ("a",), ("b",)])
    dk = sorted(r[0] or "<null>" for r in con.execute(
        f"select doc_id from d where "
        f"{sample_predicate('doc_id', 0.5, salt='s1', d=x.DUCK)}").fetchall())
    assert sp == dk


def test_top_k_deterministic_under_duplicate_keys(spark):
    """Duplicate keys tie on (hash, key); the whole-row xxhash64
    tiebreak keeps the chosen rows deterministic (found in review)."""
    rows = [("dup", i) for i in range(10)] + [("solo", 99)]
    df = spark.createDataFrame(rows, "k string, payload int")
    a = sorted((r.k, r.payload) for r in
               top_k_by_hash(df.repartition(1), [], "k", 5).collect())
    b = sorted((r.k, r.payload) for r in
               top_k_by_hash(df.repartition(7), [], "k", 5).collect())
    assert a == b and len(a) == 5


def test_top_k_tolerates_map_columns(spark):
    """xxhash64 rejects MAP anywhere in a type; the tiebreak must skip
    such columns instead of crashing the whole operator (found in
    review)."""
    df = spark.createDataFrame(
        [("a", {"x": "1"}), ("b", {"y": "2"}), ("c", {"z": "3"})],
        "k string, m map<string,string>")
    out = top_k_by_hash(df, [], "k", 2)
    assert out.count() == 2


def test_sketches_accept_expression_keys(spark):
    """Build-side sketch operators take any SQL expression as the key
    (the null guard must use F.expr, not F.col — found in review)."""
    from access_log_aggregator_spark.operators.sketch import (
        cms_counter_table,
        hll_distinct,
    )

    df = spark.createDataFrame([("A",), ("a",), ("B",)], "k string")
    [row] = hll_distinct(df, "upper(k)").collect()
    [row2] = hll_distinct(df.selectExpr("upper(k) as k"), "k").collect()
    assert row.approx_distinct == row2.approx_distinct
    assert cms_counter_table(df, "lower(k)").count() > 0


def test_stratified_rejects_bad_fraction(spark, docs):
    with pytest.raises(ValueError):
        stratified_hash_sample(docs, "lang", "doc_id", {"en": 1.5})
    with pytest.raises(ValueError):
        hash_sample(docs, "doc_id", -0.1)


def test_top_k_by_hash_exact_quota_and_deterministic(spark, docs):
    out = top_k_by_hash(docs, ["lang"], "doc_id", 7)
    counts = {r.lang: r.n for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 7, "de": 7, "id": 7, "fr": 7}
    again = top_k_by_hash(docs.repartition(13), ["lang"], "doc_id", 7)
    assert _ids(out) == _ids(again)
    # k larger than the group keeps the whole group
    tiny = docs.where("doc_id in ('doc-1', 'doc-2')")
    assert len(_ids(top_k_by_hash(tiny, ["lang"], "doc_id", 7))) == 2
