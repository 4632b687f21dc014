"""Connected-components duplicate clustering (operators/cluster.py).

Correctness is pinned three ways: hand-built graphs with known components
(incl. a long chain that REQUIRES pointer jumping to converge within the
round budget), a seeded random graph checked against a pure-Python
union-find, and the registry query's LSH-pair consistency invariants.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from access_log_aggregator_spark.operators.cluster import (
    connected_components,
    duplicate_clusters,
)

SF = "/root/testdata/sf0.001"


def _cc_of(spark, edges: list[tuple[int, int]], **kw) -> dict[int, int]:
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    rows = connected_components(df, **kw).collect()
    return {r["id"]: r["label"] for r in rows}


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(v: int) -> int:
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def test_two_components_and_min_labels(spark):
    labels = _cc_of(spark, [(1, 2), (2, 3), (10, 11), (3, 1)])
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_converges_via_pointer_jumping(spark):
    """A 40-node chain has diameter 39; plain one-hop min propagation
    needs 39 rounds, pointer jumping O(log). 12 rounds must suffice."""
    chain = [(i, i + 1) for i in range(40)]
    labels = _cc_of(spark, chain, max_rounds=12)
    assert set(labels.values()) == {0}
    assert len(labels) == 41


def test_nonconvergence_raises(spark):
    chain = [(i, i + 1) for i in range(40)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc_of(spark, chain, max_rounds=2)


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(7)
    nodes = list(range(200))
    edges = [
        (min(a, b), max(a, b))
        for a, b in (rng.sample(nodes, 2) for _ in range(120))
    ]
    assert _cc_of(spark, edges) == _union_find(edges)


@pytest.fixture(scope="module")
def clusters(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return duplicate_clusters(docs).collect()


def test_duplicate_clusters_consistency(spark, clusters):
    """Every LSH candidate pair's endpoints share a cluster; cluster_id is
    the member minimum; cluster_size counts members."""
    from access_log_aggregator_spark.operators.dedup import minhash_lsh_candidates

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = minhash_lsh_candidates(docs).collect()
    assign = {r["doc_id"]: r["cluster_id"] for r in clusters}
    for p in pairs:
        assert assign[p["doc_a"]] == assign[p["doc_b"]]

    members: dict[int, list[int]] = {}
    for d, c in assign.items():
        members.setdefault(c, []).append(d)
    sizes = {r["doc_id"]: r["cluster_size"] for r in clusters}
    for c, ms in members.items():
        assert c == min(ms)
        for d in ms:
            assert sizes[d] == len(ms)


def test_duplicate_clusters_matches_union_find(spark, clusters):
    from access_log_aggregator_spark.operators.dedup import minhash_lsh_candidates

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = [(r["doc_a"], r["doc_b"])
             for r in minhash_lsh_candidates(docs).collect()]
    expect = _union_find(pairs)
    assert {r["doc_id"]: r["cluster_id"] for r in clusters} == expect
