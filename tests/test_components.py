"""Connected components: exactness vs a union-find reference."""

from __future__ import annotations

from movie_rankings_spark.operators.components import (
    connected_components,
    dedup_components,
)
from movie_rankings_spark.plans import all_queries


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {x: find(x) for x in parent}


def test_components_match_union_find_on_chain_and_cliques(spark):
    # a 5-chain (diameter 4 — forces multiple rounds), a triangle,
    # an isolated pair
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }
    want = _union_find(edges)
    assert got == want


def test_components_raise_on_nonconvergence(spark):
    # an 8-chain needs ~7 min-label rounds; a 2-round budget must
    # refuse loudly instead of returning half-merged groups
    import pytest

    edges = [(i, i + 1) for i in range(1, 8)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iterations=2)


def test_dedup_components_on_real_pairs(spark, sf_dir):
    pairs = all_queries.QUERIES["dedup_ngram_jaccard"](spark, sf_dir)
    edge_list = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    want_roots = _union_find(edge_list)
    comps = {}
    for node, root in want_roots.items():
        comps.setdefault(root, []).append(node)
    want = {(min(m), len(m)) for m in comps.values()}

    got = {
        (r["rep_doc_id"], r["n_members"])
        for r in dedup_components(pairs).collect()
    }
    assert got == want
