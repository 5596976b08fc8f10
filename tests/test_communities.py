"""Synchronous label propagation (operators/communities.py): planted
two-clique fixture, exact equality with a pure-Python synchronous LPA,
and determinism across repartitioning."""

from __future__ import annotations

from collections import Counter

from movie_rankings_spark.operators.communities import (
    community_sizes,
    label_propagation,
)


def _sym(pairs):
    out = set()
    for a, b in pairs:
        out.add((a, b))
        out.add((b, a))
    return sorted(out)


def _py_lpa(edges, n_rounds):
    nbrs: dict[int, list[int]] = {}
    for s, d in edges:
        nbrs.setdefault(d, []).append(s)
    labels = {n: n for n in nbrs}
    for _ in range(n_rounds):
        new = {}
        for node, ins in nbrs.items():
            cnt = Counter(labels[s] for s in ins)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[node] = best[0]
        labels = new
    return labels


def test_two_cliques_separate(spark):
    # two 4-cliques joined by one bridge edge
    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = _sym(c1 + c2 + [(3, 10)])
    df = spark.createDataFrame(edges, "src long, dst long")
    labels = {
        r["node"]: r["label"]
        for r in label_propagation(df, n_rounds=4).collect()
    }
    assert len({labels[n] for n in range(4)}) == 1
    assert len({labels[n] for n in range(10, 14)}) == 1
    assert labels[0] != labels[10]


def test_matches_python_synchronous_reference(spark):
    # irregular graph: ring + chords
    ring = [(i, (i + 1) % 12) for i in range(12)]
    chords = [(0, 6), (2, 9), (4, 11)]
    edges = _sym(ring + chords)
    df = spark.createDataFrame(edges, "src long, dst long")
    for rounds in (1, 2, 4):
        got = {
            r["node"]: r["label"]
            for r in label_propagation(df, n_rounds=rounds).collect()
        }
        assert got == _py_lpa(edges, rounds), rounds


def test_deterministic_under_repartition(spark):
    edges = _sym([(i, (i + 1) % 30) for i in range(30)] + [(5, 20), (8, 25)])
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(
        (r["label"], r["n_nodes"])
        for r in community_sizes(label_propagation(df, n_rounds=3)).collect()
    )
    b = sorted(
        (r["label"], r["n_nodes"])
        for r in community_sizes(
            label_propagation(df.repartition(13), n_rounds=3)
        ).collect()
    )
    assert a == b
