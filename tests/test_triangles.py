"""Triangle counting (operators/triangles.py): oriented form vs the
naive join, hand-computed structures."""

from __future__ import annotations

import random

from movie_rankings_spark.operators.triangles import (
    triangle_count_naive,
    triangle_stats,
    undirected_edges,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_complete_graph_k4(spark):
    # K4: 6 edges, 4 triangles, clustering 1.0
    pairs = [(a, b) for a in range(4) for b in range(4) if a != b]
    out = triangle_stats(undirected_edges(_edges(spark, pairs))).collect()[0]
    assert out["n_nodes"] == 4
    assert out["n_edges"] == 6
    assert out["n_wedges"] == 12  # 4 nodes * C(3,2)
    assert out["n_triangles"] == 4
    assert out["global_clustering"] == 1.0


def test_star_graph_has_no_triangles(spark):
    pairs = [(0, i) for i in range(1, 8)]
    out = triangle_stats(undirected_edges(_edges(spark, pairs))).collect()[0]
    assert out["n_triangles"] == 0
    assert out["n_wedges"] == 21  # C(7,2) through the hub


def test_oriented_matches_naive_on_random_graphs(spark):
    rng = random.Random(11)
    for trial in range(3):
        n = 25
        pairs = list(
            {
                (a, b)
                for _ in range(120)
                for a, b in [sorted(rng.sample(range(n), 2))]
            }
        )
        und = undirected_edges(_edges(spark, pairs))
        fast = triangle_stats(und).collect()[0]["n_triangles"]
        slow = triangle_count_naive(und).collect()[0]["n_triangles"]
        assert fast == slow


def test_skewed_hub_graph(spark):
    # hub connected to everyone + a chain among leaves: orientation
    # must keep the hub's out-degree low and still count correctly.
    pairs = [(0, i) for i in range(1, 20)] + [(i, i + 1) for i in range(1, 19)]
    und = undirected_edges(_edges(spark, pairs))
    fast = triangle_stats(und).collect()[0]["n_triangles"]
    slow = triangle_count_naive(und).collect()[0]["n_triangles"]
    assert fast == slow == 18  # each chain edge closes with the hub
