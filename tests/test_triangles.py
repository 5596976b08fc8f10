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


def _brute_lcc(pairs):
    import itertools

    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for v, nbrs in adj.items():
        d = len(nbrs)
        if d < 2:
            continue
        t = sum(
            1
            for x, y in itertools.combinations(sorted(nbrs), 2)
            if y in adj.get(x, ())
        )
        out[v] = (d, t, 2.0 * t / (d * (d - 1)))
    return out


def test_local_clustering_k4_all_one(spark):
    from movie_rankings_spark.operators.triangles import local_clustering

    pairs = [(a, b) for a in range(4) for b in range(4) if a != b]
    rows = local_clustering(undirected_edges(_edges(spark, pairs))).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["degree"] == 3 and r["n_triangles"] == 3 and r["lcc"] == 1.0


def test_local_clustering_star_center_zero(spark):
    from movie_rankings_spark.operators.triangles import local_clustering

    pairs = [(0, i) for i in range(1, 8)]
    rows = local_clustering(undirected_edges(_edges(spark, pairs))).collect()
    # only the hub has degree >= 2; leaves are excluded
    assert len(rows) == 1
    assert rows[0]["node"] == 0 and rows[0]["lcc"] == 0.0
    assert rows[0]["n_triangles"] == 0


def test_local_clustering_brute_force_random(spark):
    from movie_rankings_spark.operators.triangles import local_clustering

    rng = random.Random(29)
    n = 30
    pairs = list(
        {
            (a, b)
            for _ in range(180)
            for a, b in [sorted(rng.sample(range(n), 2))]
        }
    )
    rows = local_clustering(undirected_edges(_edges(spark, pairs))).collect()
    ref = _brute_lcc(pairs)
    assert {r["node"] for r in rows} == set(ref)
    for r in rows:
        d, t, lcc = ref[r["node"]]
        assert r["degree"] == d
        assert r["n_triangles"] == t
        assert abs(r["lcc"] - lcc) < 1e-15
