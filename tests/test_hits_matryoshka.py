"""HITS bipartite, Matryoshka prefix-dim recall, inter-event CV²:
brute-force references."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F


def _ref_hits(edges, n_iter=4):
    srcs = sorted({s for s, _ in edges})
    dsts = sorted({d for _, d in edges})
    h = {s: 1.0 / len(srcs) for s in srcs}
    a = {}
    for _ in range(n_iter):
        mass = {d: 0 for d in dsts}
        for s, d in edges:
            mass[d] += round(h[s] * 1e15)
        tot = sum(mass.values())
        a = {d: mass[d] / tot for d in dsts}
        hmass = {s: 0 for s in srcs}
        for s, d in edges:
            hmass[s] += round(a[d] * 1e15)
        htot = sum(hmass.values())
        h = {s: hmass[s] / htot for s in srcs}
    return a, h


def test_hits_reference_small_graph(spark):
    from movie_rankings_spark.operators.pagerank import hits_bipartite

    rng = np.random.default_rng(7)
    edges = sorted(
        {
            (int(rng.integers(0, 10)), int(100 + rng.integers(0, 15)))
            for _ in range(60)
        }
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    out = hits_bipartite(df, n_iter=4, top_k=50).collect()
    a_ref, h_ref = _ref_hits(edges)
    got_a = {r["node"]: r["score"] for r in out if r["role"] == "authority"}
    got_h = {r["node"]: r["score"] for r in out if r["role"] == "hub"}
    assert set(got_a) == set(a_ref) and set(got_h) == set(h_ref)
    for n, s in a_ref.items():
        assert abs(got_a[n] - s) < 1e-12
    for n, s in h_ref.items():
        assert abs(got_h[n] - s) < 1e-12
    # L1-normalized halves each sum to 1
    assert abs(sum(got_a.values()) - 1.0) < 1e-9
    assert abs(sum(got_h.values()) - 1.0) < 1e-9


def test_hits_star_authority(spark):
    from movie_rankings_spark.operators.pagerank import hits_bipartite

    # every hub points at item 100; item 200 has one buyer
    edges = [(s, 100) for s in range(5)] + [(0, 200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = hits_bipartite(df, n_iter=3, top_k=10).collect()
    auth = [r for r in out if r["role"] == "authority"]
    assert auth[0]["node"] == 100 and auth[0]["rank"] == 1
    assert auth[0]["score"] > 0.8


def test_prefix_dim_recall_structure(spark):
    from movie_rankings_spark.operators.similarity import prefix_dim_recall

    rng = np.random.default_rng(3)
    # prefix dims carry the signal: last dims are tiny noise, so
    # prefix ranking should agree with full ranking
    base = rng.normal(0, 1, size=(30, 8))
    noise = rng.normal(0, 1e-6, size=(30, 8))
    vecs = np.concatenate([base, noise], axis=1)
    rows = [
        (i, [float(x) for x in vecs[i]]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = prefix_dim_recall(
        df, query_ids=[0, 1, 2], k=3, prefix_dim=8
    ).collect()
    assert len(out) == 3
    for r in out:
        assert r["k"] == 3 and r["prefix_dim"] == 8
        assert r["recall"] >= 2 / 3  # near-perfect agreement expected
    assert out[0]["mean_recall"] >= 2 / 3


def test_prefix_dim_recall_noise_dims_hurt(spark):
    from movie_rankings_spark.operators.similarity import prefix_dim_recall

    rng = np.random.default_rng(9)
    # signal lives in the LAST dims: prefix ranking is then noise
    noise = rng.normal(0, 1e-6, size=(40, 8))
    base = rng.normal(0, 1, size=(40, 8))
    vecs = np.concatenate([noise, base], axis=1)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = prefix_dim_recall(
        df, query_ids=[0, 1, 2, 3], k=5, prefix_dim=8
    ).collect()
    assert out[0]["mean_recall"] < 0.6  # truncation destroys the ranking


def test_interevent_cv_reference(spark):
    from movie_rankings_spark.operators.timeseries import interevent_cv

    d0 = dt.datetime(2024, 1, 1)
    rows = []
    # metronomic: exactly hourly -> cv2 == 0
    for i in range(20):
        rows.append((1, "metro", d0 + dt.timedelta(hours=i)))
    # bursty: 10 events in one minute, then days apart
    t = d0
    for i in range(10):
        rows.append((100 + i, "burst", t))
        t += dt.timedelta(seconds=6)
    for i in range(10):
        t += dt.timedelta(days=1)
        rows.append((200 + i, "burst", t))
    df = spark.createDataFrame(
        [(eid, u, ts) for eid, u, ts in rows],
        "event_id long, user string, ts timestamp",
    )
    out = interevent_cv(df, "user", "ts", min_events=10, top_k=5).collect()
    got = {r["key"]: r for r in out}
    assert got["metro"]["cv2"] == 0.0
    assert abs(got["metro"]["mean_gap_s"] - 3600.0) < 1e-9
    assert got["burst"]["cv2"] > 0.5  # far from metronomic
    # brute force for burst
    gaps = []
    ts = sorted(ts for _, u, ts in rows if u == "burst")
    for a, b in zip(ts, ts[1:]):
        gaps.append((b - a).total_seconds() * 1e6)
    g = np.array(gaps)
    cv2_ref = g.var(ddof=1) / g.mean() ** 2
    assert abs(got["burst"]["cv2"] - cv2_ref) < 1e-9 * max(cv2_ref, 1)


def test_hits_rejects_nonpositive_iterations(spark):
    import pytest

    from movie_rankings_spark.operators.pagerank import hits_bipartite

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="n_iter"):
        hits_bipartite(edges, n_iter=0)


def test_interevent_cv_custom_tiebreaker(spark):
    """Frames without an event_id column work when the unique
    tiebreaker column is named explicitly (ADVICE r7)."""
    from movie_rankings_spark.operators.timeseries import interevent_cv

    d0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, "u", d0 + dt.timedelta(hours=i)) for i in range(15)
    ]
    df = spark.createDataFrame(rows, "rid long, user string, ts timestamp")
    out = interevent_cv(
        df, "user", "ts", min_events=10, top_k=5, tiebreak_col="rid"
    ).collect()
    assert len(out) == 1 and out[0]["cv2"] == 0.0
