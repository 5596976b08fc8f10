"""Markov steady state and corr_matrix vs numpy references."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from movie_rankings_spark.operators.markov import markov_steady_state
from movie_rankings_spark.operators.statistics import corr_matrix


def test_markov_steady_state_matches_numpy(spark):
    states = ["a", "b", "c"]
    counts = [
        ("a", "a", 10), ("a", "b", 30), ("a", "c", 60),
        ("b", "a", 50), ("b", "b", 25), ("b", "c", 25),
        ("c", "a", 20), ("c", "b", 70),  # (c,c) missing -> densified 0
    ]
    df = spark.createDataFrame(
        counts, "cur_type string, next_type string, n_transitions long"
    )
    out = {
        r["state"]: r
        for r in markov_steady_state(df, states, n_iter=40).collect()
    }
    P = np.zeros((3, 3))
    for a, b, n in counts:
        P[states.index(a), states.index(b)] = n
    P = P / P.sum(axis=1, keepdims=True)
    pi = np.full(3, 1 / 3)
    for _ in range(40):
        pi = pi @ P
    for i, st in enumerate(states):
        assert out[st]["pi_stationary"] == pytest.approx(pi[i], rel=1e-9)
    # occupancy sums to 1 and share_source matches row masses
    assert sum(r["pi_stationary"] for r in out.values()) == pytest.approx(
        1.0, abs=1e-9
    )
    assert out["a"]["share_source"] == pytest.approx(100 / 290, rel=1e-12)


def test_corr_matrix_matches_numpy(spark):
    rng = np.random.default_rng(4)
    x = rng.integers(0, 1000, 400)
    y = 3 * x + rng.integers(-100, 101, 400)  # strongly correlated
    z = rng.integers(0, 1000, 400)  # independent
    df = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in zip(x, y, z)],
        "x long, y long, z long",
    )
    out = {
        (r["feat_a"], r["feat_b"]): r["corr"]
        for r in corr_matrix(
            df, {"x": F.col("x"), "y": F.col("y"), "z": F.col("z")}
        ).collect()
    }
    assert set(out) == {("x", "y"), ("x", "z"), ("y", "z")}
    ref = np.corrcoef(np.vstack([x, y, z]).astype(float))
    assert out[("x", "y")] == pytest.approx(ref[0, 1], rel=1e-12)
    assert out[("x", "z")] == pytest.approx(ref[0, 2], rel=1e-12)
    assert out[("y", "z")] == pytest.approx(ref[1, 2], rel=1e-12)
    assert out[("x", "y")] > 0.99


def test_corr_matrix_null_rows_complete_case(spark):
    rows = [(1, 2, 3), (2, 4, 5), (3, 6, 9), (4, 8, 2), (None, 1, 1)]
    df = spark.createDataFrame(rows, "x long, y long, z long")
    out = corr_matrix(
        df, {"x": F.col("x"), "y": F.col("y"), "z": F.col("z")}
    ).collect()
    assert all(r["n_rows"] == 4 for r in out)
    xy = [r for r in out if (r["feat_a"], r["feat_b"]) == ("x", "y")][0]
    assert xy["corr"] == pytest.approx(1.0, abs=1e-12)  # y = 2x exactly
