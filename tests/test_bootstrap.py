"""Poisson bootstrap CI (operators/bootstrap.py): determinism, CI
bracketing, and degenerate-distribution behavior."""

from __future__ import annotations

from movie_rankings_spark.operators.bootstrap import bootstrap_mean_ci


def test_constant_values_collapse_ci(spark):
    """Every replica mean of a constant column equals the constant, so
    the CI must collapse to [c, c] exactly."""
    df = spark.createDataFrame(
        [(i, "g", 7.5) for i in range(100)], "k long, g string, v double"
    )
    row = bootstrap_mean_ci(df, "k", "v", ["g"], n_replicas=32).collect()[0]
    assert row["mean_value"] == 7.5
    assert row["ci_lo"] == 7.5 and row["ci_hi"] == 7.5
    assert row["n_replicas"] == 32


def test_ci_brackets_mean_and_is_deterministic(spark):
    rows = [(i, "a" if i % 2 else "b", float((i * 37) % 100)) for i in range(400)]
    df = spark.createDataFrame(rows, "k long, g string, v double")
    out1 = {
        r["g"]: r for r in bootstrap_mean_ci(df, "k", "v", ["g"]).collect()
    }
    out2 = {
        r["g"]: r for r in bootstrap_mean_ci(df, "k", "v", ["g"]).collect()
    }
    for g, r in out1.items():
        assert r["ci_lo"] <= r["mean_value"] <= r["ci_hi"], r
        assert r["ci_lo"] < r["ci_hi"]  # non-degenerate data -> real spread
        r2 = out2[g]
        assert (r["ci_lo"], r["ci_hi"], r["mean_value"]) == (
            r2["ci_lo"], r2["ci_hi"], r2["mean_value"],
        )


def test_ci_width_shrinks_with_n(spark):
    """sqrt(n) behavior, coarsely: 4x the rows should at least halve-ish
    the CI width (assert strictly narrower by 1.5x to stay robust)."""
    small = spark.createDataFrame(
        [(i, "g", float((i * 37) % 100)) for i in range(200)],
        "k long, g string, v double",
    )
    big = spark.createDataFrame(
        [(i, "g", float((i * 37) % 100)) for i in range(800)],
        "k long, g string, v double",
    )
    ws = [
        r["ci_hi"] - r["ci_lo"]
        for r in bootstrap_mean_ci(small, "k", "v", ["g"]).collect()
    ][0]
    wb = [
        r["ci_hi"] - r["ci_lo"]
        for r in bootstrap_mean_ci(big, "k", "v", ["g"]).collect()
    ][0]
    assert wb < ws / 1.5, (ws, wb)
