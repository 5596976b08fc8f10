"""Periodogram, degree assortativity, Cronbach's alpha, SMD balance,
Page's trend test: numpy brute-force references and structural
hand-computed cases."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
from pyspark.sql import functions as F


def _daily_df(spark, values, start="2024-01-01"):
    d0 = dt.date.fromisoformat(start)
    rows = [
        (d0 + dt.timedelta(days=i), int(v)) for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "day date, cents long")


def test_periodogram_planted_harmonic(spark):
    from movie_rankings_spark.operators.timeseries import periodogram_daily

    n = 60
    t = np.arange(n)
    vals = (10000 + 3000 * np.cos(2 * np.pi * 3 * t / n)).round().astype(int)
    out = periodogram_daily(
        _daily_df(spark, vals), "day", F.col("cents"), n_freqs=10
    ).collect()
    assert [r["k"] for r in out] == list(range(1, 11))
    powers = {r["k"]: r["power"] for r in out}
    # k=3 dominates every other harmonic by orders of magnitude
    for k in powers:
        if k != 3:
            assert powers[3] > 100 * powers[k]
    # reference: numpy DFT on the N-centered series (engine scale)
    y = vals.astype(float)
    cy = n * y - y.sum()
    ca = (cy * np.cos(2 * np.pi * 3 * t / n)).sum()
    sa = (cy * np.sin(2 * np.pi * 3 * t / n)).sum()
    ref = ca * ca + sa * sa
    assert abs(powers[3] - ref) < 1e-4 * ref
    [r3] = [r for r in out if r["k"] == 3]
    assert abs(r3["period"] - n / 3) < 1e-12


def test_periodogram_brute_force_random(spark):
    from movie_rankings_spark.operators.timeseries import periodogram_daily

    rng = np.random.default_rng(19)
    n = 45
    vals = rng.integers(1000, 50000, size=n)
    out = periodogram_daily(
        _daily_df(spark, vals), "day", F.col("cents"), n_freqs=8
    ).collect()
    t = np.arange(n)
    y = vals.astype(float)
    cy = n * y - y.sum()
    for r in out:
        k = r["k"]
        ca = (cy * np.cos(2 * np.pi * k * t / n)).sum()
        sa = (cy * np.sin(2 * np.pi * k * t / n)).sum()
        # 1e-9 angle quantization on ~1e7-magnitude coefficients
        assert abs(r["cos_sum"] - ca) < 1e-3 * max(abs(ca), 1e3)
        assert abs(r["sin_sum"] - sa) < 1e-3 * max(abs(sa), 1e3)


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_assortativity_star_is_minus_one(spark):
    from movie_rankings_spark.operators.triangles import (
        degree_assortativity,
        undirected_edges,
    )

    pairs = [(0, i) for i in range(1, 9)]
    [r] = degree_assortativity(
        undirected_edges(_edges_df(spark, pairs))
    ).collect()
    assert r["n_nodes"] == 9 and r["n_edges"] == 8 and r["n_stubs"] == 16
    assert abs(r["assortativity"] + 1.0) < 1e-12


def test_assortativity_regular_graph_null(spark):
    from movie_rankings_spark.operators.triangles import (
        degree_assortativity,
        undirected_edges,
    )

    # cycle: every degree 2 -> zero variance -> NULL (0/0)
    n = 6
    pairs = [(i, (i + 1) % n) for i in range(n)]
    [r] = degree_assortativity(
        undirected_edges(_edges_df(spark, pairs))
    ).collect()
    assert r["assortativity"] is None


def test_assortativity_brute_force_random(spark):
    import random

    from movie_rankings_spark.operators.triangles import (
        degree_assortativity,
        undirected_edges,
    )

    rng = random.Random(37)
    pairs = list(
        {
            (a, b)
            for _ in range(150)
            for a, b in [sorted(rng.sample(range(25), 2))]
        }
    )
    [r] = degree_assortativity(
        undirected_edges(_edges_df(spark, pairs))
    ).collect()
    deg = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in pairs:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    ref = np.corrcoef(xs, ys)[0, 1]
    assert abs(r["assortativity"] - ref) < 1e-9


def test_cronbach_alpha_reference(spark):
    from movie_rankings_spark.operators.disttests import cronbach_alpha

    rng = np.random.default_rng(3)
    latent = rng.integers(0, 100, size=400)
    items = np.stack(
        [latent + rng.integers(0, 30, size=400) for _ in range(3)], axis=1
    )
    df = spark.createDataFrame(
        [tuple(int(x) for x in row) for row in items],
        "a int, b int, c int",
    )
    [r] = cronbach_alpha(
        df, [F.col("a"), F.col("b"), F.col("c")]
    ).collect()
    k = 3
    iv = items.var(axis=0, ddof=1).sum()
    tv = items.sum(axis=1).var(ddof=1)
    ref = k / (k - 1) * (1 - iv / tv)
    assert r["n_subjects"] == 400 and r["k_items"] == 3
    assert abs(r["sum_item_var"] - iv) < 1e-4
    assert abs(r["total_var"] - tv) < 1e-6
    assert abs(r["alpha"] - ref) < 1e-9
    assert r["alpha"] > 0.7  # strongly shared latent


def test_smd_balance_reference_and_zero(spark):
    from movie_rankings_spark.operators.causal import smd_balance

    rng = np.random.default_rng(5)
    rows = []
    for i in range(300):
        t = int(i % 2)
        a = int(rng.integers(0, 100) + (20 if t else 0))  # imbalanced
        b = int(rng.integers(50, 60))  # balanced
        rows.append((t, a, b))
    df = spark.createDataFrame(rows, "t int, a long, b long")
    out = {
        r["covariate"]: r
        for r in smd_balance(
            df, F.col("t"), {"a_cov": F.col("a"), "b_cov": F.col("b")}
        ).collect()
    }
    arr = np.array(rows)
    for name, col in (("a_cov", 1), ("b_cov", 2)):
        tvals = arr[arr[:, 0] == 1, col].astype(float)
        cvals = arr[arr[:, 0] == 0, col].astype(float)
        smd_ref = (tvals.mean() - cvals.mean()) / math.sqrt(
            (tvals.var(ddof=1) + cvals.var(ddof=1)) / 2
        )
        r = out[name]
        assert r["n_t"] == len(tvals) and r["n_c"] == len(cvals)
        assert abs(r["mean_t"] - tvals.mean()) < 1e-9
        assert abs(r["smd"] - smd_ref) < 1e-9
    assert abs(out["a_cov"]["smd"]) > 0.4
    assert abs(out["b_cov"]["smd"]) < 0.25


def test_page_trend_planted_monotone(spark):
    from movie_rankings_spark.operators.disttests import page_trend_test

    # 10 blocks, 4 treatments, value strictly increasing in j
    rows = []
    for b in range(10):
        for j in range(1, 5):
            rows.append((f"b{b}", j, float(100 * j + b)))
    df = spark.createDataFrame(rows, "blk string, j long, y double")
    [r] = page_trend_test(
        df, F.col("blk"), F.col("j"), F.col("y")
    ).collect()
    # perfect monotone: every block ranks 1..4 in j order
    # L = b * sum(j * j) = 10 * (1+4+9+16) = 300
    assert r["n_blocks"] == 10 and r["k_treatments"] == 4
    assert r["l_stat"] == 300.0
    assert r["l2_stat"] == 600
    # E[L] = 10*4*25/4 = 250; Var = 10*16*25*3/144
    assert r["e_l"] == 250.0
    var_ref = 10 * 16 * 25 * 3 / 144
    assert abs(r["var_l"] - var_ref) < 1e-12
    assert abs(r["z"] - (300 - 250) / math.sqrt(var_ref)) < 1e-12
    assert r["z"] > 5


def test_page_trend_incomplete_blocks_dropped(spark):
    from movie_rankings_spark.operators.disttests import page_trend_test

    rows = [("b0", 1, 1.0), ("b0", 2, 2.0), ("b0", 3, 3.0)]
    rows += [("b1", 1, 3.0), ("b1", 2, 2.0)]  # missing j=3 -> dropped
    df = spark.createDataFrame(rows, "blk string, j long, y double")
    [r] = page_trend_test(
        df, F.col("blk"), F.col("j"), F.col("y")
    ).collect()
    assert r["n_blocks"] == 1
    assert r["l_stat"] == 1 * 1 + 2 * 2 + 3 * 3
