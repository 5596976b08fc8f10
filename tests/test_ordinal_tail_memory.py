"""Ordinal association (gamma/Somers/tau-b), Theil's U, Poisson rate
test, Gumbel block-maxima fit, Hurst R/S, Mahalanobis 2-D distance:
numpy/pure-python brute-force references."""

from __future__ import annotations

import datetime as dt
import itertools
import math

import numpy as np
from pyspark.sql import functions as F


def _ref_concordance(pairs):
    c = d = tx = ty = tboth = 0
    for (x1, y1), (x2, y2) in itertools.combinations(pairs, 2):
        if x1 == x2 and y1 == y2:
            tboth += 1
        elif x1 == x2:
            tx += 1
        elif y1 == y2:
            ty += 1
        elif (x1 - x2) * (y1 - y2) > 0:
            c += 1
        else:
            d += 1
    return c, d, tx, ty, tboth


def test_ordinal_association_brute_force(spark):
    from movie_rankings_spark.operators.disttests import ordinal_association

    rng = np.random.default_rng(11)
    xs = rng.integers(0, 6, size=200)
    ys = (xs + rng.integers(0, 4, size=200)) % 7  # mild association
    pairs = list(zip(xs.tolist(), ys.tolist()))
    df = spark.createDataFrame(pairs, "x long, y long")
    [r] = ordinal_association(df, F.col("x"), F.col("y")).collect()
    c, d, tx, ty, tboth = _ref_concordance(pairs)
    assert r["concordant"] == c and r["discordant"] == d
    assert r["ties_x_only"] == tx and r["ties_y_only"] == ty
    assert r["ties_both"] == tboth
    assert abs(r["gamma"] - (c - d) / (c + d)) < 1e-12
    assert abs(r["somers_d_yx"] - (c - d) / (c + d + ty)) < 1e-12
    assert abs(r["somers_d_xy"] - (c - d) / (c + d + tx)) < 1e-12
    n = len(pairs)
    n0 = n * (n - 1) / 2
    tie_x_pairs = tx + tboth
    tie_y_pairs = ty + tboth
    tau_ref = (c - d) / math.sqrt((n0 - tie_x_pairs) * (n0 - tie_y_pairs))
    assert abs(r["tau_b"] - tau_ref) < 1e-12


def test_ordinal_perfect_monotone(spark):
    from movie_rankings_spark.operators.disttests import ordinal_association

    pairs = [(i, i * 2) for i in range(30)]
    df = spark.createDataFrame(pairs, "x long, y long")
    [r] = ordinal_association(df, F.col("x"), F.col("y")).collect()
    assert r["gamma"] == 1.0 and r["somers_d_yx"] == 1.0
    assert abs(r["tau_b"] - 1.0) < 1e-12


def test_uncertainty_coefficient_reference(spark):
    from movie_rankings_spark.operators.infotheory import (
        uncertainty_coefficient,
    )

    rng = np.random.default_rng(7)
    a = rng.integers(0, 4, size=500)
    # b mostly determined by a -> U(B|A) high
    b = np.where(rng.random(500) < 0.8, a % 3, rng.integers(0, 3, 500))
    df = spark.createDataFrame(
        [(f"a{x}", f"b{y}") for x, y in zip(a.tolist(), b.tolist())],
        "r string, c string",
    )
    [r] = uncertainty_coefficient(df, "r", "c").collect()

    def ent(labels):
        _, cnt = np.unique(labels, return_counts=True)
        p = cnt / cnt.sum()
        return float(-(p * np.log(p)).sum())

    h_a, h_b = ent(a), ent(b)
    joint = ent([f"{x}|{y}" for x, y in zip(a.tolist(), b.tolist())])
    mi = h_a + h_b - joint
    assert abs(r["h_row"] - h_a) < 1e-6
    assert abs(r["h_col"] - h_b) < 1e-6
    assert abs(r["mi_nats"] - mi) < 1e-6
    assert abs(r["u_row_given_col"] - mi / h_a) < 1e-6
    assert abs(r["u_col_given_row"] - mi / h_b) < 1e-6
    # b is better predicted from a than a from b (b has fewer levels)
    assert r["u_col_given_row"] > r["u_row_given_col"]


def test_poisson_rate_reference(spark):
    from movie_rankings_spark.operators.disttests import poisson_rate_test

    rows = [(1, 0)] * 80 + [(0, 1)] * 120
    df = spark.createDataFrame(rows, "a int, b int")
    [r] = poisson_rate_test(
        df, F.col("a"), F.col("b"), 2.0, 5.0
    ).collect()
    ka, kb, ta, tb = 80, 120, 2.0, 5.0
    ra, rb = ka / ta, kb / tb
    zw = (ra - rb) / math.sqrt(ka / ta**2 + kb / tb**2)
    p0 = ta / (ta + tb)
    n = ka + kb
    zb = (ka - n * p0) / math.sqrt(n * p0 * (1 - p0))
    assert (r["k_a"], r["k_b"]) == (80, 120)
    assert abs(r["rate_a"] - ra) < 1e-12 and abs(r["rate_b"] - rb) < 1e-12
    assert abs(r["z_wald"] - zw) < 1e-12
    assert abs(r["z_binomial"] - zb) < 1e-12


def test_gumbel_block_maxima_reference(spark):
    from movie_rankings_spark.operators.timeseries import (
        EULER_GAMMA,
        SQRT6_OVER_PI,
        gumbel_block_maxima,
    )

    rng = np.random.default_rng(13)
    rows = []
    for blk in range(40):
        for i in range(10):
            rows.append((f"b{blk:02d}", int(rng.integers(1000, 100000))))
    df = spark.createDataFrame(rows, "blk string, v long")
    out = gumbel_block_maxima(
        df, F.col("blk"), F.col("v"), return_probs=(0.95, 0.99)
    ).collect()
    assert [r["prob"] for r in out] == [0.95, 0.99]
    maxima = {}
    for blk, v in rows:
        maxima[blk] = max(maxima.get(blk, 0), v)
    arr = np.array(sorted(maxima.values()), dtype=float)
    mean, sd = arr.mean(), arr.std(ddof=1)
    beta = sd * SQRT6_OVER_PI
    mu = mean - EULER_GAMMA * beta
    for r in out:
        assert r["n_blocks"] == 40
        assert abs(r["mean_max"] - mean) < 1e-7
        assert abs(r["gumbel_mu"] - mu) < 1e-6
        rl_ref = mu - beta * math.log(-math.log(r["prob"]))
        assert abs(r["return_level"] - rl_ref) < 1e-6
    # the 99% level exceeds the 95% level
    assert out[1]["return_level"] > out[0]["return_level"]


def _ref_rs(values, s):
    y = np.asarray(values, dtype=float)
    n = len(y)
    out = []
    for b in range(n // s):
        blk = y[b * s : (b + 1) * s]
        dev = blk - blk.mean()
        z = np.cumsum(dev)
        r = z.max() - z.min()
        sd = blk.std(ddof=0)
        if sd > 0:
            out.append(r / sd)
    return out


def test_hurst_rs_brute_force(spark):
    from movie_rankings_spark.operators.timeseries import hurst_rs

    rng = np.random.default_rng(3)
    n = 256
    vals = rng.integers(1000, 100000, size=n)
    d0 = dt.date(2024, 1, 1)
    df = spark.createDataFrame(
        [(d0 + dt.timedelta(days=int(i)), int(v)) for i, v in enumerate(vals)],
        "day date, cents long",
    )
    out = hurst_rs(df, "day", F.col("cents")).collect()
    assert [r["block_size"] for r in out] == [8, 16, 32, 64]
    lns, lms = [], []
    for r in out:
        refs = _ref_rs(vals, r["block_size"])
        assert r["n_blocks"] == len(refs)
        mean_ref = float(np.mean(refs))
        # DECIMAL(18,6) per-block quantization
        assert abs(r["mean_rs"] - mean_ref) < 1e-4
        lns.append(math.log(r["block_size"]))
        lms.append(math.log(mean_ref))
    k = len(lns)
    sx, sy = sum(lns), sum(lms)
    sxy = sum(a * b for a, b in zip(lns, lms))
    sxx = sum(a * a for a in lns)
    slope_ref = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert abs(out[0]["hurst"] - slope_ref) < 1e-3
    # iid integers: H should be near 0.5
    assert 0.2 < out[0]["hurst"] < 0.8


def test_mahalanobis_2d_reference(spark):
    from movie_rankings_spark.operators.causal import mahalanobis_2d

    rng = np.random.default_rng(9)
    rows = []
    for i in range(400):
        t = int(i % 2)
        a = int(rng.integers(0, 1000) + (150 if t else 0))
        b = int(a // 3 + rng.integers(0, 200))  # correlated with a
        rows.append((t, a, b))
    df = spark.createDataFrame(rows, "t int, a long, b long")
    [r] = mahalanobis_2d(
        df, F.col("t"), F.col("a"), F.col("b")
    ).collect()
    arr = np.array(rows, dtype=float)
    tv, cv = arr[arr[:, 0] == 1, 1:], arr[arr[:, 0] == 0, 1:]
    nt, nc = len(tv), len(cv)
    st, sc = np.cov(tv.T, ddof=1), np.cov(cv.T, ddof=1)
    pooled = ((nt - 1) * st + (nc - 1) * sc) / (nt + nc - 2)
    delta = tv.mean(axis=0) - cv.mean(axis=0)
    d2_ref = float(delta @ np.linalg.inv(pooled) @ delta)
    assert r["n_t"] == nt and r["n_c"] == nc
    assert abs(r["delta_a"] - delta[0]) < 1e-9
    assert abs(r["pooled_var_a"] - pooled[0, 0]) < 1e-6
    assert abs(r["pooled_cov_ab"] - pooled[0, 1]) < 1e-6
    assert abs(r["d2"] - d2_ref) < 1e-9 * max(d2_ref, 1.0)
    assert abs(r["d"] - math.sqrt(d2_ref)) < 1e-9
