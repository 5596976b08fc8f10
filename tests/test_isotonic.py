"""Isotonic regression (operators/isotonic.py): hand fixtures plus a
brute-force PAVA cross-check."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from movie_rankings_spark.operators.isotonic import isotonic_fit_binned


def _pava(ns, ss):
    """Reference pool-adjacent-violators on (weight, sum) blocks."""
    blocks = [[n, s] for n, s in zip(ns, ss)]  # [weight, sum]
    out = []
    for b in blocks:
        out.append(b)
        while len(out) > 1 and (
            out[-2][1] * out[-1][0] >= out[-1][1] * out[-2][0]
        ):
            n2, s2 = out.pop()
            out[-1][0] += n2
            out[-1][1] += s2
    fit = []
    for n, s in out:
        fit += [s / n] * 0  # placeholder; expand by original blocks
    # expand: walk blocks again
    fit, i = [], 0
    for n, s in out:
        mean = s / n
        w = 0
        while w < n:
            w += ns[i]
            fit.append(mean)
            i += 1
    return fit


def test_isotonic_already_monotone(spark):
    df = spark.createDataFrame(
        [(0, 0), (0, 0), (1, 1), (1, 0), (2, 1), (2, 1)],
        "b int, y long",
    )
    rows = isotonic_fit_binned(df, F.col("b"), F.col("y"), 3).collect()
    assert [r["isotonic_y"] for r in rows] == [0.0, 0.5, 1.0]
    assert [r["mean_y"] for r in rows] == [0.0, 0.5, 1.0]


def test_isotonic_pools_violators(spark):
    # means [1.0, 0.0] -> pooled to [0.5, 0.5]
    df = spark.createDataFrame(
        [(0, 1), (1, 0)], "b int, y long"
    )
    rows = isotonic_fit_binned(df, F.col("b"), F.col("y"), 2).collect()
    assert [r["isotonic_y"] for r in rows] == [0.5, 0.5]


def test_isotonic_weighted_pool(spark):
    # bin0: 3 rows mean 1, bin1: 1 row mean 0 -> pooled (3*1+0)/4 = .75
    df = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 1), (1, 0)], "b int, y long"
    )
    rows = isotonic_fit_binned(df, F.col("b"), F.col("y"), 2).collect()
    assert [r["isotonic_y"] for r in rows] == [0.75, 0.75]


def test_isotonic_brute_force_pava(spark):
    rng = np.random.default_rng(13)
    rows = []
    for b in range(12):
        n = int(rng.integers(1, 30))
        ys = rng.integers(0, 2, size=n)
        rows += [(b, int(y)) for y in ys]
    # leave bins 4 and 9 empty
    rows = [(b if b not in (4, 9) else 11, y) for b, y in rows]
    df = spark.createDataFrame(rows, "b int, y long")
    got = isotonic_fit_binned(df, F.col("b"), F.col("y"), 12).collect()
    present = sorted({b for b, _ in rows})
    ns = [sum(1 for b, _ in rows if b == p) for p in present]
    ss = [sum(y for b, y in rows if b == p) for p in present]
    expect = _pava(ns, ss)
    assert [r["bin"] for r in got] == present
    for r, e in zip(got, expect):
        assert abs(r["isotonic_y"] - e) < 1e-12
    fit = [r["isotonic_y"] for r in got]
    assert all(a <= b + 1e-15 for a, b in zip(fit, fit[1:]))
