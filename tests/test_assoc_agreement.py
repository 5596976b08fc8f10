"""Bartlett variance-homogeneity, Fleiss' kappa, Cramér's V
(operators/disttests.py, operators/statistics.py): hand-computed and
numpy brute-force references, plus the degenerate-group exclusion
contracts."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from movie_rankings_spark.operators.disttests import (
    bartlett_test,
    fleiss_kappa,
)
from movie_rankings_spark.operators.statistics import cramers_v


def _grouped_df(spark, groups):
    rows = [
        (name, int(v)) for name, vals in groups.items() for v in vals
    ]
    return spark.createDataFrame(rows, "g string, v long")


def _ref_bartlett(groups):
    arrays = [np.asarray(v, dtype=np.float64) for v in groups.values()]
    ns = [len(a) for a in arrays]
    variances = [a.var(ddof=1) for a in arrays]
    k = len(arrays)
    sw = sum(ns) - k
    sp2 = sum((n - 1) * v for n, v in zip(ns, variances)) / sw
    num = sw * math.log(sp2) - sum(
        (n - 1) * math.log(v) for n, v in zip(ns, variances)
    )
    c = 1 + (sum(1 / (n - 1) for n in ns) - 1 / sw) / (3 * (k - 1))
    return num / c, sp2, c


def test_bartlett_brute_force(spark):
    rng = np.random.default_rng(11)
    groups = {
        "a": rng.integers(0, 50, size=40),
        "b": rng.integers(10, 200, size=55),
        "c": rng.integers(0, 20, size=33),
    }
    out = bartlett_test(
        _grouped_df(spark, groups), F.col("g"), F.col("v")
    ).collect()
    assert [r["group"] for r in out] == ["a", "b", "c"]
    chi_ref, sp2_ref, c_ref = _ref_bartlett(groups)
    r = out[0]
    assert r["k_groups"] == 3 and r["n_total"] == 128
    assert abs(r["pooled_var"] - sp2_ref) < 1e-6 * sp2_ref
    assert abs(r["c_factor"] - c_ref) < 1e-9
    assert abs(r["chi2"] - chi_ref) < 1e-5
    for row, (name, vals) in zip(out, sorted(groups.items())):
        ref_var = np.asarray(vals, dtype=np.float64).var(ddof=1)
        assert abs(row["var_group"] - ref_var) < 1e-9 * max(ref_var, 1.0)


def test_bartlett_excludes_degenerate_groups(spark):
    groups = {
        "ok1": [1, 5, 9, 14],
        "ok2": [2, 2, 7, 11, 30],
        "single": [3],  # n < 2: dropped
        "flat": [4, 4, 4],  # zero variance: dropped
    }
    out = bartlett_test(
        _grouped_df(spark, groups), F.col("g"), F.col("v")
    ).collect()
    assert [r["group"] for r in out] == ["ok1", "ok2"]
    assert out[0]["k_groups"] == 2 and out[0]["n_total"] == 9
    chi_ref, _, _ = _ref_bartlett({k: groups[k] for k in ("ok1", "ok2")})
    assert abs(out[0]["chi2"] - chi_ref) < 1e-8


def _ref_fleiss(mat):
    n_items, n = mat.shape
    cats = np.unique(mat)
    nij = np.stack([(mat == c).sum(axis=1) for c in cats], axis=1)
    p_i = ((nij**2).sum(axis=1) - n) / (n * (n - 1))
    p_bar = p_i.mean()
    p_j = nij.sum(axis=0) / (n_items * n)
    p_e = (p_j**2).sum()
    return (p_bar - p_e) / (1 - p_e), p_bar, p_e


def test_fleiss_kappa_brute_force_binary(spark):
    rng = np.random.default_rng(5)
    mat = rng.integers(0, 2, size=(200, 3))
    df = spark.createDataFrame(
        [tuple(int(x) for x in row) for row in mat],
        "r0 int, r1 int, r2 int",
    )
    [r] = fleiss_kappa(
        df, [F.col("r0"), F.col("r1"), F.col("r2")]
    ).collect()
    k_ref, pbar_ref, pe_ref = _ref_fleiss(mat)
    assert r["n_items"] == 200 and r["n_raters"] == 3
    assert abs(r["p_bar"] - pbar_ref) < 1e-12
    assert abs(r["p_e"] - pe_ref) < 1e-9
    assert abs(r["kappa"] - k_ref) < 1e-9


def test_fleiss_kappa_multicategory_and_perfect(spark):
    # 4 raters, 3 categories
    rng = np.random.default_rng(9)
    mat = rng.integers(0, 3, size=(150, 4))
    df = spark.createDataFrame(
        [tuple(int(x) for x in row) for row in mat],
        "r0 int, r1 int, r2 int, r3 int",
    )
    cols = [F.col(f"r{i}") for i in range(4)]
    [r] = fleiss_kappa(df, cols).collect()
    k_ref, _, _ = _ref_fleiss(mat)
    assert abs(r["kappa"] - k_ref) < 1e-9
    # perfect agreement (mixed margins) -> kappa == 1
    agree = np.tile(rng.integers(0, 3, size=(60, 1)), (1, 4))
    df2 = spark.createDataFrame(
        [tuple(int(x) for x in row) for row in agree],
        "r0 int, r1 int, r2 int, r3 int",
    )
    [r2] = fleiss_kappa(df2, cols).collect()
    assert abs(r2["kappa"] - 1.0) < 1e-12


def test_fleiss_kappa_requires_two_raters(spark):
    df = spark.createDataFrame([(1,)], "r0 int")
    with pytest.raises(ValueError):
        fleiss_kappa(df, [F.col("r0")])


def _ref_cramers_v(pairs):
    rows = sorted({r for r, _ in pairs})
    cols = sorted({c for _, c in pairs})
    obs = np.zeros((len(rows), len(cols)))
    for r, c in pairs:
        obs[rows.index(r), cols.index(c)] += 1
    n = obs.sum()
    e = obs.sum(axis=1, keepdims=True) * obs.sum(axis=0, keepdims=True) / n
    chi2 = ((obs - e) ** 2 / e).sum()
    phi2 = chi2 / n
    v = math.sqrt(phi2 / (min(len(rows), len(cols)) - 1))
    r_, c_ = len(rows), len(cols)
    phi2c = max(0.0, phi2 - (r_ - 1) * (c_ - 1) / (n - 1))
    rc = r_ - (r_ - 1) ** 2 / (n - 1)
    cc = c_ - (c_ - 1) ** 2 / (n - 1)
    vc = math.sqrt(phi2c / (min(rc, cc) - 1))
    return chi2, v, vc


def test_cramers_v_brute_force(spark):
    rng = np.random.default_rng(3)
    # correlated categoricals: c leans toward r
    rs = rng.integers(0, 4, size=500)
    cs = np.where(rng.random(500) < 0.6, rs % 3, rng.integers(0, 3, 500))
    pairs = list(zip([f"r{x}" for x in rs], [f"c{x}" for x in cs]))
    df = spark.createDataFrame(pairs, "a string, b string")
    [r] = cramers_v(df, "a", "b").collect()
    chi_ref, v_ref, vc_ref = _ref_cramers_v(pairs)
    assert r["n_obs"] == 500
    assert (r["r_levels"], r["c_levels"]) == (4, 3)
    assert r["df"] == 6
    assert abs(r["chi2"] - chi_ref) < 1e-7
    assert abs(r["cramers_v"] - v_ref) < 1e-9
    assert abs(r["cramers_v_corrected"] - vc_ref) < 1e-9


def test_cramers_v_independence_near_zero_and_identity_one(spark):
    # identical columns -> V == 1 exactly
    vals = [(f"k{i % 5}", f"k{i % 5}") for i in range(100)]
    df = spark.createDataFrame(vals, "a string, b string")
    [r] = cramers_v(df, "a", "b").collect()
    assert abs(r["cramers_v"] - 1.0) < 1e-12
