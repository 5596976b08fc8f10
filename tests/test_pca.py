"""Distributed covariance + PCA (operators/pca.py)."""

from __future__ import annotations

import numpy as np

from movie_rankings_spark.operators.pca import (
    covariance_cells_exact,
    covariance_cells_gemm,
    pca_components,
    pca_project,
)


def _emb_df(spark, mat):
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(mat)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _cov_from_cells(cells, d):
    m = np.zeros((d, d))
    for r in cells:
        m[r["i"], r["j"]] = r["cov"]
        m[r["j"], r["i"]] = r["cov"]
    return m


def test_exact_and_gemm_agree_with_numpy(spark):
    rng = np.random.RandomState(5)
    mat = rng.randn(300, 8).astype(np.float32)
    df = _emb_df(spark, mat)
    want = np.cov(mat.astype(np.float64).T, bias=True)
    exact = _cov_from_cells(covariance_cells_exact(df).collect(), 8)
    gemm = _cov_from_cells(covariance_cells_gemm(df).collect(), 8)
    # exact path: 2^-30 quantization floor -> ~1e-9 absolute tolerance
    assert np.abs(exact - want).max() < 5e-8
    assert np.abs(gemm - want).max() < 1e-9
    assert np.abs(exact - gemm).max() < 5e-8


def test_pca_recovers_planted_anisotropy(spark):
    rng = np.random.RandomState(9)
    n, d = 400, 12
    base = rng.randn(n, d) * 0.05
    direction = np.zeros(d)
    direction[3] = 1.0
    mat = (base + np.outer(rng.randn(n) * 2.0, direction)).astype(np.float32)
    df = _emb_df(spark, mat)
    comps, ratio = pca_components(df, k=3)
    # top component is the planted axis, variance ratio dominated by it
    assert abs(comps[0][3]) > 0.99
    assert comps[0][3] > 0  # sign convention: peak loading positive
    assert ratio[0] > 0.9
    # components orthonormal
    g = comps @ comps.T
    assert np.abs(g - np.eye(3)).max() < 1e-9


def test_pca_project_shapes_and_variance_order(spark):
    rng = np.random.RandomState(2)
    mat = (rng.randn(200, 6) * np.array([3.0, 2.0, 1.0, 0.1, 0.1, 0.1])).astype(
        np.float32
    )
    df = _emb_df(spark, mat)
    out = pca_project(df, k=3)
    pdf = out.toPandas().sort_values("vec_id")
    assert list(pdf.columns) == ["vec_id", "pc0", "pc1", "pc2"]
    assert len(pdf) == 200
    v = [pdf[f"pc{i}"].var() for i in range(3)]
    assert v[0] > v[1] > v[2]
