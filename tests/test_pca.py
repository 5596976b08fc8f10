"""Distributed covariance + PCA (operators/pca.py)."""

from __future__ import annotations

import numpy as np

from movie_rankings_spark.operators.pca import (
    covariance_cells_exact,
    covariance_cells_gemm,
    pca_components,
    pca_power_exact,
    pca_power_oracle_sql,
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


def test_pca_power_exact_matches_eigh_axes(spark):
    """The integer power-iteration tier recovers LAPACK's top axes on
    a planted-anisotropy corpus, and its projections are exact ints."""
    rng = np.random.RandomState(11)
    n, d = 300, 10
    mat = (
        rng.randn(n, d) * 0.05
        + np.outer(rng.randn(n) * 2.0, np.eye(d)[2])
        + np.outer(rng.randn(n) * 1.0, np.eye(d)[7])
    ).astype(np.float32)
    df = _emb_df(spark, mat)
    out = pca_power_exact(df, k=2, iters=8, squarings=6)
    pdf = out.toPandas().sort_values("vec_id")
    assert list(pdf.columns) == ["vec_id", "pc0_q", "pc1_q"]
    assert len(pdf) == n
    # reference spectrum of the same quantized scatter matrix
    xq = np.floor(mat.astype(np.float64) * 2**30)
    s = n * (xq.T @ xq) - np.outer(xq.sum(0), xq.sum(0))
    vals, vecs = np.linalg.eigh(s)
    order = np.argsort(vals)[::-1]
    for c in range(2):
        proj = pdf[f"pc{c}_q"].to_numpy(dtype=np.float64)
        want = xq @ vecs[:, order[c]]
        cos = abs(np.dot(proj, want) / (np.linalg.norm(proj) * np.linalg.norm(want)))
        assert cos > 0.9999, f"component {c}: |cos|={cos}"


def test_pca_power_exact_near_degenerate_rayleigh(spark):
    """On a near-isotropic corpus (the embeddings table's regime,
    λ₂/λ₁ ≈ 0.99) the squared-spectrum iteration still lands on the
    true top eigenvectors: Rayleigh quotient within 1e-6 of λ."""
    rng = np.random.RandomState(3)
    mat = rng.randn(250, 8).astype(np.float32) * 0.1
    df = _emb_df(spark, mat)
    n = 250
    xq = np.floor(mat.astype(np.float64) * 2**30)
    s = n * (xq.T @ xq) - np.outer(xq.sum(0), xq.sum(0))
    from movie_rankings_spark.operators.pca import _power_components

    comps = _power_components(
        [[int(s[i, j]) for j in range(8)] for i in range(8)], 2, 8, 6
    )
    vals = np.sort(np.linalg.eigvalsh(s))[::-1]
    for c in range(2):
        v = np.array(comps[c], dtype=np.float64)
        v /= np.linalg.norm(v)
        assert v @ s @ v > (1 - 1e-6) * vals[c]


def test_pca_power_oracle_matches_engine(spark):
    """Value-level engine↔DuckDB parity of the full unrolled twin on a
    small random corpus (the registered query repeats this at sf0.01
    via the oracle harness)."""
    import duckdb

    rng = np.random.RandomState(7)
    mat = (rng.randn(60, 6) * 0.2).astype(np.float32)
    df = _emb_df(spark, mat)
    got = (
        pca_power_exact(df, k=2, iters=8, squarings=6)
        .orderBy("vec_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register(
        "embeddings",
        __import__("pandas").DataFrame(
            {"vec_id": range(60), "embedding": [list(map(float, r)) for r in mat]}
        ),
    )
    ora = con.execute(pca_power_oracle_sql(2, 8, 6)).df()
    assert len(ora) == len(got) == 60
    for c in range(2):
        assert (
            got[f"pc{c}_q"].to_numpy(dtype="int64")
            == ora[f"pc{c}_q"].to_numpy(dtype="int64")
        ).all()


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
