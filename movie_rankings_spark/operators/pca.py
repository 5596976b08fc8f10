"""Distributed covariance matrix + PCA over the embeddings table
(SURVEY.md §2 [EXT] embedding-transform tier, next to int8
quantization and the JL projection in operators/embeddings.py).

The training-pipeline use: estimate the d×d second-moment structure
of an embedding corpus (whitening, PCA compression, drift checks)
without ever materializing an n×d matrix in one place.

Two paths, same contract as the similarity tier:

* EXACT path (oracle-checked): posexplode each vector once, self-join
  on vec_id with j ≥ i, one shuffle keyed on the (i, j) cell, partial
  aggregation map-side, n·d(d+1)/2 rows through it. Values are
  floor-quantized to the 2⁻³⁰ integer grid FIRST: float32 inputs
  regularly land on exact decimal rounding midpoints (observed:
  0.1983642578125 — a short binary expansion IS a decimal ...5), so
  the DECIMAL(28,12) convention of functions/vectors.py hits the
  HALF_UP-vs-half-even divergence here; floor is tie-free, every
  later reduction is a scale-0 decimal (single correctly-rounded
  double cast), and the 2⁻⁶⁰ unscale is one exact-power-of-two
  division. The ~2⁻³⁰ quantization is documented operator semantics
  (precedent: time_decayed_score's micro-units).
* GEMM path (the 100 TB hot path): mapInPandas computes a PER-BATCH
  d×d partial Gram with one numpy matmul, emitting d(d+1)/2 upper
  cells per batch; the final reduce sums partitions × d² tiny rows.
  Float summation order makes it approximate at the ulp — tests pin
  it to the exact path within 1e-9.

PCA itself: the d×d covariance is broadcast-scale BY CONSTRUCTION
(d ≤ a few thousand), so eigendecomposition happens driver-side on
the collected matrix — the same justified-tiny-collect as the
similarity tier's query vectors — and the projection back over the
corpus is one Arrow-batched matmul. Components get a deterministic
sign convention (largest-|loading| coordinate positive) so results
don't flip run-to-run.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(28,12)"


#: 2^30 — the tie-free quantization grid for the exact path
_Q = 1073741824.0
#: 2^60 — unscale factor for quantized second moments
_Q2 = 1152921504606846976.0


def covariance_cells_exact(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Upper-triangle covariance cells (i ≤ j) of the 2⁻³⁰-quantized
    corpus: cov = (E[qi·qj] − E[qi]E[qj]) / 2⁶⁰ — integer reductions,
    shared double formula (the corr_price_quantity contract,
    generalized to d(d+1)/2 cells on a tie-free grid)."""
    flat = emb.select(
        F.col("vec_id"),
        F.posexplode(F.col(vec_col)).alias("i", "x"),
    ).select(
        "vec_id",
        "i",
        F.floor(F.col("x").cast("double") * _Q).cast("long").alias("q"),
    )
    a, b = flat.alias("a"), flat.alias("b")
    pairs = a.join(
        b,
        (F.col("a.vec_id") == F.col("b.vec_id")) & (F.col("a.i") <= F.col("b.i")),
    ).select(
        F.col("a.i").alias("i"),
        F.col("b.i").alias("j"),
        (F.col("a.q").cast("decimal(19,0)") * F.col("b.q"))
        .cast("decimal(38,0)")
        .alias("xy"),
    )
    cells = pairs.groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xy").cast("double").alias("sxy"),
    )
    dims = flat.groupBy("i").agg(
        F.sum(F.col("q").cast("decimal(19,0)")).cast("double").alias("sx")
    )
    out = (
        cells.join(F.broadcast(dims.withColumnRenamed("i", "di")), F.col("i") == F.col("di"))
        .withColumnRenamed("sx", "si")
        .drop("di")
        .join(F.broadcast(dims.withColumnRenamed("i", "dj")), F.col("j") == F.col("dj"))
        .withColumnRenamed("sx", "sj")
        .drop("dj")
    )
    n = F.col("n").cast("double")
    cov = (F.col("sxy") / n - (F.col("si") / n) * (F.col("sj") / n)) / _Q2
    return out.select("i", "j", "n", cov.alias("cov"))


def covariance_cells_gemm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-batch numpy Gram partials → tiny final sum. The scale path:
    shuffle volume is partitions × d(d+1)/2 cells, independent of n."""

    def partial(batches):
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            g = m.T @ m
            s = m.sum(axis=0)
            d = g.shape[0]
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    "i": iu,
                    "j": ju,
                    "n_part": np.full(iu.shape, m.shape[0], dtype=np.int64),
                    "sxy_part": g[iu, ju],
                    "si_part": s[iu],
                    "sj_part": s[ju],
                }
            )

    parts = emb.select(vec_col).mapInPandas(
        partial,
        "i int, j int, n_part long, sxy_part double, si_part double, sj_part double",
    )
    agg = parts.groupBy("i", "j").agg(
        F.sum("n_part").alias("n"),
        F.sum("sxy_part").alias("sxy"),
        F.sum("si_part").alias("si"),
        F.sum("sj_part").alias("sj"),
    )
    n = F.col("n").cast("double")
    cov = F.col("sxy") / n - (F.col("si") / n) * (F.col("sj") / n)
    return agg.select("i", "j", "n", cov.alias("cov"))


def _cov_matrix(cells) -> np.ndarray:
    d = max(r["j"] for r in cells) + 1
    m = np.zeros((d, d))
    for r in cells:
        m[r["i"], r["j"]] = r["cov"]
        m[r["j"], r["i"]] = r["cov"]
    return m


def pca_components(emb: DataFrame, k: int = 4, vec_col: str = "embedding"):
    """(components ndarray [k, d], explained_variance_ratio [k]) from
    the GEMM covariance. The d×d collect is broadcast-scale by
    construction; eigh on a symmetric matrix is deterministic on a
    given BLAS. Sign convention: per component, the largest-|loading|
    coordinate is made positive."""
    cells = covariance_cells_gemm(emb, vec_col).collect()
    cov = _cov_matrix(cells)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for c in comps:
        peak = np.argmax(np.abs(c))
        if c[peak] < 0:
            c *= -1.0
    ratio = vals[order] / vals.sum()
    return comps, ratio


def pca_project(
    emb: DataFrame, k: int = 4, vec_col: str = "embedding"
) -> DataFrame:
    """Corpus projected onto its top-k principal axes — one broadcast
    [k, d] matrix, one Arrow-batched matmul per partition."""
    comps, _ = pca_components(emb, k, vec_col)
    sc = emb.sparkSession.sparkContext
    bc = sc.broadcast(comps)

    def project(batches):
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            p = m @ bc.value.T
            out = pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy()})
            for c in range(p.shape[1]):
                out[f"pc{c}"] = p[:, c]
            yield out

    schema = "vec_id long, " + ", ".join(f"pc{c} double" for c in range(k))
    return emb.select("vec_id", vec_col).mapInPandas(project, schema)
