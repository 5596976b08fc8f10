"""logreg_train vs a numpy single-node reference: same trajectory
within float-reduce tolerance; loss decreases; learns a separable
rule."""

from __future__ import annotations

import numpy as np
import pytest

from movie_rankings_spark.operators.mlgd import (
    logreg_train,
    logreg_train_history_df,
)


def _ref_gd(X, y, lr, iters):
    Xb = np.hstack([np.ones((len(X), 1)), X])
    w = np.zeros(Xb.shape[1])
    hist = []
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-Xb @ w))
        g = Xb.T @ (p - y) / len(y)
        w = w - lr * g
        loss = float(np.mean(-y * np.log(p) - (1 - y) * np.log(1 - p)))
        hist.append((loss, w.copy()))
    return w, hist


@pytest.fixture(scope="module")
def toy(spark):
    rng = np.random.default_rng(11)
    X = rng.normal(size=(400, 2))
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(float)
    df = spark.createDataFrame(
        [(float(a), float(b), float(t)) for (a, b), t in zip(X, y)],
        "x1 double, x2 double, y double",
    )
    return X, y, df


def test_matches_numpy_reference(toy):
    X, y, df = toy
    w, hist = logreg_train(df, "y", ["x1", "x2"], lr=0.5, iters=10)
    w_ref, hist_ref = _ref_gd(X, y, 0.5, 10)
    assert np.allclose(w, w_ref, atol=1e-8)
    assert np.allclose([h["loss"] for h in hist], [l for l, _ in hist_ref], atol=1e-8)


def test_loss_decreases_and_separates(toy):
    X, y, df = toy
    w, hist = logreg_train(df, "y", ["x1", "x2"], lr=0.5, iters=20)
    losses = [h["loss"] for h in hist]
    assert losses[-1] < losses[0] * 0.8
    # learned direction matches the generating rule (x1 + 0.5 x2)
    assert w[1] > 0 and w[2] > 0 and w[1] > w[2]


def test_history_df_schema(toy):
    _, _, df = toy
    out = logreg_train_history_df(df, "y", ["x1", "x2"], iters=3)
    assert out.columns == ["iter", "loss", "w0", "w1", "w2"]
    assert out.count() == 3


def _ref_fixedpoint(X_int, y_int, iters):
    """Pure-Python exact-integer reference of the r9 fixed-point
    hard-sigmoid trainer (FS grid 1e6, lr=1/2, shifted floor
    divisions)."""
    from movie_rankings_spark.operators.mlgd import FS, _SHIFT_K

    n = len(y_int)
    rows = [[FS, *x] for x in X_int]
    d = len(rows[0])
    w = [0] * d
    div = 2 * n * FS
    hist = []
    for it in range(1, iters + 1):
        gs = [0] * d
        mae = 0
        for x, y in zip(rows, y_int):
            z = sum(wj * xj for wj, xj in zip(w, x))
            t = max(0, min(4 * FS * FS, z + 2 * FS * FS))
            err = t // (4 * FS) - y * FS
            mae += abs(err)
            for j in range(d):
                gs[j] += err * x[j]
        w = [
            wj - ((g + _SHIFT_K * div) // div - _SHIFT_K)
            for wj, g in zip(w, gs)
        ]
        hist.append((it, mae, *w))
    return hist


def test_fixedpoint_matches_integer_reference_exactly(spark):
    """The r9 exact trainer must equal the single-node integer
    reference BIT-FOR-BIT (no tolerance — that is its whole point),
    and the error mass must shrink on a separable toy set."""
    from movie_rankings_spark.operators.mlgd import (
        FS,
        logreg_train_fixedpoint,
    )

    rng = np.random.default_rng(11)
    X = rng.integers(0, 2 * FS, size=(120, 2)).tolist()
    y = [int(a + b > 2 * FS) for a, b in X]
    df = spark.createDataFrame(
        [(int(t), int(a), int(b)) for (a, b), t in zip(X, y)],
        "y long, xa long, xb long",
    )
    got = [
        tuple(r)
        for r in logreg_train_fixedpoint(df, "y", ["xa", "xb"], iters=8)
        .orderBy("iter")
        .collect()
    ]
    ref = _ref_fixedpoint(X, y, 8)
    assert got == ref
    assert got[-1][1] < got[0][1]  # abs_err_sum_q shrinks
    # bit-determinism across runs
    again = [
        tuple(r)
        for r in logreg_train_fixedpoint(df, "y", ["xa", "xb"], iters=8)
        .orderBy("iter")
        .collect()
    ]
    assert got == again
