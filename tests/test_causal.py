"""diff_in_diff: closed-form 2x2 DiD vs a numpy reference."""

import math

import numpy as np
import pytest

from movie_rankings_spark.operators.causal import diff_in_diff


def _np_did(rows):
    cells = {}
    for t, p, y in rows:
        cells.setdefault((t, p), []).append(y)
    means, se2s = {}, {}
    for key, ys in cells.items():
        a = np.asarray(ys, dtype=np.float64)
        means[key] = a.mean()
        se2s[key] = a.var(ddof=1) / len(a)
    did = (means[(1, 1)] - means[(1, 0)]) - (means[(0, 1)] - means[(0, 0)])
    se = math.sqrt(sum(se2s.values()))
    return did, se


def test_did_matches_numpy(spark):
    rng = np.random.default_rng(7)
    rows = []
    for t in (0, 1):
        for p in (0, 1):
            base = 100 + 40 * t + 25 * p + 30 * t * p
            for _ in range(60):
                rows.append((t, p, int(base + rng.integers(-20, 21))))
    panel = spark.createDataFrame(rows, "treated int, post int, y long")
    out = diff_in_diff(panel).collect()[0]
    did, se = _np_did(rows)
    assert out["did"] == pytest.approx(did, rel=1e-12)
    assert out["se"] == pytest.approx(se, rel=1e-12)
    assert out["z"] == pytest.approx(did / se, rel=1e-12)
    assert out["n_t_post"] == 60
    # the interaction effect (30) dominates the ±20 noise
    assert 20 < out["did"] < 40


def test_did_null_rows_excluded(spark):
    rows = [(t, p, 10 * (1 + t + p)) for t in (0, 1) for p in (0, 1)] * 3
    panel = spark.createDataFrame(
        rows + [(None, 1, 5), (1, None, 5), (1, 1, None)],
        "treated int, post int, y long",
    )
    out = diff_in_diff(panel).collect()[0]
    assert out["n_c_pre"] == 3 and out["n_t_post"] == 3
    # constant cells: DiD = (40-30)-(20-10) = 0
    assert out["did"] == pytest.approx(0.0, abs=1e-12)
    assert out["z"] is None  # zero-variance cells: se = 0, z undefined
