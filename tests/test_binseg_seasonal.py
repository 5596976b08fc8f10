"""Binary-segmentation change-point scan and classical seasonal
decomposition (operators/timeseries.py): numpy brute-force references
over synthetic daily series with planted level shifts / weekly
shapes."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from movie_rankings_spark.operators.timeseries import (
    binseg_changepoint,
    seasonal_decompose_daily,
)


def _daily_df(spark, values, start="2024-01-01"):
    d0 = dt.date.fromisoformat(start)
    rows = [
        (d0 + dt.timedelta(days=i), int(v)) for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "day date, cents long")


def _ref_binseg(values):
    y = np.asarray(values, dtype=np.float64)
    n = len(y)
    s = y.sum()
    gains = []
    for k in range(1, n):
        sk = y[:k].sum()
        g = sk * sk / k + (s - sk) ** 2 / (n - k) - s * s / n
        gains.append((g, k))
    gains.sort(key=lambda t: (-t[0], t[1]))
    return gains


def test_binseg_planted_shift(spark):
    vals = [100] * 20 + [500] * 20
    df = _daily_df(spark, vals)
    out = binseg_changepoint(df, "day", F.col("cents"), top_k=3).collect()
    ref = _ref_binseg(vals)
    # the best split is exactly at the boundary (k=20)
    assert out[0]["rank"] == 1 and out[0]["k_left"] == 20
    assert out[0]["split_day"] == "2024-01-20"
    assert abs(out[0]["gain"] - ref[0][0]) < 1e-6
    assert abs(out[0]["mean_left"] - 100.0) < 1e-12
    assert abs(out[0]["mean_right"] - 500.0) < 1e-12
    for row, (g_ref, k_ref) in zip(out, ref[:3]):
        assert row["k_left"] == k_ref
        assert abs(row["gain"] - g_ref) < 1e-6


def test_binseg_brute_force_random(spark):
    rng = np.random.default_rng(17)
    vals = rng.integers(50, 5000, size=60)
    df = _daily_df(spark, vals)
    out = binseg_changepoint(df, "day", F.col("cents"), top_k=5).collect()
    ref = _ref_binseg(vals)
    assert len(out) == 5
    for row, (g_ref, k_ref) in zip(out, ref[:5]):
        assert row["k_left"] == k_ref
        assert abs(row["gain"] - g_ref) < 1e-4 * max(abs(g_ref), 1.0)
    assert out[0]["n_days"] == 60
    assert out[0]["total_cents"] == int(vals.sum())


def _ref_decompose(values, period=7):
    y = np.asarray(values, dtype=np.float64)
    n = len(y)
    half = period // 2
    trend = np.full(n, np.nan)
    for i in range(half, n - half):
        trend[i] = y[i - half : i + half + 1].mean()
    det = y - trend
    pos = np.arange(n) % period  # start date chosen so epoch pos == idx pos
    m = np.array(
        [np.nanmean(det[pos == p]) for p in range(period)], dtype=np.float64
    )
    # engine normalizes by the COUNT-WEIGHTED global detrended mean
    seas = m - np.nanmean(det)
    return trend, seas, pos


def test_seasonal_decompose_planted_weekly(spark):
    rng = np.random.default_rng(23)
    weekly = np.array([0, 50, 100, 150, 100, 50, 0])
    n = 70
    base = 1000 + 5 * np.arange(n)
    vals = (base + np.tile(weekly, n // 7)).astype(int)
    # 1970-01-01 + k*7 days keeps epoch pos aligned with index pos
    df = _daily_df(spark, vals, start="2024-01-08")
    out = seasonal_decompose_daily(
        df, "day", F.col("cents"), period=7
    ).collect()
    assert len(out) == n
    # epoch anchor: 2024-01-08 is 19730 days after 1970-01-01; 19730%7 = 4
    offset = (dt.date(2024, 1, 8) - dt.date(1970, 1, 1)).days % 7
    trend_ref, seas_ref_by_pos, _ = _ref_decompose(vals)
    for i, row in enumerate(out):
        if 3 <= i < n - 3:
            assert abs(row["trend"] - trend_ref[i]) < 1e-9
        else:
            assert row["trend"] is None and row["resid"] is None
        assert row["pos"] == (offset + i) % 7
        # seasonal indexed by the REFERENCE position (i % 7)
        assert abs(row["seasonal"] - seas_ref_by_pos[i % 7]) < 1e-6
    # seasonal sums to ~0 across the 7 positions, COUNT-weighted
    cnt = {p: 0 for p in range(7)}
    sv = {}
    for i, row in enumerate(out):
        if 3 <= i < n - 3:
            cnt[row["pos"]] += 1
            sv[row["pos"]] = row["seasonal"]
    assert abs(sum(sv[p] * cnt[p] for p in sv)) < 1e-5
    # residuals should be small for a clean planted series
    mid = [abs(r["resid"]) for i, r in enumerate(out) if 3 <= i < n - 3]
    assert max(mid) < 60  # trend MA bleeds a bounded amount


def test_seasonal_decompose_brute_force_random(spark):
    rng = np.random.default_rng(31)
    vals = rng.integers(100, 10000, size=45)
    df = _daily_df(spark, vals, start="2024-03-04")
    out = seasonal_decompose_daily(
        df, "day", F.col("cents"), period=7
    ).collect()
    n = len(vals)
    trend_ref, _, _ = _ref_decompose(vals)
    offset = (dt.date(2024, 3, 4) - dt.date(1970, 1, 1)).days % 7
    # recompute seasonal by ENGINE position (epoch-anchored)
    det = np.asarray(vals, dtype=np.float64) - trend_ref
    pos_engine = (offset + np.arange(n)) % 7
    m = np.array(
        [np.nanmean(det[pos_engine == p]) for p in range(7)],
        dtype=np.float64,
    )
    seas = m - np.nanmean(det)
    for i, row in enumerate(out):
        if 3 <= i < n - 3:
            assert abs(row["trend"] - trend_ref[i]) < 1e-9
            resid_ref = det[i] - seas[pos_engine[i]]
            assert abs(row["resid"] - resid_ref) < 1e-6
        assert abs(row["seasonal"] - seas[pos_engine[i]]) < 1e-6
        assert row["revenue_cents"] == int(vals[i])


def test_seasonal_decompose_rejects_even_period(spark):
    """Even periods would make the count==period guard in the centered
    rows(-p//2, p//2) window unsatisfiable and silently return an
    empty frame (ADVICE r7) — they must be rejected loudly."""
    import pytest

    df = _daily_df(spark, range(40))
    for bad in (12, 30, 2, 1, 0, -7):
        with pytest.raises(ValueError, match="odd"):
            seasonal_decompose_daily(df, "day", F.col("cents"), period=bad)
