"""Holt-Winters fold and KS BH-FDR scan vs pure-Python references."""

import math

import pytest

from movie_rankings_spark.operators.disttests import ks_sweep_bh_fdr
from movie_rankings_spark.operators.timeseries import holt_winters_daily


def _hw_ref(xs, m=7, a=0.3, b=0.2, g=0.4):
    w1 = sum(xs[:m]) / float(m)
    w2 = sum(xs[m : 2 * m]) / float(m)
    lvl, trend = w1, (w2 - w1) / float(m)
    seas = [x - w1 for x in xs[:m]]
    out = [(lvl, trend, s, None) for s in seas]
    for t in range(m, len(xs)):
        s_tm = out[t - m][2]
        x = float(xs[t])
        nl = a * (x - s_tm) + (1.0 - a) * (lvl + trend)
        nt = b * (nl - lvl) + (1.0 - b) * trend
        ns = g * (x - nl) + (1.0 - g) * s_tm
        fitted = lvl + trend + s_tm
        out.append((nl, nt, ns, fitted))
        lvl, trend = nl, nt
    return out


def test_holt_winters_matches_reference(spark):
    # 28 days with a planted weekly shape + trend
    xs = [
        1000 + 10 * t + [300, 100, -50, -200, -100, 150, 400][t % 7]
        for t in range(28)
    ]
    rows = [(f"2024-03-{d+1:02d}", xs[d]) for d in range(28)]
    df = spark.createDataFrame(rows, "day string, cents long").select(
        "day", "cents"
    )
    from pyspark.sql import functions as F

    out = holt_winters_daily(
        df.withColumn("day", F.col("day").cast("date")), "day", F.col("cents")
    ).collect()
    ref = _hw_ref([float(x) for x in xs])
    assert len(out) == 28
    for i, r in enumerate(out):
        lvl, trend, seas, fitted = ref[i]
        assert r["hw_level"] == pytest.approx(lvl, rel=1e-12)
        assert r["hw_trend"] == pytest.approx(trend, rel=1e-12)
        assert r["hw_seasonal"] == pytest.approx(seas, rel=1e-12)
        if i < 7:
            assert r["fitted"] is None
        else:
            assert r["fitted"] == pytest.approx(fitted, rel=1e-12)
    # fitted tracks the planted weekly shape: MAE well under the
    # seasonal amplitude once the seasonals have one update cycle
    errs = [abs(r["fitted"] - r["revenue_cents"]) for r in out[14:]]
    assert sum(errs) / len(errs) < 100


def test_holt_winters_rejects_short_series(spark):
    from pyspark.sql import functions as F

    for n_days in (5, 10):  # < m and m <= n < 2m for season=7
        rows = [(f"2024-03-{d+1:02d}", 100 + d) for d in range(n_days)]
        df = (
            spark.createDataFrame(rows, "day string, cents long")
            .withColumn("day", F.col("day").cast("date"))
        )
        with pytest.raises(ValueError, match="2\\*season"):
            holt_winters_daily(df, "day", F.col("cents"))


def _ks_p(d, n_g, n_rest, k_terms=50):
    ne = n_g * n_rest / (n_g + n_rest)
    lam2 = d * d * ne
    s = 0.0
    for k in range(1, k_terms + 1):
        s += round(
            (1.0 if k % 2 == 1 else -1.0) * math.exp(-2.0 * k * k * lam2),
            8,
        )
    return min(1.0, max(0.0, 2.0 * s))


def test_ks_fdr_scan_matches_reference(spark):
    rows = (
        [("a", v % 50) for v in range(500)]  # uniform 0..49
        + [("b", (v * 7 + 3) % 50) for v in range(500)]  # same dist
        + [("c", (v % 50) + 8) for v in range(500)]  # mild shift
    )
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["group"]: r for r in ks_sweep_bh_fdr(df, "g", "v").collect()}
    assert set(out) == {"a", "b", "c"}
    # the shifted group carries the largest deviation from the rest
    assert out["c"]["ks_d"] > max(out["a"]["ks_d"], out["b"]["ks_d"])
    assert out["c"]["p_value"] <= min(
        out["a"]["p_value"], out["b"]["p_value"]
    )
    assert out["c"]["significant_05"]
    # BH mechanics: recompute from the emitted p-values
    ps = sorted((out[g]["p_value"], g) for g in out)
    m = len(ps)
    raw = [p * m / (i + 1) for i, (p, _) in enumerate(ps)]
    qs = [min(1.0, min(raw[i:])) for i in range(m)]
    for i, (p, g) in enumerate(ps):
        assert out[g]["bh_rank"] == i + 1
        assert out[g]["q_value"] == pytest.approx(qs[i], abs=1e-12)
    # p formula matches the quantized truncated series
    r = out["c"]
    assert r["p_value"] == pytest.approx(
        _ks_p(r["ks_d"], r["n_group"], 1000), abs=1e-7
    )
