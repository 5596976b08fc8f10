"""Yuen trimmed test, readability, Simpson diversity, Fano
burstiness, Atkinson index: brute-force references."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
from pyspark.sql import functions as F


def _ref_yuen(a_vals, b_vals, trim=0.2):
    def side(vals):
        v = np.sort(np.asarray(vals, dtype=float))
        n = len(v)
        g = int(math.floor(n * trim))
        h = n - 2 * g
        trimmed = v[g : n - g]
        tm = trimmed.mean()
        w = v.copy()
        w[:g] = v[g]
        w[n - g :] = v[n - g - 1]
        s2w = w.var(ddof=1)
        d = (n - 1) * s2w / (h * (h - 1))
        return n, g, tm, s2w, d, h

    na, ga, tma, s2a, da, ha = side(a_vals)
    nb, gb, tmb, s2b, db, hb = side(b_vals)
    t = (tma - tmb) / math.sqrt(da + db)
    df = (da + db) ** 2 / (da**2 / (ha - 1) + db**2 / (hb - 1))
    return (na, ga, tma, s2a), (nb, gb, tmb, s2b), t, df


def test_yuen_trimmed_brute_force(spark):
    from movie_rankings_spark.operators.disttests import yuen_trimmed_test

    rng = np.random.default_rng(21)
    a = rng.integers(100, 1000, size=137).tolist() + [100000, 90000]
    b = rng.integers(150, 1100, size=151).tolist() + [80000]
    rows = [(int(v), 1, 0) for v in a] + [(int(v), 0, 1) for v in b]
    df = spark.createDataFrame(rows, "v long, a int, b int")
    [r] = yuen_trimmed_test(
        df, F.col("v"), F.col("a"), F.col("b"), 0.2
    ).collect()
    (na, ga, tma, s2a), (nb, gb, tmb, s2b), t, dof = _ref_yuen(a, b)
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert (r["g_a"], r["g_b"]) == (ga, gb)
    assert abs(r["trimmed_mean_a"] - tma) < 1e-9
    assert abs(r["trimmed_mean_b"] - tmb) < 1e-9
    assert abs(r["winsor_var_a"] - s2a) < 1e-6
    assert abs(r["winsor_var_b"] - s2b) < 1e-6
    assert abs(r["t_stat"] - t) < 1e-9
    assert abs(r["df"] - dof) < 1e-9
    # outliers must NOT drag the trimmed means toward 1e5
    assert r["trimmed_mean_a"] < 2000 and r["trimmed_mean_b"] < 2000


def test_yuen_no_trim_equals_welch_t(spark):
    from movie_rankings_spark.operators.disttests import (
        welch_t_test,
        yuen_trimmed_test,
    )

    rng = np.random.default_rng(2)
    a = rng.integers(0, 500, size=40).tolist()
    b = rng.integers(100, 700, size=45).tolist()
    rows = [(int(v), 1, 0) for v in a] + [(int(v), 0, 1) for v in b]
    df = spark.createDataFrame(rows, "v long, a int, b int")
    [ry] = yuen_trimmed_test(
        df, F.col("v"), F.col("a"), F.col("b"), 0.0
    ).collect()
    [rw] = welch_t_test(
        df, F.col("v"), F.col("a"), F.col("b")
    ).collect()
    assert abs(ry["t_stat"] - rw["t_stat"]) < 1e-9
    assert abs(ry["df"] - rw["df"]) < 1e-6


def test_readability_by_group_reference(spark):
    from movie_rankings_spark.operators.textops import readability_by_group

    texts = [
        ("a", "the cat sat on the mat. it was flat!"),
        ("a", "dogs run fast. birds fly high. fish swim?"),
        ("b", "incomprehensibility characterizes bureaucratic documentation"),
    ]
    df = spark.createDataFrame(texts, "g string, text string")
    out = {r["group"]: r for r in readability_by_group(
        df, F.col("g"), F.col("text")
    ).collect()}

    import re

    def fre(text):
        w = len(text.split(" "))
        s = max(1, len(re.findall(r"[.!?]", text)))
        y = len(re.findall(r"[aeiouy]+", text.lower()))
        return 206.835 - 1.015 * (w / s) - 84.6 * (y / w), w

    fres_a = [fre(t) for g, t in texts if g == "a"]
    assert out["a"]["n_docs"] == 2
    assert out["a"]["total_words"] == sum(w for _, w in fres_a)
    assert abs(
        out["a"]["mean_fre"] - sum(f for f, _ in fres_a) / 2
    ) < 1e-6
    # simple prose reads easier than the bureaucratic line
    assert out["a"]["mean_fre"] > out["b"]["mean_fre"]


def test_simpson_diversity_reference(spark):
    from movie_rankings_spark.operators.textops import (
        simpson_diversity_by_group,
    )

    texts = [
        ("uniform", "a b c d e f g h"),
        ("skewed", "x x x x x x x y"),
    ]
    df = spark.createDataFrame(texts, "g string, text string")
    out = {r["group"]: r for r in simpson_diversity_by_group(
        df, F.col("g"), F.col("text")
    ).collect()}
    u = out["uniform"]
    assert u["n_tokens"] == 8 and u["richness"] == 8
    assert u["simpson_d"] == 0.0  # all distinct: no collision
    assert abs(u["shannon_h"] - math.log(8)) < 1e-6
    assert abs(u["evenness"] - 1.0) < 1e-6
    s = out["skewed"]
    # collisions: 7*6 / (8*7) = 0.75
    assert abs(s["simpson_d"] - 0.75) < 1e-12
    p = np.array([7, 1]) / 8
    assert abs(s["shannon_h"] - float(-(p * np.log(p)).sum())) < 1e-6
    assert s["evenness"] < 0.6


def test_fano_burstiness_reference(spark):
    from movie_rankings_spark.operators.timeseries import fano_burstiness

    d0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    # steady user: 2 events every day for 10 days -> fano 0
    for i in range(10):
        for _ in range(2):
            rows.append(("steady", d0 + dt.timedelta(days=i)))
    # bursty user: 10 events on one day, 1 on each of 9 others
    rows += [("bursty", d0)] * 10
    for i in range(1, 10):
        rows.append(("bursty", d0 + dt.timedelta(days=i)))
    # thin user: below min_days
    rows += [("thin", d0 + dt.timedelta(days=i)) for i in range(3)]
    df = spark.createDataFrame(rows, "user string, ts timestamp")
    out = fano_burstiness(df, "user", "ts", min_days=5, top_k=10).collect()
    assert [r["key"] for r in out] == ["bursty", "steady"]
    b = out[0]
    counts = np.array([10] + [1] * 9, dtype=float)
    assert b["n_days"] == 10 and b["total_events"] == 19
    assert abs(b["fano"] - counts.var(ddof=1) / counts.mean()) < 1e-9
    assert out[1]["fano"] == 0.0


def test_atkinson_index_reference(spark):
    from movie_rankings_spark.operators.statistics import atkinson_index

    rng = np.random.default_rng(31)
    rows = [
        (f"k{i}", int(v))
        for i, v in enumerate(rng.integers(100, 100000, size=200))
    ]
    df = spark.createDataFrame(rows, "k string, v long")
    [r] = atkinson_index(df, F.col("k"), F.col("v")).collect()
    vals = np.array([v for _, v in rows], dtype=float)
    mean = vals.mean()
    gm = math.exp(np.log(vals).mean())
    assert r["n_keys"] == 200
    assert abs(r["mean_cents"] - mean) < 1e-9
    assert abs(r["log_gm"] - float(np.log(vals).mean())) < 1e-6
    # whole-cent floor quantization of the geometric mean
    assert abs(r["geo_mean"] - gm) < 1.0
    assert abs(r["atkinson"] - (1 - gm / mean)) < 1e-4
    assert 0 < r["atkinson"] < 1
    # equal values -> zero inequality (gm == mean up to quantization)
    df2 = spark.createDataFrame(
        [(f"k{i}", 5000) for i in range(50)], "k string, v long"
    )
    [r2] = atkinson_index(df2, F.col("k"), F.col("v")).collect()
    assert abs(r2["atkinson"]) < 1e-3
