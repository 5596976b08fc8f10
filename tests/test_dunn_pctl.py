"""Dunn post-hoc and per-group percentiles vs numpy references."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from movie_rankings_spark.operators.disttests import dunn_posthoc
from movie_rankings_spark.operators.statistics import group_percentiles


def _midranks(vals):
    order = np.argsort(vals, kind="stable")
    ranks = np.empty(len(vals), dtype=float)
    sv = np.array(vals)[order]
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2 + 1
        i = j + 1
    return ranks


def test_dunn_matches_numpy(spark):
    rng = np.random.default_rng(1)
    g = rng.integers(0, 3, 300)
    v = rng.integers(0, 30, 300) + 5 * g  # planted location shifts
    df = spark.createDataFrame(
        [(f"g{a}", int(b)) for a, b in zip(g, v)], "g string, v long"
    )
    out = {
        (r["group_a"], r["group_b"]): r
        for r in dunn_posthoc(df, "g", "v").collect()
    }
    r = _midranks(v)
    N = len(v)
    _, t = np.unique(v, return_counts=True)
    T = float((t**3 - t).sum())
    for a in range(3):
        for b in range(a + 1, 3):
            na, nb = int((g == a).sum()), int((g == b).sum())
            mra, mrb = r[g == a].mean(), r[g == b].mean()
            var = (N * (N + 1) / 12 - T / (12 * (N - 1))) * (
                1 / na + 1 / nb
            )
            z = (mra - mrb) / np.sqrt(var)
            row = out[(f"g{a}", f"g{b}")]
            assert row["n_a"] == na and row["n_b"] == nb
            assert row["mean_rank_a"] == pytest.approx(mra, rel=1e-12)
            assert row["z"] == pytest.approx(z, rel=1e-9)
    # planted shifts: every adjacent pair differs in the right direction
    assert out[("g0", "g1")]["z"] < -2
    assert out[("g0", "g2")]["z"] < out[("g0", "g1")]["z"]


def test_group_percentiles_match_numpy(spark):
    rng = np.random.default_rng(8)
    rows = []
    for gname, scale in (("a", 100), ("b", 1000)):
        for _ in range(257):  # odd, not round — exercises rank edges
            rows.append((gname, int(rng.integers(1, scale))))
    df = spark.createDataFrame(rows, "g string, v long")
    out = {
        (r["group"], r["quantile"]): r
        for r in group_percentiles(df, "g", F.col("v")).collect()
    }
    import math

    for gname in ("a", "b"):
        vs = sorted(v for g, v in rows if g == gname)
        n = len(vs)
        for qname, num, den in (
            ("p25", 1, 4),
            ("p50", 1, 2),
            ("p75", 3, 4),
            ("p90", 9, 10),
            ("p99", 99, 100),
        ):
            k = math.ceil(num * n / den)
            row = out[(gname, qname)]
            assert row["n_group"] == n
            assert row["value_cents"] == vs[k - 1], (gname, qname)
