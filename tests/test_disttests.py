"""KS two-sample, Mann–Whitney U, Benford audit
(operators/disttests.py): hand-computed closed forms, a brute-force
numpy cross-check with ties, and the bucketed-cumulative machinery
exercised at several bucket counts."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from movie_rankings_spark.operators.disttests import (
    BENFORD_EXPECTED,
    benford_first_digit,
    ks_two_sample,
    mannwhitney_u,
)


def _two_group_df(spark, a_vals, b_vals):
    rows = [(int(v), 1, 0) for v in a_vals] + [(int(v), 0, 1) for v in b_vals]
    return spark.createDataFrame(rows, "v long, a int, b int")


def test_ks_hand_computed(spark):
    # A = {1,2,3}, B = {2,3,4}: ECDF gap is 1/3 at v in {1,2,3};
    # smallest attaining value wins the tie-break.
    df = _two_group_df(spark, [1, 2, 3], [2, 3, 4])
    [r] = ks_two_sample(df, "v", F.col("a"), F.col("b")).collect()
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["d_num"] == 3
    assert r["at_value"] == 1
    assert abs(r["ks_d"] - 1 / 3) < 1e-15


def test_ks_identical_samples_zero(spark):
    df = _two_group_df(spark, [5, 7, 7, 9], [5, 7, 7, 9])
    [r] = ks_two_sample(df, "v", F.col("a"), F.col("b")).collect()
    assert r["d_num"] == 0 and r["ks_d"] == 0.0


def test_ks_disjoint_samples_one(spark):
    df = _two_group_df(spark, [1, 2], [10, 11, 12])
    [r] = ks_two_sample(df, "v", F.col("a"), F.col("b")).collect()
    assert r["ks_d"] == 1.0 and r["at_value"] == 2


def test_ks_brute_force_with_ties(spark):
    rng = np.random.default_rng(7)
    a = rng.integers(0, 40, size=137)
    b = rng.integers(5, 45, size=211)
    df = _two_group_df(spark, a, b)
    [r] = ks_two_sample(df, "v", F.col("a"), F.col("b")).collect()
    vs = np.unique(np.concatenate([a, b]))
    ca = np.array([(a <= v).sum() for v in vs], dtype=np.int64)
    cb = np.array([(b <= v).sum() for v in vs], dtype=np.int64)
    d = np.abs(ca * len(b) - cb * len(a))
    assert r["d_num"] == int(d.max())
    assert r["at_value"] == int(vs[d.argmax()])  # argmax = first max
    assert abs(r["ks_d"] - d.max() / (len(a) * len(b))) < 1e-15


def test_mwu_brute_force_with_ties(spark):
    rng = np.random.default_rng(11)
    a = rng.integers(0, 30, size=83)
    b = rng.integers(4, 34, size=129)
    df = _two_group_df(spark, a, b)
    [r] = mannwhitney_u(df, "v", F.col("a"), F.col("b")).collect()
    gt = (a[:, None] > b[None, :]).sum()
    eq = (a[:, None] == b[None, :]).sum()
    u_a_x2 = int(2 * gt + eq)
    na, nb, n = len(a), len(b), len(a) + len(b)
    assert (r["n_a"], r["n_b"]) == (na, nb)
    assert r["u_a_x2"] == u_a_x2
    assert r["u_b_x2"] == 2 * na * nb - u_a_x2
    _, t = np.unique(np.concatenate([a, b]), return_counts=True)
    tie_term = int((t.astype(np.int64) ** 3 - t).sum())
    assert r["tie_term"] == tie_term
    assert abs(r["rank_biserial"] - (u_a_x2 - na * nb) / (na * nb)) < 1e-12
    var = na * nb / 12.0 * ((n + 1) - tie_term / (n * (n - 1)))
    assert abs(r["z"] - (u_a_x2 - na * nb) / (2.0 * math.sqrt(var))) < 1e-12


def test_mwu_symmetric_samples(spark):
    # identical samples: U_A = U_B = n^2/2 (x2 = n^2), effect 0
    df = _two_group_df(spark, [3, 5, 5, 8], [3, 5, 5, 8])
    [r] = mannwhitney_u(df, "v", F.col("a"), F.col("b")).collect()
    assert r["u_a_x2"] == r["u_b_x2"] == 16
    assert r["rank_biserial"] == 0.0 and r["z"] == 0.0


def test_bucketed_cum_matches_across_bucket_counts(spark):
    # the bucket count must not change any answer — run the same KS
    # at 1 bucket (pure window) and many buckets (offsets dominate)
    from movie_rankings_spark.operators.disttests import _bucketed_cum2

    rng = np.random.default_rng(3)
    a = rng.integers(0, 1000, size=500)
    b = rng.integers(0, 1000, size=400)
    df = _two_group_df(spark, a, b)
    outs = []
    for k in (1, 4, 64):
        cum, n_a, n_b = _bucketed_cum2(
            df, "v", F.col("a"), F.col("b"), buckets=k
        )
        rows = sorted(
            (r["v"], r["cum_a"], r["cum_b"]) for r in cum.collect()
        )
        outs.append((n_a, n_b, rows))
    assert outs[0] == outs[1] == outs[2]


def test_benford_known_counts(spark):
    # 1, 19, 123 -> digit 1 x3; 250 -> 2; 999 -> 9; 0 and -5 dropped
    df = spark.createDataFrame(
        [(1,), (19,), (123,), (250,), (999,), (0,), (-5,)], "c long"
    )
    rows = benford_first_digit(df, F.col("c")).collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    by_d = {r["digit"]: r for r in rows}
    assert by_d[1]["observed"] == 3
    assert by_d[2]["observed"] == 1
    assert by_d[9]["observed"] == 1
    assert by_d[5]["observed"] == 0  # missing digit kept at 0
    assert all(r["total"] == 5 for r in rows)
    assert abs(by_d[1]["share"] - 0.6) < 1e-15
    assert abs(by_d[1]["dev"] - (0.6 - BENFORD_EXPECTED[1])) < 1e-15


def test_benford_expected_constants_are_log10():
    for d, e in BENFORD_EXPECTED.items():
        assert abs(e - math.log10(1 + 1 / d)) < 1e-15
    assert abs(sum(BENFORD_EXPECTED.values()) - 1.0) < 1e-12
