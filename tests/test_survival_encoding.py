"""Kaplan–Meier (operators/survival.py), randomization test
(operators/disttests.py), naive-Bayes training (operators/nbayes.py),
and LOO target encoding (operators/encoding.py): hand-computed
textbook fixtures plus numpy/brute-force cross-checks."""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import functions as F

from movie_rankings_spark.operators.disttests import randomization_test
from movie_rankings_spark.operators.encoding import target_encode_loo
from movie_rankings_spark.operators.nbayes import nb_train
from movie_rankings_spark.operators.survival import kaplan_meier


# --- Kaplan-Meier -----------------------------------------------------------


def test_km_textbook_fixture(spark):
    # durations (event=1 death, 0 censored):
    # t=1 d=1 (n=5) -> S=4/5; t=2 censored (leaves risk set, no step);
    # t=3 d=1 (n=3) -> S=4/5*2/3; t=4 d=1 (n=2) -> S=4/5*2/3*1/2
    subj = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 1), (4, 1), (5, 0)],
        "duration long, event int",
    )
    rows = kaplan_meier(subj).collect()
    assert [(r["duration"], r["n_at_risk"], r["n_events"]) for r in rows] == [
        (1, 5, 1),
        (3, 3, 1),
        (4, 2, 1),
    ]
    s = [r["survival"] for r in rows]
    assert s[0] == 4.0 / 5.0
    assert s[1] == (4.0 / 5.0) * (2.0 / 3.0)
    assert s[2] == ((4.0 / 5.0) * (2.0 / 3.0)) * (1.0 / 2.0)


def test_km_no_censoring_matches_ecdf_complement(spark):
    # without censoring S(t) = 1 - ECDF(t) exactly (product telescopes)
    rng = np.random.default_rng(11)
    d = rng.integers(1, 20, size=200)
    subj = spark.createDataFrame(
        [(int(t), 1) for t in d], "duration long, event int"
    )
    rows = kaplan_meier(subj).collect()
    n = len(d)
    for r in rows:
        expect = (d > r["duration"]).sum() / n
        assert abs(r["survival"] - expect) < 1e-12


def test_km_ties_and_same_step_censoring(spark):
    # censored AT an event time stays at risk for that step
    subj = spark.createDataFrame(
        [(2, 1), (2, 1), (2, 0), (5, 1)], "duration long, event int"
    )
    rows = kaplan_meier(subj).collect()
    assert [(r["duration"], r["n_at_risk"], r["n_events"], r["n_censored"])
            for r in rows] == [(2, 4, 2, 1), (5, 1, 1, 0)]
    assert rows[0]["survival"] == 2.0 / 4.0
    assert rows[1]["survival"] == (2.0 / 4.0) * 0.0


# --- randomization test -----------------------------------------------------


def _md5_bit(key: str, seed: int) -> int:
    chunk = 1 if seed <= 32 else 2
    h = hashlib.md5(f"{key}:{chunk}".encode()).hexdigest()
    return ord(h[(seed - 1) % 32]) % 2


def test_randtest_matches_python_replay(spark):
    rng = np.random.default_rng(3)
    vals = rng.integers(100, 999, size=120)
    grp = rng.integers(0, 2, size=120)
    rows = [(i, int(v), int(g), 1 - int(g)) for i, (v, g) in
            enumerate(zip(vals, grp))]
    df = spark.createDataFrame(rows, "k long, v long, a int, b int")
    [r] = randomization_test(
        df, F.col("k"), F.col("v"), F.col("a"), F.col("b"), n_perm=16
    ).collect()
    t_obs = vals[grp == 1].mean() - vals[grp == 0].mean()
    assert abs(r["t_obs"] - t_obs) < 1e-9
    extreme = 0
    for s in range(1, 17):
        g2 = np.array([_md5_bit(str(k), s) for k in range(120)])
        t_s = vals[g2 == 1].mean() - vals[g2 == 0].mean()
        if abs(t_s) >= abs(t_obs):
            extreme += 1
    assert r["n_extreme"] == extreme
    assert r["p_value"] == (1.0 + extreme) / 17.0


def test_randtest_identical_groups_high_p(spark):
    # same value everywhere -> every replicate ties the observed 0 gap
    rows = [(i, 500, i % 2, 1 - i % 2) for i in range(40)]
    df = spark.createDataFrame(rows, "k long, v long, a int, b int")
    [r] = randomization_test(
        df, F.col("k"), F.col("v"), F.col("a"), F.col("b"), n_perm=8
    ).collect()
    assert r["t_obs"] == 0.0 and r["p_value"] == 1.0


# --- naive Bayes ------------------------------------------------------------


def test_nb_train_hand_counts(spark):
    df = spark.createDataFrame(
        [("en", "the cat"), ("en", "the dog"), ("fr", "le chat")],
        "lang string, text string",
    )
    rows = nb_train(
        df, F.col("lang"), F.split(F.col("text"), " ")
    ).collect()
    by = {(r["class"], r["token"]): r for r in rows}
    # full 2x6 grid (vocab = the,cat,dog,le,chat)
    assert len(rows) == 2 * 5
    r = by[("en", "the")]
    # P(the|en) = (2+1)/(4+5); rest: (0+1)/(2+5)
    assert r["n_wc"] == 2 and r["total_c"] == 4 and r["vocab_size"] == 5
    assert r["p_w_class"] == 3.0 / 9.0
    assert r["p_w_rest"] == 1.0 / 7.0
    assert r["likelihood_ratio"] == (3.0 / 9.0) / (1.0 / 7.0)
    assert r["prior_class"] == 2.0 / 3.0
    # absent cell gets pure smoothing mass
    r0 = by[("fr", "dog")]
    assert r0["n_wc"] == 0 and r0["p_w_class"] == 1.0 / 7.0


def test_nb_probabilities_normalize(spark):
    # sum over the vocab of P(w|c) = (total_c + V... check within class:
    # sum (n_wc + 1) = total_c + V, so the smoothed conditionals sum to 1
    df = spark.createDataFrame(
        [("a", "x y z x"), ("b", "y y w"), ("a", "w x")],
        "lang string, text string",
    )
    out = nb_train(df, F.col("lang"), F.split(F.col("text"), " "))
    sums = (
        out.groupBy("class").agg(F.sum("p_w_class").alias("s")).collect()
    )
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-12


# --- LOO target encoding ----------------------------------------------------


def test_target_encode_loo_hand(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "b", 100)],
        "k long, cat string, y long",
    )
    rows = target_encode_loo(
        df, F.col("k"), F.col("cat"), F.col("y"), smoothing=2.0
    ).collect()
    by = {r["key"]: r for r in rows}
    assert by[1]["loo_mean_cents"] == (20 + 30) / 2.0
    assert by[2]["loo_mean_cents"] == (10 + 30) / 2.0
    # singleton category: raw LOO undefined, smoothed = global mean
    assert by[4]["loo_mean_cents"] is None
    gmean = (10 + 20 + 30 + 100) / 4.0
    assert by[4]["loo_smoothed_cents"] == (0.0 + 2.0 * gmean) / (0.0 + 2.0)
    assert by[1]["loo_smoothed_cents"] == (50.0 + 2.0 * gmean) / (2.0 + 2.0)


def test_target_encode_loo_mean_property(spark):
    # average of LOO encodings within a category equals the category
    # mean (each y_i subtracted exactly once across the n encodings)
    rng = np.random.default_rng(5)
    ys = rng.integers(-50, 200, size=60)
    df = spark.createDataFrame(
        [(i, "c" + str(i % 3), int(y)) for i, y in enumerate(ys)],
        "k long, cat string, y long",
    )
    rows = target_encode_loo(
        df, F.col("k"), F.col("cat"), F.col("y")
    ).collect()
    for c in range(3):
        grp = ys[np.arange(60) % 3 == c]
        got = np.mean(
            [r["loo_mean_cents"] for r in rows
             if r["category"] == "c" + str(c)]
        )
        assert abs(got - grp.mean()) < 1e-9


def _subjects(spark, rows):
    return spark.createDataFrame(rows, "duration long, event int")


def _ref_nelson_aalen(rows):
    from collections import Counter

    deaths = Counter(t for t, e in rows if e == 1)
    cens = Counter(t for t, e in rows if e == 0)
    times = sorted(set(deaths) | set(cens))
    n = len(rows)
    out = []
    h = v = 0.0
    for t in times:
        d, c = deaths.get(t, 0), cens.get(t, 0)
        h += d / n
        v += d / (n * n)
        if d > 0:
            out.append((t, n, d, c, d / n, h, v))
        n -= d + c
    return out


def test_nelson_aalen_hand_computed(spark):
    from movie_rankings_spark.operators.survival import nelson_aalen

    rows = [(2, 1), (3, 1), (3, 0), (5, 1), (7, 0), (8, 1)]
    out = nelson_aalen(_subjects(spark, rows)).collect()
    ref = _ref_nelson_aalen(rows)
    assert len(out) == len(ref)
    for r, (t, n_r, d, c, inc, h, v) in zip(out, ref):
        assert (r["duration"], r["n_at_risk"]) == (t, n_r)
        assert (r["n_events"], r["n_censored"]) == (d, c)
        assert abs(r["hazard_inc"] - inc) < 1e-10
        assert abs(r["cum_hazard"] - h) < 1e-9
        # dyadic 2^-40 floor quantization: ~9.1e-13 per increment
        assert abs(r["cum_hazard_var"] - v) < 1e-10


def test_nelson_aalen_random_brute_force(spark):
    import numpy as np

    from movie_rankings_spark.operators.survival import nelson_aalen

    rng = np.random.default_rng(13)
    rows = [
        (int(t), int(e))
        for t, e in zip(
            rng.integers(1, 40, size=300), rng.integers(0, 2, size=300)
        )
    ]
    out = nelson_aalen(_subjects(spark, rows)).collect()
    ref = _ref_nelson_aalen(rows)
    assert len(out) == len(ref)
    for r, (t, n_r, d, c, inc, h, v) in zip(out, ref):
        assert (r["duration"], r["n_at_risk"], r["n_events"]) == (t, n_r, d)
        assert abs(r["cum_hazard"] - h) < 1e-8


def _ref_logrank(rows):
    # rows: (t, e, g)
    times = sorted({t for t, e, _ in rows if e == 1})
    o1 = e1 = v = 0.0
    for t in times:
        n_tot = sum(1 for tt, _, _ in rows if tt >= t)
        n1 = sum(1 for tt, _, g in rows if tt >= t and g == 1)
        d_tot = sum(1 for tt, e, _ in rows if tt == t and e == 1)
        d1 = sum(1 for tt, e, g in rows if tt == t and e == 1 and g == 1)
        o1 += d1
        e1 += d_tot * n1 / n_tot
        if n_tot > 1:
            v += (
                d_tot
                * (n1 / n_tot)
                * ((n_tot - n1) / n_tot)
                * ((n_tot - d_tot) / (n_tot - 1))
            )
    chi2 = (o1 - e1) ** 2 / v if v > 0 else None
    return o1, e1, v, chi2


def test_logrank_identical_groups_chi2_zero(spark):
    from pyspark.sql import functions as F

    from movie_rankings_spark.operators.survival import logrank_test

    # perfectly mirrored groups -> O == E, chi2 == 0
    rows = [(t, e, g) for g in (0, 1) for t, e in [(2, 1), (4, 1), (6, 0)]]
    df = spark.createDataFrame(rows, "duration long, event int, g int")
    [r] = logrank_test(df, "duration", "event", F.col("g")).collect()
    assert r["n_1"] == 3 and r["n_2"] == 3
    assert abs(r["chi2"]) < 1e-12


def test_logrank_brute_force_random(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from movie_rankings_spark.operators.survival import logrank_test

    rng = np.random.default_rng(7)
    rows = [
        (int(t), int(e), int(g))
        for t, e, g in zip(
            rng.integers(1, 30, size=250),
            rng.integers(0, 2, size=250),
            rng.integers(0, 2, size=250),
        )
    ]
    df = spark.createDataFrame(rows, "duration long, event int, g int")
    [r] = logrank_test(df, "duration", "event", F.col("g")).collect()
    o1, e1, v, chi2 = _ref_logrank(rows)
    assert r["observed_1"] == int(o1)
    assert abs(r["expected_1"] - e1) < 1e-7
    assert abs(r["variance"] - v) < 1e-7
    assert abs(r["chi2"] - chi2) < 1e-6


def test_logrank_separated_groups_large_chi2(spark):
    from pyspark.sql import functions as F

    from movie_rankings_spark.operators.survival import logrank_test

    # group 1 all dies early, group 0 survives long
    rows = [(t, 1, 1) for t in (1, 2, 3, 4, 5)] + [
        (t, 1, 0) for t in (20, 21, 22, 23, 24)
    ]
    df = spark.createDataFrame(rows, "duration long, event int, g int")
    [r] = logrank_test(df, "duration", "event", F.col("g")).collect()
    o1, e1, v, chi2 = _ref_logrank(rows)
    # DECIMAL(18,9) term quantization bounds the drift at ~5e-10/term
    assert abs(r["chi2"] - chi2) < 1e-7
    assert r["chi2"] > 5.0


def test_logrank_requires_group_indicator(spark):
    import pytest

    from movie_rankings_spark.operators.survival import logrank_test

    df = spark.createDataFrame([(5, 1)], "duration long, event int")
    with pytest.raises(ValueError, match="group_ind"):
        logrank_test(df)
