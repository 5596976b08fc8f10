"""Good-Turing count-of-counts, Kneser-Ney bigram LM, nDCG@k:
brute-force references."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
from pyspark.sql import functions as F


def test_good_turing_reference_unigram(spark):
    from movie_rankings_spark.operators.textops import good_turing_vocab

    # engineered counts: a:1 b:1 c:2 d:3 e:3 f:3 g:8
    text = "a b c c d d d e e e f f f " + "g " * 8
    df = spark.createDataFrame([(text.strip(),)], "text string")
    out = good_turing_vocab(df, F.col("text"), max_r=5).collect()
    rows = {r["r"]: r for r in out}
    assert rows[1]["n_r"] == 2  # a, b
    assert rows[2]["n_r"] == 1  # c
    assert rows[3]["n_r"] == 3  # d, e, f
    # r*=2*N2/N1 for r=1
    assert abs(rows[1]["r_star"] - 2 * 1 / 2) < 1e-12
    assert rows[2]["n_r_plus_1"] == 3
    assert abs(rows[2]["r_star"] - 3 * 3 / 1) < 1e-12
    n_tokens = 1 + 1 + 2 + 3 + 3 + 3 + 8
    assert rows[1]["n_tokens"] == n_tokens
    assert abs(rows[1]["p_unseen"] - 2 / n_tokens) < 1e-15


def test_good_turing_trigram_mode(spark):
    from movie_rankings_spark.operators.textops import good_turing_vocab

    docs = [("w1 w2 w3 w4",), ("w1 w2 w3 w5",)]
    df = spark.createDataFrame(docs, "text string")
    out = good_turing_vocab(df, F.col("text"), max_r=5, ngram=3).collect()
    rows = {r["r"]: r for r in out}
    # trigrams: (w1 w2 w3)x2, (w2 w3 w4)x1, (w2 w3 w5)x1
    assert rows[1]["n_r"] == 2 and rows[2]["n_r"] == 1
    assert rows[1]["n_tokens"] == 4 and rows[1]["n_types"] == 3


def _ref_kn(groups, d=0.75):
    bg_by_g = {}
    for g, text in groups:
        toks = text.split(" ")
        bg_by_g.setdefault(g, []).extend(zip(toks, toks[1:]))
    all_bg = Counter()
    for lst in bg_by_g.values():
        all_bg.update(lst)
    cv = Counter()
    n1p_v = Counter()
    n1p_w = Counter()
    for (v, w), c in all_bg.items():
        cv[v] += c
        n1p_v[v] += 1
        n1p_w[w] += 1
    n1p_all = len(all_bg)

    def logp(v, w):
        p = max(all_bg[(v, w)] - d, 0) / cv[v] + d * n1p_v[v] / cv[v] * (
            n1p_w[w] / n1p_all
        )
        return math.log(p)

    out = {}
    for g, lst in bg_by_g.items():
        s = sum(logp(v, w) for v, w in lst)
        out[g] = (len(lst), s / len(lst))
    return out


def test_kneser_ney_reference(spark):
    from movie_rankings_spark.operators.textops import (
        kneser_ney_source_scores,
    )

    rng = np.random.default_rng(5)
    vocab = [f"t{i}" for i in range(15)]
    groups = []
    for g in ("s1", "s2", "s3"):
        for _ in range(4):
            toks = rng.choice(vocab, size=40)
            groups.append((g, " ".join(toks)))
    df = spark.createDataFrame(groups, "g string, text string")
    out = {
        r["group"]: r
        for r in kneser_ney_source_scores(
            df, F.col("g"), F.col("text")
        ).collect()
    }
    ref = _ref_kn(groups)
    for g, (n, mean) in ref.items():
        assert out[g]["n_bigrams"] == n
        assert abs(out[g]["mean_logp"] - mean) < 1e-6
        assert abs(out[g]["perplexity"] - math.exp(-mean)) < 1e-3


def test_kneser_ney_fluent_beats_shuffled(spark):
    from movie_rankings_spark.operators.textops import (
        kneser_ney_source_scores,
    )

    # repetitive bigram structure vs unique-bigram noise
    fluent = " ".join(["the cat sat"] * 20)
    noise = " ".join(f"w{i} x{i}" for i in range(30))
    df = spark.createDataFrame(
        [("fluent", fluent), ("noise", noise)], "g string, text string"
    )
    out = {
        r["group"]: r
        for r in kneser_ney_source_scores(
            df, F.col("g"), F.col("text")
        ).collect()
    }
    assert out["fluent"]["mean_logp"] > out["noise"]["mean_logp"]
    assert out["fluent"]["perplexity"] < out["noise"]["perplexity"]


def test_ndcg_reference(spark):
    from movie_rankings_spark.operators.search import ndcg_at_k

    gains = [3, 1, 2, 3, 0, 1, 2, 0, 1, 3]
    rows = [(100 + i, i + 1, g) for i, g in enumerate(gains)]
    df = spark.createDataFrame(rows, "doc_id long, rank int, gain long")
    out = ndcg_at_k(df, k=10).collect()
    dcg_ref = sum(g / math.log2(d + 2) for d, g in enumerate(gains))
    idcg_ref = sum(
        g / math.log2(d + 2) for d, g in enumerate(sorted(gains, reverse=True))
    )
    assert len(out) == 10
    r = out[0]
    assert abs(r["dcg"] - dcg_ref) < 1e-9
    assert abs(r["idcg"] - idcg_ref) < 1e-9
    assert abs(r["ndcg"] - dcg_ref / idcg_ref) < 1e-12
    assert 0 < r["ndcg"] < 1


def test_ndcg_ideal_ordering_is_one(spark):
    from movie_rankings_spark.operators.search import ndcg_at_k

    gains = sorted([5, 4, 4, 3, 2], reverse=True)
    rows = [(i, i + 1, g) for i, g in enumerate(gains)]
    df = spark.createDataFrame(rows, "doc_id long, rank int, gain long")
    out = ndcg_at_k(df, k=5).collect()
    assert abs(out[0]["ndcg"] - 1.0) < 1e-12


def test_richness_estimators_reference(spark):
    from movie_rankings_spark.operators.textops import richness_estimators

    # counts: a:1 b:1 c:1 d:2 e:2 f:5  -> S=6, N1=3, N2=2, N=12
    text = "a b c d d e e f f f f f"
    df = spark.createDataFrame([(text,)], "text string")
    [r] = richness_estimators(df, F.col("text"), ngram=1).collect()
    assert (r["s_obs"], r["n1"], r["n2"], r["n_tokens"]) == (6, 3, 2, 12)
    assert abs(r["chao1"] - (6 + 9 / 4)) < 1e-12
    assert abs(r["jackknife1"] - (6 + 3 * 11 / 12)) < 1e-12
    assert abs(r["coverage"] - (1 - 3 / 12)) < 1e-15
    # no doubletons -> bias-corrected branch
    df2 = spark.createDataFrame([("x y z w w w",)], "text string")
    [r2] = richness_estimators(df2, F.col("text"), ngram=1).collect()
    assert (r2["n1"], r2["n2"]) == (3, 0)
    assert abs(r2["chao1"] - (4 + 3 * 2 / 2)) < 1e-12
