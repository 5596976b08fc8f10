"""Dirichlet query likelihood, rank-biased overlap, Burrows' Delta:
brute-force references."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F


def _docs_df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_ql_dirichlet_reference(spark):
    from movie_rankings_spark.operators.search import ql_dirichlet_topk

    docs = [
        (1, "scan the table then filter the table"),
        (2, "scan scan scan nothing else here at all"),
        (3, "a very long document about nothing relevant " + "pad " * 30),
        (4, "table filter"),
    ]
    terms = ["scan", "table", "filter"]
    mu = 50.0
    out = ql_dirichlet_topk(
        _docs_df(spark, docs), terms, k=4, mu=mu
    ).collect()

    toks = {d: t.split(" ") for d, t in docs}
    n_tokens = sum(len(v) for v in toks.values())
    cf = {t: sum(v.count(t) for v in toks.values()) for t in terms}

    def score(d):
        dl = len(toks[d])
        return sum(
            math.log(
                (toks[d].count(t) + mu * (cf[t] / n_tokens)) / (dl + mu)
            )
            for t in terms
        )

    # candidates: docs matching >= 1 term (doc 3 matches none)
    refs = sorted(
        ((score(d), d) for d in (1, 2, 4)), key=lambda x: (-x[0], x[1])
    )
    assert [r["doc_id"] for r in out] == [d for _, d in refs]
    for r, (s_ref, d) in zip(out, refs):
        assert abs(r["score"] - s_ref) < 1e-6
    # doc 1 matches all three and is short -> top
    assert out[0]["doc_id"] == 1 and out[0]["n_terms_matched"] == 3


def _ref_rbo(list_a, list_b, p, k):
    terms = []
    for d in range(1, k + 1):
        x = len(set(list_a[:d]) & set(list_b[:d]))
        terms.append(p ** (d - 1) * x / d)
    return (1 - p) * sum(terms)


def test_rbo_identical_and_disjoint(spark):
    from movie_rankings_spark.operators.search import rbo_topk

    k = 10
    ra = spark.createDataFrame(
        [(i, i) for i in range(1, k + 1)], "doc_id long, rank int"
    )
    rb_same = spark.createDataFrame(
        [(i, i) for i in range(1, k + 1)], "doc_id long, rank int"
    )
    out = rbo_topk(ra, rb_same, p=0.9, k=k).collect()
    ref = _ref_rbo(list(range(1, 11)), list(range(1, 11)), 0.9, k)
    assert abs(out[0]["rbo"] - ref) < 1e-9
    for r in out:
        assert r["x_d"] == r["depth"] and r["agreement"] == 1.0
    rb_disj = spark.createDataFrame(
        [(100 + i, i) for i in range(1, k + 1)], "doc_id long, rank int"
    )
    out2 = rbo_topk(ra, rb_disj, p=0.9, k=k).collect()
    assert out2[0]["rbo"] == 0.0


def test_rbo_partial_overlap_brute_force(spark):
    from movie_rankings_spark.operators.search import rbo_topk

    la = [3, 1, 4, 1, 5]
    la = [3, 1, 4, 15, 5, 9, 2, 6, 8, 7]
    lb = [3, 4, 1, 5, 9, 15, 6, 2, 7, 11]
    ra = spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(la)], "doc_id long, rank int"
    )
    rb = spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(lb)], "doc_id long, rank int"
    )
    out = rbo_topk(ra, rb, p=0.9, k=10).collect()
    ref = _ref_rbo(la, lb, 0.9, 10)
    assert abs(out[0]["rbo"] - ref) < 1e-9
    for r in out:
        d = r["depth"]
        assert r["x_d"] == len(set(la[:d]) & set(lb[:d]))


def test_burrows_delta_structure(spark):
    from movie_rankings_spark.operators.textops import burrows_delta

    # three "authors": a and b share style, c is alien
    base_ab = "the of and to in that it was he for"
    docs = [
        ("a", base_ab + " cat"),
        ("a", base_ab + " dog"),
        ("b", base_ab + " bird"),
        ("b", base_ab + " fish"),
        ("c", "zz yy xx ww vv uu tt ss rr qq " * 2),
    ]
    df = spark.createDataFrame(docs, "g string, text string")
    out = burrows_delta(
        df, F.col("g"), F.col("text"), top_n_words=15
    ).collect()
    pairs = {(r["group_a"], r["group_b"]): r["delta"] for r in out}
    assert set(pairs) == {("a", "b"), ("a", "c"), ("b", "c")}
    # a-b are stylistically close; both are far from c
    assert pairs[("a", "b")] < pairs[("a", "c")]
    assert pairs[("a", "b")] < pairs[("b", "c")]


def test_burrows_delta_brute_force(spark):
    from movie_rankings_spark.operators.textops import burrows_delta

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(12)]
    groups = {}
    for g in ("g1", "g2", "g3", "g4"):
        weights = rng.dirichlet(np.ones(12))
        toks = rng.choice(vocab, size=300, p=weights)
        groups[g] = " ".join(toks)
    df = spark.createDataFrame(
        list(groups.items()), "g string, text string"
    )
    n_top = 8
    out = burrows_delta(
        df, F.col("g"), F.col("text"), top_n_words=n_top
    ).collect()

    # reference
    from collections import Counter

    counts = {g: Counter(t.split(" ")) for g, t in groups.items()}
    total = Counter()
    for c in counts.values():
        total.update(c)
    top = [
        w
        for w, _ in sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))[
            :n_top
        ]
    ]
    freqs = {
        g: np.array([counts[g][w] / 300 for w in top]) for g in groups
    }
    mat = np.stack([freqs[g] for g in sorted(groups)])
    mu = mat.mean(axis=0)
    sd = mat.std(axis=0, ddof=1)
    z = {g: (freqs[g] - mu) / sd for g in groups}
    for r in out:
        ref = float(
            np.abs(z[r["group_a"]] - z[r["group_b"]]).mean()
        )
        assert r["n_words"] == n_top
        assert abs(r["delta"] - ref) < 1e-5
