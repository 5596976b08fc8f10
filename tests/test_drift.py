"""JS token drift: invariants (non-negative, < ln 2, zero-ish for
identical distributions) and a planted-drift detection check."""

from __future__ import annotations

import math

from movie_rankings_spark.operators.drift import js_token_drift


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _split_side(doc_id):
    import hashlib

    b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[30:32], 16)
    return None if b < 13 else ("val" if b < 26 else "train")


def test_identical_distributions_near_zero(spark):
    # same text everywhere -> p == q exactly -> JS == 0
    rows = [(i, "alpha beta gamma") for i in range(300)]
    r = js_token_drift(_docs_df(spark, rows)).collect()[0]
    assert r["vocab_size"] == 3
    assert abs(r["js_divergence"]) < 1e-12


def test_bounded_and_nonnegative_on_corpus(spark, sf_dir):
    from movie_rankings_spark.catalog import load_table

    r = js_token_drift(load_table(spark, sf_dir, "documents")).collect()[0]
    assert 0.0 <= r["js_divergence"] < math.log(2.0)
    assert r["n_train_tokens"] > r["n_val_tokens"] > 0


def test_planted_drift_is_larger(spark):
    # baseline: shared vocab; drifted: val docs get a disjoint vocab
    ids = list(range(400))
    same = [(i, "alpha beta gamma delta") for i in ids]
    drifted = [
        (i, "zeta eta theta iota" if _split_side(i) == "val"
         else "alpha beta gamma delta")
        for i in ids
    ]
    js_same = js_token_drift(_docs_df(spark, same)).collect()[0]["js_divergence"]
    js_drift = js_token_drift(_docs_df(spark, drifted)).collect()[0]["js_divergence"]
    assert js_drift > js_same + 0.3  # disjoint vocab ~ ln 2 apart
