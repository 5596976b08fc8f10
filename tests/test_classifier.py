"""Hashed-feature linear classifier: exactness against an independent
Python reference, broadcast-model plan shape, and gate semantics."""

from __future__ import annotations

import hashlib

from movie_rankings_spark.operators.classifier import (
    DEFAULT_DIM,
    hashed_bow_scores,
    hashed_weight_table,
)


def _ref_logit(text: str, dim: int = DEFAULT_DIM) -> int:
    total = 0
    for tok in text.split(" "):
        bucket = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim
        w = int(hashlib.md5(str(bucket).encode()).hexdigest()[:8], 16) % 201 - 100
        total += w
    return total


def test_scores_match_python_reference(spark):
    rows = [(1, "alpha beta gamma"), (2, "one two three four five"), (3, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in hashed_bow_scores(df).collect()}
    for doc_id, text in rows:
        want = _ref_logit(text)
        assert got[doc_id]["logit_x100"] == want
        assert got[doc_id]["score"] == want / 100.0
        assert got[doc_id]["keep"] == (want > 0)


def test_weight_table_range_and_determinism(spark):
    wt = hashed_weight_table(spark, 64).collect()
    assert len(wt) == 64
    assert all(-100 <= r["weight"] <= 100 for r in wt)
    again = {r["bucket"]: r["weight"] for r in hashed_weight_table(spark, 64).collect()}
    assert {r["bucket"]: r["weight"] for r in wt} == again


def test_model_is_broadcast_not_shuffled(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = hashed_bow_scores(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_auc_hand_computed_with_ties(spark):
    """The histogram/theta-join AUC must equal a direct pairwise
    P(s⁺>s⁻)+½P(s⁺=s⁻) computed from the same scores — ties and all
    — and stay within [0, 1]."""
    from movie_rankings_spark.operators.classifier import classifier_auc
    from pyspark.sql import functions as F

    rows = [
        (1, "alpha beta gamma delta", "en"),
        (2, "alpha beta gamma", "en"),
        (3, "uno dos tres quatro", "fr"),
        (4, "zeta eta theta", "fr"),
        (5, "alpha beta", "en"),
        (6, "dos tres", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = classifier_auc(df, F.col("lang") == "en").collect()[0]
    assert out["n_pos"] == 3 and out["n_neg"] == 3
    assert 0.0 <= out["auc"] <= 1.0
    # exact cross-check against a direct pairwise computation
    from movie_rankings_spark.operators.classifier import hashed_bow_scores

    sc = {r["doc_id"]: r["logit_x100"] for r in hashed_bow_scores(df).collect()}
    pos = [sc[i] for i, _, l in rows if l == "en"]
    neg = [sc[i] for i, _, l in rows if l == "fr"]
    want = sum(
        1.0 if p > q else (0.5 if p == q else 0.0) for p in pos for q in neg
    ) / (len(pos) * len(neg))
    assert out["auc"] == want


def test_knn_label_propagation_planted_clusters(spark):
    """Two well-separated clusters with distinct labels: every
    held-out vector must take its own cluster's label."""
    import numpy as np

    from movie_rankings_spark.operators import similarity
    from pyspark.sql import functions as F

    rng = np.random.default_rng(4)
    rows = []
    for i in range(40):
        c = i % 2
        base = np.array([5.0, 0.0, 0.0]) if c == 0 else np.array([0.0, 5.0, 0.0])
        v = base + rng.normal(scale=0.2, size=3)
        rows.append((i, [float(x) for x in v], c))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = similarity.knn_label_propagation(df, F.col("vec_id") % 5 == 0, k=3).collect()
    assert len(out) == 8
    for r in out:
        assert r["pred_label"] == r["true_label"]
        assert r["n_votes"] == 3  # unanimous within a clean cluster


def test_knn_label_propagation_ivf_planted_clusters(spark):
    """The ANN-backed scale path must agree 100% with the exact tier
    on well-separated planted clusters (nprobe covers both buckets)."""
    import numpy as np

    from movie_rankings_spark.operators import similarity
    from pyspark.sql import functions as F

    rng = np.random.default_rng(4)
    rows = []
    for i in range(40):
        c = i % 2
        base = np.array([5.0, 0.0, 0.0]) if c == 0 else np.array([0.0, 5.0, 0.0])
        v = base + rng.normal(scale=0.2, size=3)
        rows.append((i, [float(x) for x in v], c))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    pred = F.col("vec_id") % 5 == 0
    out = similarity.knn_label_propagation_ivf(
        df, pred, k=3, n_centroids=4, nprobe=2
    ).collect()
    assert len(out) == 8
    for r in out:
        assert r["pred_label"] == r["true_label"]


def test_knn_label_propagation_ivf_agreement_gate(spark, sf_dir):
    """Prediction-agreement gate vs the exact variant on the sf0.001
    embeddings table at the registered config (n_centroids=16,
    nprobe=8). This table's embeddings are isotropic random — the
    worst case for bucket pruning (same reason the IVF retrieval
    recall gate sits at 0.5) — so the floor here is 50%; the semantic
    100%-agreement gate runs on the planted-cluster fixture above,
    which has the cluster structure real embeddings have."""
    from movie_rankings_spark.operators import similarity
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pred = F.col("vec_id") % 97 == 0
    exact = {
        r["query_id"]: r["pred_label"]
        for r in similarity.knn_label_propagation(emb, pred, k=5).collect()
    }
    ann = {
        r["query_id"]: r["pred_label"]
        for r in similarity.knn_label_propagation_ivf(
            emb, pred, k=5, n_centroids=16, nprobe=8
        ).collect()
    }
    assert set(ann) == set(exact)  # every holdout row gets a prediction
    agree = sum(1 for q, p in ann.items() if exact[q] == p)
    assert agree / len(exact) >= 0.5, f"agreement {agree}/{len(exact)}"
