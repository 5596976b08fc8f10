"""Sparse TF-IDF cosine top-k (operators/tfidf.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from movie_rankings_spark.operators.tfidf import (
    doc_norms,
    doc_term_weights,
    tfidf_topk,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_duplicate_is_top1_with_cosine_1(spark):
    rows = [
        (0, "alpha beta gamma delta", "en"),
        (1, "alpha beta gamma delta", "en"),  # exact duplicate of 0
        (2, "alpha beta unrelated words here", "en"),
        (3, "totally different tokens", "en"),
    ]
    out = tfidf_topk(_docs(spark, rows), F.col("doc_id") == 0, "lang", k=3).collect()
    top = [r for r in out if r["rank"] == 1][0]
    assert top["neighbor_doc"] == 1
    assert math.isclose(top["cosine"], 1.0, rel_tol=1e-12)
    # self never appears
    assert all(r["neighbor_doc"] != 0 for r in out)


def test_blocking_excludes_other_languages(spark):
    rows = [
        (0, "alpha beta gamma", "en"),
        (1, "alpha beta gamma", "de"),  # identical text, wrong block
        (2, "alpha beta something", "en"),
    ]
    out = tfidf_topk(_docs(spark, rows), F.col("doc_id") == 0, "lang", k=5).collect()
    assert {r["neighbor_doc"] for r in out} == {2}


def test_weights_match_python_reference(spark):
    rows = [
        (0, "a a b", "en"),
        (1, "a c", "en"),
        (2, "b c c", "en"),
    ]
    w = {
        (r["doc_id"], r["term"]): r["weight"]
        for r in doc_term_weights(_docs(spark, rows), idf_quant=1000).collect()
    }
    # df: a=2, b=2, c=2; N=3 -> idf_q = floor(3000/2) = 1500
    assert w[(0, "a")] == 2 * 1500
    assert w[(0, "b")] == 1 * 1500
    assert w[(2, "c")] == 2 * 1500
    norms = {r["doc_id"]: r["norm_sq"] for r in doc_norms(
        doc_term_weights(_docs(spark, rows), idf_quant=1000)
    ).collect()}
    assert norms[0] == (3000.0**2 + 1500.0**2)
