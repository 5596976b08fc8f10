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
