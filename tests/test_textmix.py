from __future__ import annotations

from pyspark.sql import functions as F

from movie_rankings_spark.catalog import load_table
from movie_rankings_spark.operators.textops import (
    repetition_bigram_stats,
    token_budget_mix,
)

SF_001 = "/root/testdata/sf0.01"


def test_token_budget_mix_downsamples_only_over_budget_groups(spark):
    docs = load_table(spark, SF_001, "documents")
    budget = 5_000
    mixed = token_budget_mix(docs, budget)
    before = {
        r.lang: r.total
        for r in docs.select(
            "lang", F.size(F.split("text", " ")).alias("n")
        )
        .groupBy("lang")
        .agg(F.sum("n").alias("total"))
        .collect()
    }
    after = {
        r.lang: r.total
        for r in mixed.groupBy("lang").agg(F.sum("n_tokens").alias("total")).collect()
    }
    for lang, total in before.items():
        if total <= budget:
            # under-budget groups pass through untouched
            assert after[lang] == total, lang
        else:
            assert after[lang] < total, lang
            # floor-quantized rate keeps the expectation at or under
            # budget; allow hash-sampling variance above it
            assert after[lang] < 2 * budget, lang


def test_token_budget_mix_is_deterministic(spark):
    docs = load_table(spark, SF_001, "documents")
    a = sorted(r.doc_id for r in token_budget_mix(docs, 5_000).collect())
    b = sorted(r.doc_id for r in token_budget_mix(docs, 5_000).collect())
    assert a == b and len(a) > 0


def test_repetition_ratio_flags_planted_loop(spark):
    rows = [
        (1, "spam ham " * 30),          # one bigram dominates
        (2, " ".join(f"w{i}" for i in range(60))),  # all distinct
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_bigram_stats(df).collect()}
    assert got[1].flagged
    assert got[1].top_bigram_ratio > 0.5
    assert not got[2].flagged
    assert got[2].max_bigram_count == 1
