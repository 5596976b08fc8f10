"""Reciprocal-rank fusion (search_hybrid_rrf): fusion math, rank
monotonicity, and both-arms dominance on the sf0.001 corpus."""

from __future__ import annotations

from movie_rankings_spark.plans.all_queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_rrf_fusion_invariants(spark):
    rows = QUERIES["search_hybrid_rrf"](spark, SF).collect()
    assert 0 < len(rows) <= 10
    # descending fused score with doc_id tie-break
    keys = [(-r["rrf"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        expect = 0.0
        if r["lex_rank"] is not None:
            assert 1 <= r["lex_rank"] <= 20
            expect += 1.0 / (60.0 + r["lex_rank"])
        if r["sem_rank"] is not None:
            assert 1 <= r["sem_rank"] <= 20
            expect += 1.0 / (60.0 + r["sem_rank"])
        assert r["lex_rank"] is not None or r["sem_rank"] is not None
        assert abs(r["rrf"] - expect) < 1e-15


def test_rrf_both_arms_beat_single_arm_at_equal_rank(spark):
    # structural property of the formula, pinned so a refactor can't
    # silently change fusion semantics: rank r in BOTH arms always
    # outscores rank r in ONE arm
    both = 2 * (1.0 / (60.0 + 5))
    single_best = 1.0 / (60.0 + 1)
    assert both > single_best
