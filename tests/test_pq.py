"""PQ ANN + SemDeDup (round 3): recall gates against the exact paths.

Approximate operators are graded the same way as the other ANN tiers
(tests/test_similarity.py, tests/test_dedup.py): exact result computed
once per module, approximate path must recover most of it, and
precision-style invariants hold exactly (rescored scores, thresholds).
"""

from __future__ import annotations

import numpy as np
import pytest

from movie_rankings_spark.catalog import load_table
from movie_rankings_spark.operators import dedup, pq, similarity
from movie_rankings_spark.operators.semdedup import semantic_dedup_pairs

SF = "/root/testdata/sf0.001"
QUERY_IDS = tuple(range(8))
K = 5


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").cache()


@pytest.fixture(scope="module")
def exact_topk(spark, emb):
    return {
        (r["query_id"], r["vec_id"])
        for r in similarity.cosine_topk_exact(emb, QUERY_IDS, k=K).collect()
    }


class TestPq:
    def test_codebooks_shape_and_determinism_of_encode(self, emb):
        books = pq.pq_train_codebooks(emb, m_subspaces=8, n_codes=16, n_iters=1)
        assert books.shape == (8, 16, 8)
        codes = pq.pq_encode(emb, books).collect()
        assert all(len(r["codes"]) == 8 for r in codes)
        assert all(0 <= c < 16 for r in codes for c in r["codes"])
        # encoding is a pure function of (vector, codebooks)
        again = pq.pq_encode(emb, books).collect()
        assert {r["vec_id"]: r["codes"] for r in codes} == {
            r["vec_id"]: r["codes"] for r in again
        }

    def test_pq_topk_recall_and_exact_scores(self, emb, exact_topk):
        got = pq.pq_topk(emb, QUERY_IDS, k=K, m_subspaces=8, n_codes=16).collect()
        pairs = {(r["query_id"], r["vec_id"]) for r in got}
        # per-query result shape: k rows, ranks 1..k
        by_q: dict[int, list] = {}
        for r in got:
            by_q.setdefault(r["query_id"], []).append(r)
        for q, rows in by_q.items():
            assert sorted(x["rn"] for x in rows) == list(range(1, K + 1))
        recall = len(pairs & exact_topk) / len(exact_topk)
        assert recall >= 0.8, f"PQ recall {recall:.2f}"
        # survivors are exact-rescored: any pair ALSO in the exact
        # top-k must carry the identical cosine
        exact_scores = {
            (r["query_id"], r["vec_id"]): r["cosine"]
            for r in similarity.cosine_topk_exact(emb, QUERY_IDS, k=K).collect()
        }
        for r in got:
            key = (r["query_id"], r["vec_id"])
            if key in exact_scores:
                assert r["cosine"] == exact_scores[key]

    def test_pq_topk_exact_structure_recall_and_scores(self, emb, exact_topk):
        """The r9 exact-decimal tier: dense ranks per query, recall vs
        brute force above the pruning floor, and — because survivors
        are rescored with the same exact-decimal cosine — any pair
        shared with the exact top-k carries the identical score."""
        got = pq.pq_topk_exact(
            emb, QUERY_IDS, k=K, m_subspaces=8, n_codes=16, candidate_factor=8
        ).collect()
        by_q: dict[int, list] = {}
        for r in got:
            by_q.setdefault(r["query_id"], []).append(r["rn"])
        for q, rns in by_q.items():
            assert sorted(rns) == list(range(1, K + 1)), (q, rns)
        pairs = {(r["query_id"], r["vec_id"]) for r in got}
        recall = len(pairs & exact_topk) / len(exact_topk)
        assert recall >= 0.5, f"PQ exact-tier recall {recall:.2f}"
        exact_scores = {
            (r["query_id"], r["vec_id"]): r["cosine"]
            for r in similarity.cosine_topk_exact(emb, QUERY_IDS, k=K).collect()
        }
        for r in got:
            key = (r["query_id"], r["vec_id"])
            if key in exact_scores:
                assert r["cosine"] == exact_scores[key]

    def test_pq_topk_exact_deterministic(self, emb):
        a = pq.pq_topk_exact(emb, QUERY_IDS, k=K).collect()
        b = pq.pq_topk_exact(emb, QUERY_IDS, k=K).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]


@pytest.fixture(scope="module")
def tight_dup_corpus(spark):
    """200 random unit vectors + 40 tight duplicates (cosine ≈ 0.99)
    — the operating point SemDeDup targets. Returns (df, planted
    pairs)."""
    rng = np.random.RandomState(11)
    base = rng.standard_normal((200, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows, planted = [], set()
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    for j in range(40):
        src = j * 5  # every 5th base vector gets a near-copy
        # perturbation norm ≈ 0.02·√64 = 0.16 → cosine ≈ 0.988
        dup = base[src] + 0.02 * rng.standard_normal(64)
        rows.append((1000 + j, [float(x) for x in dup]))
        planted.add((src, 1000 + j))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.cache(), planted


class TestSemDedup:
    def test_tight_duplicates_recalled(self, tight_dup_corpus):
        df, planted = tight_dup_corpus
        got = {
            (r["vec_a"], r["vec_b"])
            for r in semantic_dedup_pairs(
                df, threshold=0.9, n_clusters=16, centroid_source="kmeans"
            ).collect()
        }
        recall = len(got & planted) / len(planted)
        assert recall >= 0.9, f"tight-dup recall {recall:.2f}"

    def test_exact_tier_recall_precision_determinism(self, tight_dup_corpus, emb):
        """The r9 oracle-exact tier (exact spherical-k-means buckets +
        within-bucket exact cosine): tight planted duplicates still
        co-cluster and recall holds; every emitted pair is a true pair
        with the identical exact-decimal cosine; and the whole output
        is bit-deterministic across runs."""
        from movie_rankings_spark.operators.semdedup import (
            semantic_dedup_pairs_exact,
        )

        df, planted = tight_dup_corpus
        got = {
            (r["vec_a"], r["vec_b"])
            for r in semantic_dedup_pairs_exact(
                df, threshold=0.9, n_clusters=16
            ).collect()
        }
        recall = len(got & planted) / len(planted)
        assert recall >= 0.9, f"exact-tier tight-dup recall {recall:.2f}"

        exact = {
            (r["vec_a"], r["vec_b"]): r["cosine"]
            for r in dedup.embedding_cosine_pairs(emb, threshold=0.45).collect()
        }
        rows = semantic_dedup_pairs_exact(
            emb, threshold=0.45, n_clusters=16
        ).collect()
        for r in rows:
            assert (r["vec_a"], r["vec_b"]) in exact
            assert r["cosine"] == exact[(r["vec_a"], r["vec_b"])]
        again = semantic_dedup_pairs_exact(
            emb, threshold=0.45, n_clusters=16
        ).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    def test_exact_precision_on_corpus(self, emb):
        # every emitted pair is a true pair with the identical
        # exact-decimal cosine (precision is exact by construction)
        exact = {
            (r["vec_a"], r["vec_b"]): r["cosine"]
            for r in dedup.embedding_cosine_pairs(emb, threshold=0.45).collect()
        }
        got = semantic_dedup_pairs(
            emb, threshold=0.45, n_clusters=16, centroid_source="kmeans"
        ).collect()
        for r in got:
            assert (r["vec_a"], r["vec_b"]) in exact
            assert r["cosine"] == exact[(r["vec_a"], r["vec_b"])]

    def test_multiprobe_widens_recall_and_dedups_pairs(self, emb):
        # moderate-similarity pairs straddle clusters; p=2 soft
        # assignment must find at least as many, with no pair listed
        # twice
        p1 = semantic_dedup_pairs(emb, threshold=0.45, n_clusters=16).collect()
        p2 = semantic_dedup_pairs(
            emb, threshold=0.45, n_clusters=16, n_probes=2
        ).collect()
        s1 = {(r["vec_a"], r["vec_b"]) for r in p1}
        s2 = {(r["vec_a"], r["vec_b"]) for r in p2}
        assert len(s2) == len(p2)  # dropDuplicates applied
        assert len(s2) >= len(s1)

    def test_no_self_or_reversed_pairs(self, emb):
        got = semantic_dedup_pairs(emb, threshold=0.45, n_clusters=8).collect()
        assert all(r["vec_a"] < r["vec_b"] for r in got)
        assert len({(r["vec_a"], r["vec_b"]) for r in got}) == len(got)
