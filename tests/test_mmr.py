"""MMR selection vs a single-node reference, plus the diversity
property that motivates it."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from movie_rankings_spark.catalog import load_table
from movie_rankings_spark.operators import similarity


QUERY_IDS = (3, 11)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _ref_mmr(qvec, ids, vecs, rel, k, lam):
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    order = np.lexsort((ids, -rel))
    ids, vecs, rel = ids[order], vecs[order], rel[order]
    pair = vecs @ vecs.T
    free = list(range(len(ids)))
    chosen = []
    while free and len(chosen) < k:
        red = pair[np.ix_(free, chosen)].max(axis=1) if chosen else np.zeros(len(free))
        obj = lam * rel[free] - (1 - lam) * red
        j = int(np.argmax(obj))
        chosen.append(free.pop(j))
    return [int(ids[c]) for c in chosen]


def test_mmr_matches_reference(spark, emb):
    pool = similarity.cosine_topk_exact(emb, QUERY_IDS, k=20).collect()
    vec_rows = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    got = similarity.mmr_topk(emb, QUERY_IDS, k=5, pool=20, lam=0.7).collect()
    for qid in QUERY_IDS:
        cand = [r for r in pool if r["query_id"] == qid]
        ids = np.array([r["vec_id"] for r in cand], dtype=np.int64)
        rel = np.array([r["cosine"] for r in cand])
        vecs = np.array([vec_rows[i] for i in ids], dtype=np.float64)
        want = _ref_mmr(None, ids, vecs, rel, 5, 0.7)
        have = [r["vec_id"] for r in got if r["query_id"] == qid]
        assert have == want


def test_mmr_rank1_is_top_relevance_and_ranks_complete(emb):
    out = similarity.mmr_topk(emb, QUERY_IDS, k=5).collect()
    top = similarity.cosine_topk_exact(emb, QUERY_IDS, k=1).collect()
    best = {r["query_id"]: r["vec_id"] for r in top}
    for qid in QUERY_IDS:
        rows = sorted((r for r in out if r["query_id"] == qid), key=lambda r: r["mmr_rank"])
        assert [r["mmr_rank"] for r in rows] == [1, 2, 3, 4, 5]
        assert rows[0]["vec_id"] == best[qid]


def test_mmr_avoids_planted_redundancy(spark):
    """Query q; candidates: two near-identical high-relevance vectors
    and one moderately relevant orthogonal one. Plain top-2 takes the
    twins; MMR(λ=0.5) must take one twin + the diverse vector."""
    rows = [
        (0, [1.0, 0.0, 0.0]),       # query
        (1, [0.99, 0.14, 0.0]),     # twin A
        (2, [0.99, 0.141, 0.0]),    # twin B
        (3, [0.6, 0.0, 0.8]),       # diverse
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    out = similarity.mmr_topk(df, (0,), k=2, pool=3, lam=0.5).collect()
    picked = [r["vec_id"] for r in sorted(out, key=lambda r: r["mmr_rank"])]
    assert picked[0] in (1, 2)
    assert picked[1] == 3


def test_mmr_exact_pairs_matches_numpy_selection(emb):
    """r4: the oracle-exact form (JVM exact-decimal pair sims + pure-
    Python greedy) must select the same documents in the same order
    as the numpy GEMM throughput form, with scores equal to float
    tolerance (BLAS vs exact-decimal summation differ in the last
    ulps only)."""
    fast = similarity.mmr_topk(emb, QUERY_IDS, k=5).collect()
    exact = similarity.mmr_topk(
        emb, QUERY_IDS, k=5, exact_pairs=True
    ).collect()
    key = lambda r: (r["query_id"], r["mmr_rank"])  # noqa: E731
    fast, exact = sorted(fast, key=key), sorted(exact, key=key)
    assert [(r["query_id"], r["mmr_rank"], r["vec_id"]) for r in fast] == [
        (r["query_id"], r["mmr_rank"], r["vec_id"]) for r in exact
    ]
    for a, b in zip(fast, exact):
        assert abs(a["mmr_score"] - b["mmr_score"]) < 1e-9
        assert abs(a["cosine"] - b["cosine"]) < 1e-9
