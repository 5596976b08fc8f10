"""Dedup tier tests: exact dedup on a fixture with planted dups;
MinHash-LSH and SimHash judged against the exact n-gram Jaccard pairs.
"""

from __future__ import annotations

import pytest

from movie_rankings_spark.catalog import load_table
from movie_rankings_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def exact_pairs(docs):
    return {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }


def test_exact_dedup_removes_planted_duplicates(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),  # exact dup of 1
        (3, "alpha  beta gamma delta"),  # whitespace variant → same fingerprint
        (4, "ALPHA BETA GAMMA DELTA"),  # case variant → same fingerprint
        (5, "something else entirely here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in dedup.exact_dedup(df).collect())
    assert kept == [1, 5]
    groups = {
        r["rep_doc_id"]: r["n_dups"]
        for r in dedup.exact_dedup_groups(df).collect()
    }
    assert groups == {1: 4, 5: 1}


def test_minhash_lsh_matches_exact_pairs(docs, exact_pairs):
    lsh_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_neardup_pairs(docs, threshold=0.5).collect()
    }
    assert lsh_pairs == exact_pairs
    assert len(exact_pairs) > 0, "corpus should contain planted near-dups"


def test_simhash_finds_planted_pairs(docs, exact_pairs):
    """SimHash is order-insensitive over shared vocabulary, so it is
    looser than shingle Jaccard — require recall of the planted pairs,
    not precision."""
    sim_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.simhash_neardup_pairs(docs, max_hamming=6).collect()
    }
    missed = exact_pairs - sim_pairs
    assert len(missed) <= len(exact_pairs) * 0.2, f"missed {len(missed)} pairs"


def test_simhash_fingerprint_is_48_bit(docs):
    row = dedup.simhash_fingerprints(docs.limit(10)).collect()
    for r in row:
        assert 0 <= r["simhash"] < (1 << 48)


def _emb(spark):
    import pytest

    from movie_rankings_spark.catalog import load_table

    return load_table(spark, "/root/testdata/sf0.001", "embeddings")


def test_embedding_cosine_pairs_bounds_and_order(spark):
    rows = dedup.embedding_cosine_pairs(_emb(spark), threshold=0.45).collect()
    assert rows, "sf0.001 corpus should contain pairs at cosine >= 0.45"
    for r in rows:
        assert r["vec_a"] < r["vec_b"]
        assert 0.45 <= r["cosine"] <= 1.0 + 1e-12


def test_embedding_lsh_catches_planted_boundary_pairs(spark):
    """Pin the banding math at its claimed boundary: with 16 bands of
    4 bits, a pair at cosine 0.45 is caught w.p. ~0.95
    (operators/dedup.py collision model). Plant pairs at exactly that
    cosine and require the catch rate stays >= 0.85 — a regression in
    band/bit layout (e.g. 8×8 banding drops the boundary catch rate
    below 0.4) fails this loudly, which the corpus-level recall test
    cannot see because corpus pairs sit far above threshold."""
    import numpy as np

    rng = np.random.RandomState(11)
    dim, n_pairs, target = 32, 60, 0.451
    rows = []
    for i in range(n_pairs):
        u = rng.standard_normal(dim)
        u /= np.linalg.norm(u)
        w = rng.standard_normal(dim)
        w -= (w @ u) * u
        w /= np.linalg.norm(w)
        v = target * u + np.sqrt(1 - target**2) * w
        rows.append((2 * i, u.tolist()))
        rows.append((2 * i + 1, v.tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    caught = {
        (r["vec_a"], r["vec_b"])
        for r in dedup.embedding_lsh_pairs(emb, threshold=0.45).collect()
    }
    planted_caught = sum(
        1 for i in range(n_pairs) if (2 * i, 2 * i + 1) in caught
    )
    assert planted_caught >= 0.85 * n_pairs, (
        f"boundary recall {planted_caught}/{n_pairs}"
    )


def test_embedding_lsh_recall_against_exact(spark):
    emb = _emb(spark)
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in dedup.embedding_cosine_pairs(emb, threshold=0.45).collect()
    }
    lsh = {
        (r["vec_a"], r["vec_b"])
        for r in dedup.embedding_lsh_pairs(emb, threshold=0.45).collect()
    }
    # verification makes precision exact; recall < 1 by construction
    assert lsh <= exact
    assert len(lsh) >= 0.8 * len(exact), f"recall {len(lsh)}/{len(exact)}"
    # r5 deterministic pin: hyperplanes are seed-derived and bucket
    # grouping is set-valued, so the caught PAIR SET is a pure
    # function of the fixture — on the sf0.001 seed the LSH tier
    # catches every exact pair (7/7). If the driver ever regenerates
    # the fixture, re-pin the sets; a drop here without a fixture
    # change means the banding/verify pipeline regressed.
    assert lsh == exact, f"seed-pinned recall changed: {len(lsh)}/{len(exact)}"


def test_incremental_batch_finds_cross_split_dups(spark):
    """A planted near-dup pair split across batch/corpus must surface;
    within-corpus pairs must NOT (the run only concerns the batch)."""
    from pyspark.sql import functions as F

    base = "the quick brown fox jumps over the lazy dog " * 6
    rows = [
        (1, base + "alpha"),          # batch side (dup of 2)
        (2, base + "alpha extra"),    # corpus side
        (3, base + "beta"),           # corpus (dup of 4 — both corpus)
        (4, base + "beta extra"),
        (5, "completely different text with no overlap at all here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.incremental_neardup_pairs(
        docs.filter(F.col("doc_id") == 1),
        docs.filter(F.col("doc_id") != 1),
        threshold=0.5,
    ).collect()
    pairs = {(r["batch_doc"], r["corpus_doc"]) for r in out}
    assert (1, 2) in pairs
    assert all(p[0] == 1 for p in pairs)  # only batch-side lefts
    for r in out:
        assert r["jaccard"] >= 0.5


def test_prefix_join_matches_exact_pairs(docs, exact_pairs):
    """Prefix filtering is exact: identical edge set AND identical
    jaccard values as the full inverted-index join."""
    exact_vals = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    prefix_vals = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_prefix_pairs(docs, n=3, threshold=0.5).collect()
    }
    assert prefix_vals == exact_vals
    assert len(prefix_vals) > 0


def test_prefix_join_threshold_boundary(spark):
    """Pairs exactly AT the threshold must survive the lenient
    prefix/positional prunes (the float-safety claim)."""
    # 4 words -> 2 trigram shingles each; sharing 1 of 3 distinct
    # shingles between 5-word docs gives jaccard exactly 1/3... build
    # a pair at exactly 0.5: sets {s1,s2,s3} and {s2,s3,s4} share 2 of
    # 4 -> 0.5 with 5-word docs.
    rows = [
        (1, "a b c d e"),   # shingles: abc bcd cde
        (2, "b c d e f"),   # shingles: bcd cde def  -> inter 2, union 4
        (3, "x y z w v"),   # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_prefix_pairs(df, n=3, threshold=0.5).collect()
    }
    assert got == {(1, 2): 0.5}


def test_duplicated_substring_spans_hand_fixture(spark):
    from movie_rankings_spark.operators.dedup import (
        duplicated_substring_spans,
    )

    shared = "the quick brown fox jumps over"  # 30 chars, in both docs
    docs = spark.createDataFrame(
        [
            (1, f"AA {shared}Qunique tail one zzzz"),
            (2, f"{shared}Wtotally different ending here"),
            (3, "no duplication in this document at all x"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_len"])
        for r in duplicated_substring_spans(docs, gram_len=20).collect()
    }
    # every 20-gram inside `shared` occurs in both docs -> one maximal
    # span per doc covering exactly the shared region
    assert got[1] == (4, 4 + len(shared) - 1, len(shared))
    assert got[2] == (1, len(shared), len(shared))
    assert 3 not in got


def test_duplicated_substring_spans_gap_splits(spark):
    from movie_rankings_spark.operators.dedup import (
        duplicated_substring_spans,
    )

    a = "X" * 20
    b = "Y" * 20
    mid = "m n o p q r s t u v w x y z 1 2 3 4 5"  # > 20 chars, unique-ish
    docs = spark.createDataFrame(
        [(1, f"{a}{mid}{b}"), (2, f"{a} | {b}")],
        "doc_id long, text string",
    )
    rows = [
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_substring_spans(docs, gram_len=20).collect()
        if r["doc_id"] == 1
    ]
    # the two duplicated runs are separated by > gram_len in doc 1 ->
    # two distinct spans, not one merged one
    assert len(rows) == 2
    assert rows[0][1] == 1
    assert rows[1][2] == 20 + len(mid) + 20
