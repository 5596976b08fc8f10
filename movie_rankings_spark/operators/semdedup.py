"""Cluster-bucketed semantic dedup (SemDeDup; Abbas et al. 2023,
arXiv:2303.09540): k-means the embedding space, then look for
near-duplicate pairs only WITHIN each cluster.

This is the third semantic-dedup strategy next to the exact all-pairs
verifier (dedup.embedding_cosine_pairs, O(n²)) and random-hyperplane
LSH (dedup.embedding_lsh_pairs). Cluster bucketing trades LSH's
per-pair probabilistic guarantee for much smaller candidate sets in
clustered corpora: candidates are O(Σ cluster²) and every bucket is a
plain groupBy key — at 100 TB the pair generation is co-partitioned by
cluster id, no band replication (LSH shuffles docs × bands copies),
and ``n_clusters`` scales with the corpus so per-cluster GEMMs stay
bounded (SemDeDup runs ~10⁵ clusters at web scale). Recall is bounded
by cluster purity (a near-dup pair split across two clusters is
missed) — the documented SemDeDup trade-off; ``n_probes`` soft
assignment buys it back at p× replication. tests/test_pq.py pins
recall on planted tight duplicates.

Candidate scoring is a per-cluster float64 gram matrix (Arrow batch,
one numpy GEMM per bucket — the same vectorized-prune shape as
similarity.cosine_topk_numpy); survivors are rescored with the
exact-decimal cosine, so precision is exact: every emitted pair truly
clears the threshold, with the same double the all-pairs verifier
reports.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from movie_rankings_spark.functions.vectors import (
    NARROW,
    dot_exact,
    norm_sq_exact,
)
from movie_rankings_spark.operators.similarity import (
    ivf_assignments,
    kmeans_centroids,
)

#: float-vs-exact-decimal slack on the prefilter cut (float64 cosine
#: is within ~1e-12 of the exact value; 1e-6 is generous)
_PREFILTER_EPS = 1e-6


def semantic_dedup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.45,
    n_clusters: int = 16,
    centroid_source: str = "kmeans",
    n_probes: int = 1,
) -> DataFrame:
    """(vec_a, vec_b, cosine) for within-cluster pairs at
    cosine >= threshold; per-cluster GEMM prefilter, exact-decimal
    rescore. ``centroid_source`` as in similarity.ivf_topk;
    ``n_probes`` > 1 soft-assigns each vector to its p nearest
    clusters to also catch pairs that straddle a cluster boundary —
    plain SemDeDup (p=1) only guarantees recall on tight duplicates,
    which co-cluster."""
    if centroid_source == "kmeans":
        centroids = kmeans_centroids(embeddings, n_clusters)
    else:
        head = (
            embeddings.orderBy("vec_id")
            .limit(n_clusters)
            .select("embedding")
            .collect()
        )
        centroids = np.array([r["embedding"] for r in head], dtype=np.float64)

    assigned = ivf_assignments(embeddings, centroids, n_probes=n_probes)
    cut = threshold - _PREFILTER_EPS

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": []}).astype(np.int64)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        gram = mat @ mat.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = gram[ia, ib] >= cut
        a, b = ids[ia[keep]], ids[ib[keep]]
        return pd.DataFrame(
            {"vec_a": np.minimum(a, b), "vec_b": np.maximum(a, b)}
        )

    cand = assigned.groupBy("bucket").applyInPandas(
        bucket_pairs, "vec_a long, vec_b long"
    )
    if n_probes > 1:
        # a pair sharing several probed buckets surfaces once per
        # shared bucket — keep one before the rescore
        cand = cand.dropDuplicates(["vec_a", "vec_b"])

    side = embeddings.select(
        "vec_id",
        "embedding",
        F.sqrt(norm_sq_exact(F.col("embedding"), NARROW)).alias("nrm"),
    )
    a = side.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = side.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    cosine = dot_exact(F.col("emb_a"), F.col("emb_b"), NARROW) / (
        F.col("nrm_a") * F.col("nrm_b")
    )
    half = a.join(F.broadcast(cand), "vec_a")  # output ≈ |candidates|
    return (
        b.join(F.broadcast(half), "vec_b")
        .select("vec_a", "vec_b", cosine.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup_pairs_exact(
    embeddings: DataFrame,
    threshold: float = 0.45,
    n_clusters: int = 16,
    n_iters: int = 2,
) -> DataFrame:
    """SemDeDup with the WHOLE algorithm engine-portable (r9): the
    oracle-checkable twin of :func:`semantic_dedup_pairs`. Clusters
    come from the exact-decimal spherical k-means trainer
    (similarity.kmeans_centroids_exact — md5-seeded, fixed rounds);
    bucketing is the shared exact argmax assignment; and every
    within-bucket pair is scored directly with the exact-decimal
    cosine (no float GEMM prefilter), so bucket membership, the
    candidate universe and every emitted (vec_a, vec_b, cosine) row
    replay bit-identically in DuckDB.

    Scale shape: pair generation is a self-equi-join CO-PARTITIONED on
    the cluster id — one shuffle of the corpus on bucket, O(Σ
    cluster²) scored pairs (the SemDeDup contract; n_clusters scales
    with the corpus so per-cluster work stays bounded). The float-GEMM
    prefilter tier remains the throughput path; this tier trades its
    constant for value-hash verifiability — same trade as the exact
    IVF/PQ tiers."""
    from movie_rankings_spark.operators.similarity import (
        assign_exact,
        centroid_dot_dec,
        kmeans_centroids_exact,
    )

    # r10: one measured envelope check tiers every vs-centroid dot
    # (trainer + assignment) — see similarity.centroid_dot_dec
    dot_dec = centroid_dot_dec(embeddings)
    cents = kmeans_centroids_exact(embeddings, n_clusters, n_iters, dot_dec)
    # assigned feeds BOTH sides of the pair join: without a persist the
    # whole corpus×centroid assignment (the second-most expensive stage)
    # replays once per side — committed plan showed two full copies, no
    # ReusedExchange (r10; values unchanged, one compute two reads)
    assigned = assign_exact(embeddings, cents, dot_dec).persist_tracked()
    a = assigned.select(
        F.col("bucket"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = assigned.select(
        F.col("bucket"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    cosine = dot_exact(F.col("emb_a"), F.col("emb_b"), NARROW) / (
        F.col("nrm_a") * F.col("nrm_b")
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
