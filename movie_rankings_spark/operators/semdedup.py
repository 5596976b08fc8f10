"""Cluster-bucketed semantic dedup (SemDeDup; Abbas et al. 2023,
arXiv:2303.09540): k-means the embedding space, then look for
near-duplicate pairs only WITHIN each cluster.

This is the third semantic-dedup strategy next to the exact all-pairs
verifier (dedup.embedding_cosine_pairs, O(n²)) and random-hyperplane
LSH (dedup.embedding_lsh_pairs). Cluster bucketing trades LSH's
per-pair probabilistic guarantee for much smaller candidate sets in
clustered corpora: candidates are O(Σ cluster²) and every bucket is a
plain groupBy key — at 100 TB the pair join is co-partitioned by
cluster id, no band replication (LSH shuffles docs × bands copies).
Recall is bounded by cluster purity (a near-dup pair split across two
clusters is missed), which is the documented SemDeDup trade-off;
tests/test_pq.py pins recall against the exact pairs on the planted
corpus.

Pair scoring reuses the exact-decimal cosine, so precision is exact:
every emitted pair truly clears the threshold.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from movie_rankings_spark.functions.vectors import dot_exact, norm_sq_exact
from movie_rankings_spark.operators.similarity import (
    ivf_assignments,
    kmeans_centroids,
)


def semantic_dedup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.45,
    n_clusters: int = 16,
    centroid_source: str = "kmeans",
    n_probes: int = 1,
) -> DataFrame:
    """(vec_a, vec_b, cosine) for within-cluster pairs at
    cosine >= threshold; exact-decimal scoring on the bucketed
    candidates. ``centroid_source`` as in similarity.ivf_topk;
    ``n_probes`` > 1 soft-assigns each vector to its p nearest
    clusters (p× replication) to also catch moderate-similarity pairs
    that straddle a cluster boundary — plain SemDeDup (p=1) only
    guarantees recall on tight duplicates, which co-cluster."""
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

    assigned = ivf_assignments(embeddings, centroids, n_probes=n_probes).select(
        "vec_id",
        "bucket",
        "embedding",
        F.sqrt(norm_sq_exact(F.col("embedding"))).alias("nrm"),
    )
    a = assigned.select(
        "bucket",
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = assigned.select(
        "bucket",
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    cosine = dot_exact(F.col("emb_a"), F.col("emb_b")) / (
        F.col("nrm_a") * F.col("nrm_b")
    )
    pairs = (
        a.join(b, ["bucket"])  # co-partitioned equi-join on cluster id
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
    if n_probes > 1:
        # a pair sharing several probed buckets surfaces once per
        # shared bucket with the identical exact cosine — keep one
        pairs = pairs.dropDuplicates(["vec_a", "vec_b"])
    return pairs
