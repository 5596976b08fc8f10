"""Scratch experiment: decompose similarity_ivf_exact_topk /
similarity_ivf_kmeans_topk cost at sf0.1 (r10 Change-3a follow-up).
Times each algorithm stage with the noop sink per guide §1.4."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
import os

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

import bench  # noqa: F401
from pyspark.sql import functions as F

from movie_rankings_spark.catalog import load_table
from movie_rankings_spark.session import get_spark

spark = get_spark("exp-ivf")
spark.range(1_000_000).selectExpr("sum(id)").collect()

sf_dir = "/root/testdata/sf0.1"
emb = load_table(spark, sf_dir, "embeddings")
emb.count()

from movie_rankings_spark.functions.vectors import NARROW, _DEC, norm_sq_exact
from movie_rankings_spark.operators.similarity import (
    _ivf_probe_score_exact,
    assign_exact,
    centroid_dot_dec,
    kmeans_centroids_exact,
)

QUERY_IDS = list(range(1, 17))


def t(label, fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    print(f"{label}: {best:.3f}s", flush=True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


cents_head = (
    emb.orderBy("vec_id")
    .limit(32)
    .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("c_emb"))
)

t("head cents alone", lambda: noop(cents_head))
t("corpus norms NARROW", lambda: noop(
    emb.select("vec_id", F.sqrt(norm_sq_exact(F.col("embedding"), NARROW)).alias("nrm"))
))
t("assign_exact NARROW (32 cents)", lambda: noop(assign_exact(emb, cents_head, NARROW)))
t("assign_exact WIDE   (32 cents)", lambda: noop(assign_exact(emb, cents_head, _DEC)))
t("ivf_exact full (probe+score)", lambda: noop(
    _ivf_probe_score_exact(emb, cents_head, QUERY_IDS, 5, 4, NARROW)
))
t("centroid_dot_dec agg", lambda: print(" ->", centroid_dot_dec(emb)))
t("kmeans trainer n16 i2 (narrow)", lambda: noop(
    kmeans_centroids_exact(emb, 16, 2, NARROW)
))
from movie_rankings_spark.caching import release_persisted

release_persisted()

# --- parallelism hypothesis: single input partition serializes the fold ---
print("input partitions:", emb.rdd.getNumPartitions(), flush=True)
emb32 = emb.repartition(32)
t("assign_exact NARROW, corpus repartition(32)", lambda: noop(
    assign_exact(emb32, cents_head, NARROW)
))
t("assign_exact WIDE, corpus repartition(32)", lambda: noop(
    assign_exact(emb32, cents_head, _DEC)
))
t("kmeans trainer n16 i2 narrow, repart(32)", lambda: noop(
    kmeans_centroids_exact(emb32, 16, 2, NARROW)
))
release_persisted()
