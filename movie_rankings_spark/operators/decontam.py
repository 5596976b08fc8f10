"""Benchmark decontamination — remove training documents that overlap
an evaluation/benchmark set (the Dolma/FineWeb n-gram blocklist step).

Shape: the benchmark side is tiny (eval suites are KBs; the corpus is
TBs), so its distinct shingles BROADCAST and the contamination probe
is a map-side hash lookup — the 100 TB corpus never shuffles. Only
the per-doc hit counts (bounded by contaminated docs, not corpus
size) pass through an aggregation; clean output is a left-anti join
against that small hit set.

Real deployments hash the shingles (8-byte xxhash64) and use 8-13
word n-grams; shingle length is a parameter here and hashing would
only change the broadcast payload, not the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from movie_rankings_spark.functions.text import word_shingles


def _distinct_shingles(docs: DataFrame, n: int, out: str) -> DataFrame:
    return docs.select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles(F.col("text"), n))).alias(out),
    )


def contamination_report(
    docs: DataFrame, benchmark: DataFrame, n: int = 3
) -> DataFrame:
    """(doc_id, n_hits): documents sharing >= 1 distinct n-gram with
    the benchmark set, with the count of distinct shared shingles.
    Benchmark shingles broadcast; corpus rows never shuffle."""
    bench = (
        benchmark.select(F.explode(word_shingles(F.col("text"), n)).alias("sh"))
        .distinct()
    )
    return (
        _distinct_shingles(docs, n, "sh")
        .join(F.broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 3) -> DataFrame:
    """The corpus minus contaminated documents."""
    hits = contamination_report(docs, benchmark, n=n)
    return docs.join(hits.select("doc_id"), "doc_id", "left_anti")
