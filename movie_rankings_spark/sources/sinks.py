"""Sinks (SURVEY.md §2a S7) — the production counterparts of the
reference's stdout sink (/root/reference/top_movies.py:139-143).

The reference prints two top-10 Series; an engine needs durable,
re-readable outputs. Three writers, all thin wrappers that encode the
scale conventions so call sites stay uniform:

  * parquet — the default columnar sink; optional hive-style
    partition columns so downstream scans prune.
  * csv     — interchange sink (header on, explicit null marker).
  * console — the reference-parity debug sink (df.show passthrough).

Scale notes: partition columns must be low-cardinality (a date bucket,
a source tag — NOT a key column: one directory per value); writers
repartition to ``files_per_partition`` before writing so output files
are few and fat rather than one-per-task shards.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
    files_per_partition: int = 1,
) -> None:
    out = df
    if partition_by:
        # co-locate rows of one output partition before the write so
        # each directory gets files_per_partition files, not one shard
        # per upstream task
        out = df.repartition(files_per_partition, *partition_by)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", True).option(
        "nullValue", "\\N"
    ).csv(path)


def show_top(df: DataFrame, k: int = 10) -> None:
    """Reference-parity stdout sink (top_movies.py:139-143)."""
    df.show(k, truncate=False)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Clustered (sorted-layout) parquet write: range-partition on the
    sort key, sort within each partition, one file per partition.

    Why it matters at 100 TB: parquet stores min/max stats per
    row group, and Spark's scan skips row groups whose stats can't
    match the pushed filter. An unsorted write leaves every file
    spanning the whole key range (stats prune nothing); this layout
    makes per-file key spans tight and disjoint, so a range filter
    reads only the files that contain it. Same pruning mechanism that
    z-ordering generalizes to multiple keys."""
    (
        df.repartitionByRange(num_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet_dir(
    spark,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: Sequence[str] = (),
) -> int:
    """Small-file compaction (the landing-zone maintenance job):
    rewrite a directory of many small parquet files into
    ``ceil(total_bytes / target_file_bytes)`` right-sized files,
    optionally re-clustering on ``sort_cols`` while at it. Returns
    the output file count. Streaming ingest and per-batch jobs
    accrete small files; scans pay per-file open/footer cost, so
    periodic compaction keeps read amplification flat."""
    import math
    import os

    df = spark.read.parquet(src_dir)
    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(src_dir)
        for f in files
        if f.endswith(".parquet")
    )
    n = max(1, math.ceil(total / target_file_bytes))
    out = (
        df.repartitionByRange(n, *sort_cols).sortWithinPartitions(*sort_cols)
        if sort_cols
        else df.repartition(n)
    )
    out.write.mode("overwrite").parquet(dst_dir)
    return n
