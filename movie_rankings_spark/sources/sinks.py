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
