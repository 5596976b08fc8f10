"""The flagship query — the reference's entire analytical surface
(`print_lists`, /root/reference/top_movies.py:128-144) as one lazy
DataFrame composition:

    scraped(url, rank:str, title)
      → alias overrides (parse-time renames, optional)
      → coerce rank to int-with-default-0           (top_movies.py:131)
      → derive normalized title_comp                (top_movies.py:132-135)
      → keep titles present in ALL lists            (top_movies.py:137)
      → groupBy(title_comp).agg(sum, avg, count)    (top_movies.py:140,143)
      → orderBy(rank_sum, title_comp).limit(k)      (top_movies.py:140)

Scale notes (100 TB):
  * Normalization collapses to ONE codegen'd projection (collapse
    projects) pipelined into the scan — zero extra passes.
  * The "in all lists" filter is a window count partitioned by
    title_comp: exactly one shuffle of the fact rows, reused by the
    following groupBy on the same key (Catalyst sees the child
    partitioning and elides the second exchange).
  * `orderBy().limit(k)` plans as TakeOrderedAndProject — per-partition
    top-k + driver merge, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from movie_rankings_spark.functions.normalize import (
    apply_alias_overrides,
    coerce_rank,
    normalize_title,
)


def normalize_scraped(df: DataFrame, apply_aliases: bool = True) -> DataFrame:
    """Projection stage: rank coercion + title_comp derivation."""
    title = F.col("title")
    if apply_aliases:
        title = apply_alias_overrides(title)
    return df.select(
        F.col("url"),
        coerce_rank(F.col("rank")).alias("rank"),
        F.col("title").alias("title"),
        normalize_title(title).alias("title_comp"),
    )


def filter_in_all_lists(
    df: DataFrame, n_sources: int, distinct_sources: bool = False
) -> DataFrame:
    """Keep rows whose title_comp occurs exactly ``n_sources`` times.

    Row-count semantics by default for parity with the reference's
    ``len(group) == len(urls)`` (top_movies.py:137 — a title duplicated
    within one list and present in a second also passes).
    ``distinct_sources=True`` gives the corrected distinct-source
    variant (SURVEY.md §7 risk register).
    """
    w = Window.partitionBy("title_comp")
    if distinct_sources:
        n = F.size(F.collect_set("url").over(w))
    else:
        n = F.count(F.lit(1)).over(w)
    return df.withColumn("_n_lists", n).filter(F.col("_n_lists") == n_sources).drop(
        "_n_lists"
    )


def aggregate_rankings(df: DataFrame) -> DataFrame:
    """Composite score per normalized title: sum (lower = better),
    mean, and row count. Hash aggregate with map-side partials."""
    return df.groupBy("title_comp").agg(
        F.sum("rank").alias("rank_sum"),
        F.avg("rank").alias("rank_avg"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def flagship(
    df: DataFrame,
    n_sources: int,
    k: int = 10,
    apply_aliases: bool = True,
    distinct_sources: bool = False,
) -> DataFrame:
    """Full pipeline; tie-break on title_comp so top-k is deterministic
    (pandas' unstable quicksort is not a semantics we reproduce)."""
    normalized = normalize_scraped(df, apply_aliases=apply_aliases)
    surviving = filter_in_all_lists(
        normalized, n_sources, distinct_sources=distinct_sources
    )
    ranked = aggregate_rankings(surviving)
    return ranked.orderBy(
        F.col("rank_sum").asc(), F.col("title_comp").asc()
    ).limit(k)
