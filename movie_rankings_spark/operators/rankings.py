"""Ranked-list builders over the star schema.

The reference consumes externally-scraped top-N lists; at engine scale
we also *produce* ranked lists from fact data. ``supplier_part_rankings``
builds one "source list" per supplier — parts ranked by revenue — in
the exact ``scraped(url, rank, title)`` shape the flagship pipeline
consumes, so the flagship runs end-to-end on parquet fact tables.

Scale notes:
  * revenue aggregates per (suppkey, partkey) with map-side partials;
    the decimal cast makes the sum exact and order-independent, so
    results are bit-identical across partitionings (and match the
    DuckDB oracle).
  * `part` is a dimension — broadcast joined, no fact shuffle for the
    join at any scale where part fits in memory; the only full shuffle
    is the groupBy on the composite key.
  * per-supplier ranking is a window over suppkey — bounded by the
    top_n filter immediately after, and supplier count is small
    relative to fact rows, so no skew concern.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def supplier_part_rankings(
    lineitem: DataFrame,
    part: DataFrame,
    suppkeys: Sequence[int] = (1, 2, 3),
    top_n: int = 100,
) -> DataFrame:
    """One ranked part list per supplier, scraped-schema shaped:
    url = 'supplier_<k>', rank = revenue position, title = p_name."""
    revenue = (
        lineitem.filter(F.col("l_suppkey").isin(list(suppkeys)))
        .join(F.broadcast(part), lineitem["l_partkey"] == part["p_partkey"])
        .groupBy("l_suppkey", "p_partkey", "p_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("revenue").desc(), F.col("p_partkey").asc()
    )
    return (
        revenue.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(
            F.concat(F.lit("supplier_"), F.col("l_suppkey")).alias("url"),
            F.col("rank").cast("string").alias("rank"),
            F.col("p_name").alias("title"),
        )
    )
