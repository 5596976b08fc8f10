"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query on sf0.001.
``queries()``   — every implemented operator from SURVEY.md §2, named.
``oracle_sql()``— DuckDB-equivalent SQL per query (same column names;
float aggregates use exact decimal summation on both sides so values
hash-match bit-for-bit).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from movie_rankings_spark.plans import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return all_queries.QUERIES["flagship_tpch"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(all_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(all_queries.ORACLES)
