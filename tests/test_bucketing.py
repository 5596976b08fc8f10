"""Bucketed co-located joins — the 100 TB fact⋈fact strategy.

SCALE.md claims that bucketing lineitem and orders by orderkey makes
their join shuffle-free; this test proves it: the bucketed join plan
contains ZERO Exchange nodes, and returns the same result as the
shuffled join.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from movie_rankings_spark.catalog import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(root / "orders_bkt"))
        .mode("overwrite")
        .saveAsTable("orders_bkt")
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(root / "lineitem_bkt"))
        .mode("overwrite")
        .saveAsTable("lineitem_bkt")
    )
    yield "orders_bkt", "lineitem_bkt"
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    o_t, li_t = bucketed_tables
    # hint forces sort-merge (at test scale orders is broadcast-size,
    # which would also be shuffle-free but wouldn't exercise bucketing)
    j = spark.table(li_t).join(
        spark.table(o_t).hint("merge"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = j._sc._jvm.PythonSQLUtils.explainString(
        j._jdf.queryExecution(), "simple"
    )
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan


def test_bucketed_join_matches_shuffled_join(spark, sf_dir, bucketed_tables):
    o_t, li_t = bucketed_tables
    bucketed = (
        spark.table(li_t)
        .join(spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    shuffled = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert bucketed == shuffled
