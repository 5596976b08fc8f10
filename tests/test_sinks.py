"""Sinks: round-trip fidelity + partition pruning on re-read."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_rankings_spark.plans import all_queries
from movie_rankings_spark.sources.sinks import write_csv, write_parquet


def test_parquet_roundtrip_partitioned(spark, sf_dir, tmp_path):
    src = all_queries.QUERIES["orders_by_month"](spark, sf_dir)
    path = str(tmp_path / "by_month")
    write_parquet(src, path, partition_by=["yr"])

    back = spark.read.parquet(path)
    want = {tuple(r) for r in src.collect()}
    got = {
        (r["yr"], r["mo"], r["n_orders"], r["total_price"])
        for r in back.select("yr", "mo", "n_orders", "total_price").collect()
    }
    assert got == want


def test_partitioned_read_prunes(spark, sf_dir, tmp_path):
    """A filter on the partition column must become a PartitionFilter
    (directory pruning), not a data filter."""
    src = all_queries.QUERIES["orders_by_month"](spark, sf_dir)
    path = str(tmp_path / "by_month_prune")
    write_parquet(src, path, partition_by=["yr"])

    q = spark.read.parquet(path).filter(F.col("yr") == 1996)
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "simple"
    )
    assert "PartitionFilters: [isnotnull(yr" in plan or "PartitionFilters: [(yr" in plan
    assert q.count() == src.filter(F.col("yr") == 1996).count()


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    src = all_queries.QUERIES["text_corpus_summary"](spark, sf_dir)
    path = str(tmp_path / "corpus_csv")
    write_csv(src, path)
    back = spark.read.option("header", True).csv(path)
    assert back.count() == src.count()
    assert set(back.columns) == set(src.columns)
