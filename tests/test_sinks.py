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


def _file_spans(path, col):
    """(min, max) of `col` per parquet data file, via footer stats."""
    import os

    import pyarrow.parquet as pq

    spans = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(
                next(
                    i
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == col
                )
            ).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    return spans


def test_sorted_write_produces_disjoint_file_spans(spark, sf_dir, tmp_path):
    """Range-partitioned sorted layout: per-file key spans must be
    pairwise disjoint, so min/max stats prune a range filter down to
    the files that contain it. An unsorted control write leaves every
    file spanning (almost) the full key range."""
    from movie_rankings_spark.sources.sinks import write_sorted

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    sorted_path = str(tmp_path / "sorted")
    write_sorted(li, sorted_path, ["l_orderkey"], num_files=4)
    spans = sorted(_file_spans(sorted_path, "l_orderkey"))
    assert len(spans) == 4
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo  # disjoint (range boundaries may touch)

    control_path = str(tmp_path / "unsorted")
    li.repartition(4).write.parquet(control_path)
    ctrl = _file_spans(control_path, "l_orderkey")
    full_lo = min(lo for lo, _ in ctrl)
    full_hi = max(hi for _, hi in ctrl)
    # every hash-shuffled file spans ~the whole key range: stats prune nothing
    for lo, hi in ctrl:
        assert (hi - lo) > 0.5 * (full_hi - full_lo)

    # fidelity: same rows either way
    assert spark.read.parquet(sorted_path).count() == li.count()


def test_compact_parquet_dir_reduces_files(spark, sf_dir, tmp_path):
    from movie_rankings_spark.sources.sinks import compact_parquet_dir

    import os

    src = str(tmp_path / "small_files")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    for _ in range(12):
        li.limit(500).coalesce(1).write.mode("append").parquet(src)
    n_small = sum(f.endswith(".parquet") for f in os.listdir(src))
    assert n_small >= 12

    dst = str(tmp_path / "compacted")
    n_out = compact_parquet_dir(
        spark, src, dst, target_file_bytes=1 << 30, sort_cols=["l_orderkey"]
    )
    assert n_out == 1
    n_files = sum(f.endswith(".parquet") for f in os.listdir(dst))
    assert n_files == 1
    assert spark.read.parquet(dst).count() == spark.read.parquet(src).count()
