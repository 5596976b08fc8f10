"""Interchange sources: round-trip fidelity, corrupt-row quarantine,
and scan-level pushdown where the format supports it."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_rankings_spark.catalog import load_table
from movie_rankings_spark.sources import files
from movie_rankings_spark.sources.sinks import write_csv


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


def test_csv_reader_roundtrip_with_schema(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    write_csv(src, path)
    back = files.good_rows(
        files.read_csv(
            spark, path,
            "n_nationkey int, n_name string, n_regionkey int",
        )
    )
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in src.collect()}


def test_csv_corrupt_rows_quarantined(spark, tmp_path):
    # Spark refuses scans referencing ONLY _corrupt_record, so the
    # split inspects fully-parsed rows (production: parse → persist →
    # split), matching the files.py docstring.
    p = tmp_path / "dirty.csv"
    p.write_text("a,b\n1,x\nnot_an_int,y\n2,z\n")
    rows = files.read_csv(spark, str(p), "a int, b string").collect()
    assert sum(1 for r in rows if r[files.CORRUPT_COL] is not None) == 1
    good = {(r["a"], r["b"]) for r in rows if r[files.CORRUPT_COL] is None}
    assert good == {(1, "x"), (2, "z")}


def test_jsonl_roundtrip_and_quarantine(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "region")
    path = str(tmp_path / "region_jsonl")
    files.write_jsonl(src, path)
    back = files.good_rows(
        files.read_jsonl(spark, path, "r_regionkey int, r_name string")
    )
    assert {tuple(r) for r in back.select("r_regionkey", "r_name").collect()} == {
        tuple(r) for r in src.collect()
    }

    p = tmp_path / "dirty.jsonl"
    p.write_text('{"a": 1}\n{broken\n{"a": 2}\n')
    rows = files.read_jsonl(spark, str(p), "a int").collect()
    assert sum(1 for r in rows if r[files.CORRUPT_COL] is not None) == 1
    assert sum(1 for r in rows if r[files.CORRUPT_COL] is None) == 2


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "supplier")
    path = str(tmp_path / "supplier_orc")
    files.write_orc(src, path)
    back = files.read_orc(spark, path)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in src.collect()}

    q = back.filter(F.col("s_suppkey") < 10).select("s_suppkey", "s_name")
    plan = _plan(q)
    # ORC scan must receive the filter and prune to the two columns
    assert "PushedFilters: [IsNotNull(s_suppkey), LessThan(s_suppkey,10)]" in plan
    assert "s_acctbal" not in plan.split("ReadSchema")[1]


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Schema drift across file generations: mergeSchema unifies old
    and new footers; rows from the old generation surface NULL for the
    added column (the additive-evolution contract a long-lived table
    relies on)."""
    from pyspark.sql import functions as F

    v1 = spark.range(5).select(
        F.col("id"), (F.col("id") * 2).alias("value")
    )
    v1.write.mode("overwrite").parquet(str(tmp_path / "t" / "g=1"))
    v2 = spark.range(5, 8).select(
        F.col("id"),
        (F.col("id") * 2).alias("value"),
        F.lit("new").alias("tag"),
    )
    v2.write.mode("overwrite").parquet(str(tmp_path / "t" / "g=2"))

    merged = spark.read.option("mergeSchema", "true").parquet(
        str(tmp_path / "t")
    )
    assert set(merged.columns) >= {"id", "value", "tag"}
    assert merged.count() == 8
    old_rows = merged.filter(F.col("tag").isNull()).count()
    assert old_rows == 5
    assert merged.filter(F.col("tag") == "new").count() == 3
