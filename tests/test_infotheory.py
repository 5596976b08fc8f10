"""Mutual information, Cohen's kappa (operators/infotheory.py) and
the top-fraction coverage curve (operators/statistics.py): known
closed-form cases, invariants, and tie handling."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from movie_rankings_spark.operators.infotheory import (
    cohens_kappa,
    mutual_information_cells,
)
from movie_rankings_spark.operators.statistics import coverage_topfrac


def test_mi_independent_columns_is_zero(spark):
    # perfectly independent 2x2: every PMI is ln(1) = 0
    rows = []
    for a in ("x", "y"):
        for b in ("u", "v"):
            rows += [(a, b)] * 25
    df = spark.createDataFrame(rows, "a string, b string")
    out = mutual_information_cells(df, "a", "b").collect()
    assert len(out) == 4
    for r in out:
        assert r["pmi_q9"] == 0 and r["mi_contrib_q9"] == 0
        assert r["grand_total"] == 100 and r["row_total"] == 50


def test_mi_perfect_dependence_is_entropy(spark):
    # a == b with two equally likely values: MI = H = ln 2
    rows = [("x", "x")] * 30 + [("y", "y")] * 30
    df = spark.createDataFrame(rows, "a string, b string")
    out = mutual_information_cells(df, "a", "b").collect()
    assert len(out) == 2
    mi = sum(r["mi_contrib_q9"] for r in out) / (60 * 1e9)
    assert abs(mi - math.log(2)) < 1e-8


def test_kappa_identical_raters_is_one(spark):
    df = spark.createDataFrame(
        [(i, i % 2) for i in range(50)], "k long, y int"
    )
    r = cohens_kappa(df, F.col("y"), F.col("y")).collect()[0]
    assert r["po"] == 1.0 and r["kappa"] == 1.0
    assert r["n_agree"] == 50


def test_kappa_independent_raters_near_zero(spark):
    # rater a = parity of i, rater b = parity of i // 2: independent
    # over a full period -> po == pe exactly -> kappa == 0
    df = spark.createDataFrame(
        [(i, i % 2, (i // 2) % 2) for i in range(100)],
        "k long, a int, b int",
    )
    r = cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
    assert r["pe"] == 0.5 and r["po"] == 0.5
    assert r["kappa"] == 0.0


def test_kappa_opposite_raters_is_negative(spark):
    df = spark.createDataFrame(
        [(i, i % 2, 1 - i % 2) for i in range(40)], "k long, a int, b int"
    )
    r = cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
    assert r["po"] == 0.0 and r["kappa"] == -1.0


def test_coverage_uniform_values_is_diagonal(spark):
    # all docs identical length: top p% holds exactly p% (ties
    # pro-rated) — the Lorenz diagonal
    df = spark.createDataFrame([(i, 100) for i in range(200)], "k long, v int")
    out = {r["pct_docs"]: r for r in coverage_topfrac(df, "v", [10, 50]).collect()}
    assert out[10]["k_docs"] == 20 and out[10]["covered_value"] == 2000
    assert out[10]["share"] == 2000 / 20000
    assert out[50]["share"] == 0.5


def test_coverage_concentrated_values(spark):
    # one doc holds 9100 of 10090 chars: top 1% (=1 doc of 100) covers it
    rows = [(0, 9100)] + [(i, 10) for i in range(1, 100)]
    df = spark.createDataFrame(rows, "k long, v int")
    out = {r["pct_docs"]: r for r in coverage_topfrac(df, "v", [1, 50]).collect()}
    assert out[1]["k_docs"] == 1
    assert out[1]["threshold_value"] == 9100
    assert out[1]["covered_value"] == 9100
    # top 50 docs: the giant + 49 tens
    assert out[50]["covered_value"] == 9100 + 49 * 10
    assert out[50]["s_total"] == 9100 + 99 * 10


def test_coverage_monotone_on_fixture(spark, sf_dir):
    from movie_rankings_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = coverage_topfrac(docs, "n_chars", [1, 5, 10, 25, 50]).collect()
    shares = [r["share"] for r in sorted(out, key=lambda r: r["pct_docs"])]
    assert all(0.0 < s <= 1.0 for s in shares)
    assert shares == sorted(shares)  # more docs -> more coverage
    # concentration: top p% holds at least p% of chars
    for r in out:
        assert r["share"] >= r["pct_docs"] / 100.0 - 1e-12
