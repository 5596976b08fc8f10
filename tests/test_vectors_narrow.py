"""r10 optimization: the NARROW (Long-backed DECIMAL(18,12)) exact
vector tier must be value-identical to the wide DECIMAL(28,12) path
across its documented validity envelope (per-element products and
partial fold sums below 10^6) — same HALF_UP rounding, 10x less
interpreted-HOF cost."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from movie_rankings_spark.functions.vectors import (
    NARROW,
    cosine_exact,
    dot_exact,
    dot_exact_dec,
    norm_sq_exact,
)


@pytest.fixture(scope="module")
def vecs(spark):
    # pseudo-random float32 vectors spanning magnitudes up to the
    # envelope edge: |x| <= 100, d = 64 -> d.B^2 = 6.4e5 < 1e6
    # (id starts at 1: id=0 would make `a` the all-zero vector, whose
    # cosine is a divide-by-zero under ANSI — out of cosine's domain)
    return spark.range(1, 2_001).select(
        "id",
        F.expr(
            "transform(sequence(1,64), i -> cast(sin(id*i)*100 as float))"
        ).alias("a"),
        F.expr(
            "transform(sequence(1,64), i -> cast(cos(id*i+1)*100 as float))"
        ).alias("b"),
    )


def test_dot_narrow_equals_wide(vecs):
    bad = vecs.filter(
        dot_exact(F.col("a"), F.col("b"), NARROW)
        != dot_exact(F.col("a"), F.col("b"))
    ).count()
    assert bad == 0


def test_dot_dec_narrow_equals_wide_as_decimal(vecs):
    # compare through a common type so the check is on VALUES
    bad = vecs.filter(
        dot_exact_dec(F.col("a"), F.col("b"), NARROW).cast("decimal(28,12)")
        != dot_exact_dec(F.col("a"), F.col("b"))
    ).count()
    assert bad == 0


def test_norm_and_cosine_narrow_equals_wide(vecs):
    bad = vecs.filter(
        (norm_sq_exact(F.col("a"), NARROW) != norm_sq_exact(F.col("a")))
        | (
            cosine_exact(F.col("a"), F.col("b"), NARROW)
            != cosine_exact(F.col("a"), F.col("b"))
        )
    ).count()
    assert bad == 0


def test_envelope_edge_value(spark):
    # a hand-sized case at the documented edge: products of +/-100.0
    # elements, 64 dims -> |dot| = 640000 < 10^6 stays exact
    df = spark.range(1).select(
        F.expr("transform(sequence(1,64), i -> cast(100.0 as float))").alias(
            "a"
        ),
        F.expr("transform(sequence(1,64), i -> cast(-100.0 as float))").alias(
            "b"
        ),
    )
    row = df.select(
        dot_exact(F.col("a"), F.col("b"), NARROW).alias("n"),
        dot_exact(F.col("a"), F.col("b")).alias("w"),
    ).first()
    assert row["n"] == row["w"] == -640000.0
