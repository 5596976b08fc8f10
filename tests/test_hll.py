"""Deterministic md5-register HLL (operators/hllsketch.py): register
derivation against a pure-Python reference, merge-vs-rebuild identity
(the mergeability contract), and estimate accuracy at a cardinality
where the raw estimator is in-regime."""

from __future__ import annotations

import hashlib
import math

import pytest

from pyspark.sql import functions as F

from movie_rankings_spark.operators import hllsketch


def _py_fields(key: int, p: int) -> tuple[int, int]:
    h = hashlib.md5(str(key).encode()).hexdigest()
    idx = int(h[:8], 16) % (2**p)
    tail = int(h[8:16], 16)
    if tail == 0:
        return idx, 33
    # leading zeros in a 32-bit field
    rank = 32 - tail.bit_length() + 1
    return idx, rank


def test_register_fields_match_python_reference(spark):
    df = spark.range(0, 2000).select(F.col("id"))
    idx, rank = hllsketch.hll_fields(F.col("id"), p=8)
    rows = df.select("id", idx.alias("idx"), rank.alias("rank")).collect()
    for r in rows:
        want = _py_fields(r["id"], 8)
        assert (r["idx"], r["rank"]) == want, r["id"]


def test_merge_equals_rebuild(spark):
    """Registers merged from per-day shards must equal registers built
    over the union in one pass — max is associative/commutative."""
    df = spark.range(0, 5000).select(
        F.col("id"),
        (F.col("id") % 7).alias("day"),
        F.lit("t").alias("g"),
    )
    daily = hllsketch.hll_build(df, "id", ["g", "day"], p=8)
    merged = hllsketch.hll_merge_estimate(daily, ["g"], p=8)
    direct = hllsketch.hll_merge_estimate(
        hllsketch.hll_build(df.withColumn("day", F.lit(0)), "id", ["g", "day"], p=8),
        ["g"],
        p=8,
    )
    assert merged.collect() == direct.collect()


@pytest.mark.parametrize("n,p", [(50_000, 8), (20_000, 10)])
def test_raw_estimate_accuracy_in_regime(spark, n, p):
    """With n >> 2.5·m the raw α·m²/Z estimate applies; stderr is
    ~1.04/sqrt(m), gate at 4 sigma."""
    df = spark.range(0, n).select(F.col("id"), F.lit("x").alias("g"))
    regs = hllsketch.hll_build(df.withColumn("day", F.lit(0)), "id", ["g", "day"], p=p)
    est = hllsketch.hll_merge_estimate(regs, ["g"], p=p).collect()[0]
    m = 2**p
    rel_err = abs(est["raw_estimate"] - n) / n
    assert rel_err < 4 * 1.04 / math.sqrt(m), (est["raw_estimate"], n)


def test_estimate_arithmetic_from_integer_stats(spark):
    """raw_estimate must be exactly α·m² / (scaled/2^33) — recomputable
    from the integer outputs (the cross-engine determinism argument)."""
    df = spark.range(0, 3000).select(F.col("id"), F.lit("x").alias("g"))
    regs = hllsketch.hll_build(df.withColumn("day", F.lit(0)), "id", ["g", "day"], p=8)
    r = hllsketch.hll_merge_estimate(regs, ["g"], p=8).collect()[0]
    m = 256
    z_scaled = r["scaled_sum_set"] + (m - r["n_set"]) * (1 << 33)
    expect = (hllsketch._alpha(m) * m * m) / (z_scaled / float(2**33))
    assert r["raw_estimate"] == expect
