"""PPS / Horvitz–Thompson sampling (operators/pps.py): selection
against a pure-Python reference draw, HT unbiasedness-in-expectation
sanity (the realized estimate lands near the truth), and the
certainty-unit invariant."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from movie_rankings_spark.operators import pps


def _u16(key: int, salt: str = "pps") -> int:
    return int(
        hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:4], 16
    )


def _make(spark, n=400):
    # weights spanning 3 orders of magnitude, id-derived (stable)
    rows = [(i, "g%d" % (i % 3), float((i * 37) % 997 + 1)) for i in range(n)]
    return spark.createDataFrame(rows, "id long, grp string, val double")


def test_selection_matches_python_reference(spark):
    df = _make(spark)
    n_target = 60
    rep = pps.pps_sample_report(
        df, "id", "val", ["grp"], n_target=n_target
    ).collect()
    # python twin
    rows = [(i, "g%d" % (i % 3), round(((i * 37) % 997 + 1) * 100)) for i in range(400)]
    W = sum(w for _, _, w in rows)
    by_grp: dict[str, list[int]] = {}
    for i, g, w in rows:
        sampled = _u16(i) * W < n_target * w * pps.U_SCALE
        by_grp.setdefault(g, []).append(1 if sampled else 0)
    for r in rep:
        assert r["n_sampled"] == sum(by_grp[r["grp"]]), r["grp"]
        assert r["n_rows"] == len(by_grp[r["grp"]])


def test_ht_estimates_near_truth(spark):
    df = _make(spark, n=1000)
    rep = (
        pps.pps_sample_report(df, "id", "val", [], n_target=300)
        .collect()[0]
    )
    # one realized Poisson-PPS draw: HT should land within ~15% of the
    # population values at this sample rate
    assert abs(rep["ht_count_est"] - rep["n_rows"]) / rep["n_rows"] < 0.15
    assert abs(rep["ht_total_est"] - rep["total_w"]) / rep["total_w"] < 0.15


def test_certainty_units_always_sampled(spark):
    # one giant weight forces pi=1 for that row
    rows = [(i, float(1.0 if i else 1e7)) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, val double")
    rep = pps.pps_sample_report(df, "id", "val", [], n_target=5).collect()[0]
    assert rep["n_certainty"] >= 1
    # certainty rows must be in the sample: u·W < n·w·2^16 whenever
    # n·w ≥ W and u < 2^16
    assert rep["n_sampled"] >= rep["n_certainty"]
