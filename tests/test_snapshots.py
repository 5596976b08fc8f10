"""Snapshot diff, fingerprint projection, and partial-agg merge
(operators/snapshots.py), plus the time-series gap-fill recurrence
(operators/timeseries.py) against hand-computed references."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from movie_rankings_spark.operators.snapshots import (
    merge_partial_aggs,
    snapshot_diff,
    with_fingerprint,
)
from movie_rankings_spark.operators.timeseries import gapfill_daily


def _classify(spark):
    old = spark.createDataFrame(
        [(1, "A", "p1"), (2, "B", "p2"), (3, "C", "p3"), (4, None, "p4")],
        "k int, status string, prio string",
    )
    new = spark.createDataFrame(
        [(1, "A", "p1"), (2, "X", "p2"), (4, "D", "p4"), (5, "E", "p5")],
        "k int, status string, prio string",
    )
    return snapshot_diff(old, new, keys=["k"], payload=["status", "prio"])


def test_snapshot_diff_classification(spark):
    got = {r["k"]: r["change_type"] for r in _classify(spark).collect()}
    # 3 removed, 5 added, 2 value-changed, 4 NULL→value changed, 1 same
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "changed",
        5: "added",
    }


def test_fingerprint_agrees_with_columnwise_diff(spark):
    old = spark.createDataFrame(
        [(1, "A", "p"), (2, None, "p"), (3, "", "p")],
        "k int, status string, prio string",
    )
    new = spark.createDataFrame(
        [(1, "A", "p"), (2, "", "p"), (3, None, "p")],
        "k int, status string, prio string",
    )
    fo = with_fingerprint(old, ["k"], ["status", "prio"]).withColumnRenamed(
        "fingerprint", "f_old"
    )
    fn = with_fingerprint(new, ["k"], ["status", "prio"]).withColumnRenamed(
        "fingerprint", "f_new"
    )
    hashes = {
        r["k"]: r["f_old"] == r["f_new"] for r in fo.join(fn, "k").collect()
    }
    cols = {
        r["k"]: r["change_type"] == "unchanged"
        for r in snapshot_diff(
            old, new, keys=["k"], payload=["status", "prio"]
        ).collect()
    }
    # NULL vs '' must be distinguished by the sentinel encoding
    assert hashes == cols == {1: True, 2: False, 3: False}


def test_merge_partial_aggs_equals_full_recompute(spark, sf_dir):
    from movie_rankings_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")

    def partial(df):
        return df.groupBy(F.year("o_orderdate").alias("yr")).agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
            F.count(F.lit(1)).alias("n_rows"),
        )

    split = F.lit("1997-01-01").cast("timestamp")
    merged = merge_partial_aggs(
        [
            partial(orders.filter(F.col("o_orderdate") < split)),
            partial(orders.filter(F.col("o_orderdate") >= split)),
        ],
        keys=["yr"],
        sum_cols=["rev"],
    )
    full = partial(orders).withColumnRenamed("n_rows", "n_rows")
    got = {r["yr"]: (r["rev"], r["n_rows"]) for r in merged.collect()}
    want = {r["yr"]: (r["rev"], r["n_rows"]) for r in full.collect()}
    assert got == want  # decimal partials merge exactly


def test_gapfill_daily_fills_and_interpolates(spark):
    d = datetime.datetime
    events = spark.createDataFrame(
        [
            (1, d(2024, 1, 1, 5), 10.0),
            (1, d(2024, 1, 4, 5), 40.0),
            (1, d(2024, 1, 4, 9), 2.0),
            (2, d(2024, 1, 2, 0), 7.0),
        ],
        "user_id int, ts timestamp, value double",
    )
    rows = {
        (r["user_id"], str(r["day"])): r
        for r in gapfill_daily(events).collect()
    }
    assert len(rows) == 5  # user 1: Jan 1-4 dense; user 2: single day
    gap2 = rows[(1, "2024-01-02")]
    assert gap2["day_value"] is None
    assert gap2["ffill_value"] == 10.0
    # linear between 10 (day 1) and 42 (day 4): 10 + 32 * 1/3
    assert abs(gap2["interp_value"] - (10.0 + 32.0 / 3.0)) < 1e-12
    gap3 = rows[(1, "2024-01-03")]
    assert abs(gap3["interp_value"] - (10.0 + 32.0 * 2.0 / 3.0)) < 1e-12
    obs4 = rows[(1, "2024-01-04")]
    assert obs4["day_value"] == 42.0 == obs4["interp_value"] == obs4["ffill_value"]
    solo = rows[(2, "2024-01-02")]
    assert solo["interp_value"] == 7.0 == solo["ffill_value"]


def test_gapfill_single_shuffle_for_both_windows(spark):
    events = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 1.0)],
        "user_id int, ts timestamp, value double",
    )
    plan = gapfill_daily(events)._jdf.queryExecution().executedPlan().toString()
    # both fill directions (backward last_value + forward first_value
    # frames) must fuse into ONE Window operator over one
    # (user_id, day) sort — no second sort/exchange for the
    # forward-looking frames
    assert plan.count("Window [") == 1
