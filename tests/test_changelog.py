from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from movie_rankings_spark.operators.changelog import latest_snapshot


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_latest_snapshot_ties_break_on_unique_version_column(spark):
    """Two versions with an identical timestamp: the unique trailing
    version column (event_id) must decide, deterministically."""
    rows = [
        (1, "view", _ts("2024-01-01T00:00:00"), 10, 1.0),
        (1, "view", _ts("2024-01-02T00:00:00"), 20, 2.0),  # ts tie, lower id
        (1, "view", _ts("2024-01-02T00:00:00"), 21, 3.0),  # ts tie, higher id
        (2, "click", _ts("2024-01-01T00:00:00"), 30, 4.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long, value double"
    )
    out = latest_snapshot(
        df,
        keys=["user_id", "event_type"],
        version_cols=["ts", "event_id"],
        payload_cols=["value"],
    )
    got = {(r.user_id, r.event_type): r for r in out.collect()}
    assert got[(1, "view")].event_id == 21
    assert got[(1, "view")].value == 3.0
    assert got[(1, "view")].n_versions == 3
    assert got[(2, "click")].n_versions == 1


def test_latest_snapshot_matches_window_argmax(spark, sf_dir):
    """Aggregation argmax == textbook row_number()=1 on real data."""
    from pyspark.sql import Window

    from movie_rankings_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    agg = latest_snapshot(
        e,
        keys=["user_id", "event_type"],
        version_cols=["ts", "event_id"],
        payload_cols=["value", "props"],
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ref = (
        e.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "event_type", "ts", "event_id", "value", "props")
    )
    sort = ["user_id", "event_type"]
    assert (
        agg.select(*ref.columns).orderBy(*sort).collect()
        == ref.orderBy(*sort).collect()
    )
