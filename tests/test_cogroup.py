"""Cogrouped-pandas as-of join (operators/cogroup.py)."""

from __future__ import annotations

from movie_rankings_spark.plans.all_queries import QUERIES


def test_cogroup_asof_matches_window_form(spark, sf_dir):
    """The cogroup merge_asof and the union+window asof implement the
    same operator — identical output on the events table."""
    a = QUERIES["asof_purchase_context"](spark, sf_dir)
    b = QUERIES["cogroup_asof_purchase"](spark, sf_dir)
    ra = [tuple(r) for r in a.collect()]
    rb = [tuple(r) for r in b.collect()]
    assert ra == rb


def test_cogroup_asof_empty_right_side(spark):
    from movie_rankings_spark.operators.cogroup import cogroup_asof_join

    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 200), (3, 99, 150)],
        "event_id long, user_id long, ts_us long",
    )
    right = spark.createDataFrame(
        [(7, 10, 50, 1.5)], "event_id long, user_id long, ts_us long, value double"
    )
    out = cogroup_asof_join(
        left,
        right,
        key="user_id",
        ts_col="ts_us",
        payload_dtypes={"event_id": "Int64", "value": "float64"},
        schema="event_id long, user_id long, ts_us long, prev_event_id long, prev_value double",
    )
    rows = {r["event_id"]: r for r in out.collect()}
    assert rows[1]["prev_event_id"] == 7
    assert rows[2]["prev_event_id"] == 7
    # user 99 has no right rows at all -> nulls survive the schema
    assert rows[3]["prev_event_id"] is None and rows[3]["prev_value"] is None


def test_cogroup_asof_strict_and_tie_dedup(spark):
    from movie_rankings_spark.operators.cogroup import cogroup_asof_join

    left = spark.createDataFrame([(1, 5, 100)], "event_id long, user_id long, ts_us long")
    right = spark.createDataFrame(
        [(8, 5, 100, 1.0), (9, 5, 90, 2.0), (4, 5, 90, 3.0)],
        "event_id long, user_id long, ts_us long, value double",
    )
    out = cogroup_asof_join(
        left,
        right,
        key="user_id",
        ts_col="ts_us",
        payload_dtypes={"event_id": "Int64", "value": "float64"},
        schema="event_id long, user_id long, ts_us long, prev_event_id long, prev_value double",
    ).collect()[0]
    # exact-ts row (event 8) excluded (strict <); tie at ts=90 -> max event_id
    assert out["prev_event_id"] == 9
    assert out["prev_value"] == 2.0
