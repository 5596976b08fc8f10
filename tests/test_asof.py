"""as-of join: semantics on hand-built frames + the events query."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from movie_rankings_spark.operators.asof import asof_join
from movie_rankings_spark.plans import all_queries


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T00:10:00")),
            (2, 10, _ts("2024-01-01T00:20:00")),
            (3, 10, _ts("2024-01-01T00:05:00")),  # before any right row
            (4, 20, _ts("2024-01-01T09:00:00")),  # key with no right rows
        ],
        "qid int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01T00:10:00"), 1.0),  # same-ts as qid=1
            (101, 10, _ts("2024-01-01T00:12:00"), 2.0),
            (102, 10, _ts("2024-01-01T00:07:00"), 3.0),
        ],
        "rid int, user_id int, ts timestamp, val double",
    )
    return left, right


def test_asof_strict_latest_prior(spark):
    left, right = _frames(spark)
    out = {
        r["qid"]: (r["prev_rid"], r["prev_val"])
        for r in asof_join(
            left, right, ["user_id"], "ts", ["rid", "val"], strict=True
        ).collect()
    }
    # qid=1 at 00:10 must NOT see the same-ts rid=100 (strict), so 00:07
    assert out[1] == (102, 3.0)
    # qid=2 at 00:20 sees the latest prior 00:12
    assert out[2] == (101, 2.0)
    # qid=3 predates every right row -> null payload
    assert out[3] == (None, None)
    # key 20 has no right rows at all -> null payload
    assert out[4] == (None, None)


def test_asof_non_strict_includes_same_ts(spark):
    left, right = _frames(spark)
    out = {
        r["qid"]: r["prev_rid"]
        for r in asof_join(
            left, right, ["user_id"], "ts", ["rid", "val"], strict=False
        ).collect()
    }
    assert out[1] == 100  # same-ts row is visible with <=
    assert out[2] == 101


def test_asof_query_no_range_join(spark, sf_dir):
    """The events as-of query must plan as one window pass — never a
    range/theta join (quadratic per key at scale)."""
    df = all_queries.QUERIES["asof_purchase_context"](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "Window" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_query_prev_is_strictly_earlier(spark, sf_dir):
    rows = (
        all_queries.QUERIES["asof_purchase_context"](spark, sf_dir)
        .filter(F.col("prev_event_id").isNotNull())
        .limit(500)
        .collect()
    )
    assert rows
    for r in rows:
        assert r["prev_event_type"] != "purchase"
