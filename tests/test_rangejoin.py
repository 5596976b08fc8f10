"""Range join: boundary semantics + plan shape."""

from __future__ import annotations

import datetime as dt

from movie_rankings_spark.operators.rangejoin import lookback_range_join
from movie_rankings_spark.plans import all_queries


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_rangejoin_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T01:00:00"))],
        "lid int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01T01:00:00")),  # delta=0: excluded
            (101, 10, _ts("2024-01-01T00:30:00")),  # delta=30m: included
            (102, 10, _ts("2024-01-01T00:29:59")),  # just outside
            (103, 10, _ts("2024-01-01T00:59:00")),  # inside, crosses bin
            (104, 99, _ts("2024-01-01T00:59:00")),  # other key
        ],
        "rid int, user_id int, ts timestamp",
    )
    out = lookback_range_join(
        left, right, keys=["user_id"], ts_col="ts", window_seconds=1800
    )
    got = {r["r_rid"]: r["delta_us"] for r in out.collect()}
    assert got == {101: 1800 * 1_000_000, 103: 60 * 1_000_000}


def test_rangejoin_query_no_nested_loop(spark, sf_dir):
    """The binned form must plan as an equi-join — the whole point is
    avoiding the per-key-quadratic theta join."""
    df = all_queries.QUERIES["rangejoin_purchase_context"](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
