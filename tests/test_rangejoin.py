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


def test_interval_overlap_matches_theta_join(spark):
    """Binned overlap join must equal the brute-force theta join on
    random intervals, including pairs straddling bin boundaries and
    intervals at exactly the max length."""
    import random

    from pyspark.sql import functions as F

    from movie_rankings_spark.operators.rangejoin import interval_overlap_join

    rng = random.Random(3)
    base = _ts("2024-01-01T00:00:00")

    def mk(n, id0):
        rows = []
        for i in range(n):
            start = base + dt.timedelta(seconds=rng.randrange(0, 36_000))
            length = rng.choice([1, 300, 1800, 3600])  # up to max exactly
            rows.append((id0 + i, rng.randrange(3), start,
                         start + dt.timedelta(seconds=length)))
        return spark.createDataFrame(
            rows, "iid int, user_id int, s timestamp, e timestamp"
        )

    left, right = mk(60, 0), mk(60, 1000)
    got = {
        (r["user_id"], r["l_iid"], r["r_iid"], r["overlap_us"])
        for r in interval_overlap_join(
            left, right, keys=["user_id"], start_col="s", end_col="e",
            max_len_seconds=3600,
        ).collect()
    }
    l = left.select("user_id", F.col("iid").alias("a"),
                    F.col("s").alias("ls"), F.col("e").alias("le"))
    r = right.select(F.col("user_id").alias("u2"), F.col("iid").alias("b"),
                     F.col("s").alias("rs"), F.col("e").alias("re"))
    brute = {
        (row["user_id"], row["a"], row["b"], row["o"])
        for row in l.join(
            r,
            (F.col("user_id") == F.col("u2"))
            & (F.col("ls") <= F.col("re"))
            & (F.col("rs") <= F.col("le")),
        ).select(
            "user_id", "a", "b",
            (F.unix_micros(F.least("le", "re"))
             - F.unix_micros(F.greatest("ls", "rs"))).alias("o"),
        ).collect()
    }
    assert got == brute and len(brute) > 0


def test_rangejoin_query_no_nested_loop(spark, sf_dir):
    """The binned form must plan as an equi-join — the whole point is
    avoiding the per-key-quadratic theta join."""
    df = all_queries.QUERIES["rangejoin_purchase_context"](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
