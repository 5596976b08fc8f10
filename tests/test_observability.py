"""Streaming observability (streaming/observability.py): the
ProgressCapture listener must record per-microbatch metrics for a real
availableNow run, expose them as a DataFrame, and roll them up into
the per-query health summary."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from movie_rankings_spark.streaming import events as ev
from movie_rankings_spark.streaming.observability import (
    ProgressCapture,
    batch_health_summary,
)


def test_listener_captures_progress_and_summarizes(spark, sf_dir):
    cap = ProgressCapture()
    spark.streams.addListener(cap)
    try:
        agg = ev.tumbling_daily_counts(ev.events_stream(spark, sf_dir))
        q = (
            agg.writeStream.format("memory")
            .queryName("obs_probe")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener callbacks are async — give the bus a moment
        for _ in range(50):
            if cap.records() and cap.terminated:
                break
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(cap)

    assert cap.started, "onQueryStarted never fired"
    recs = cap.records()
    assert recs, "no progress events captured"
    total_rows = sum(r["input_rows"] for r in recs)
    assert total_rows > 0
    assert all(r["batch_id"] >= 0 for r in recs)
    # the tumbling agg is stateful: state metrics must be populated
    assert any(r["state_rows"] > 0 for r in recs)

    df = cap.to_df(spark)
    assert df.count() == len(recs)
    summary = batch_health_summary(df).collect()
    assert len(summary) == 1
    row = summary[0]
    assert row["total_input_rows"] == total_rows
    assert row["n_batches"] == len(recs)
    assert row["max_state_rows"] > 0


def test_empty_capture_yields_empty_frame(spark):
    cap = ProgressCapture()
    df = cap.to_df(spark)
    assert df.count() == 0
    assert batch_health_summary(df).count() == 0
    assert "query_id" in df.columns and "state_bytes" in df.columns
