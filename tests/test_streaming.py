"""Streaming tier tests: stream/batch equivalence (beyond the oracle
gate) and stateful dedup within watermark on a planted-duplicate
stream."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from movie_rankings_spark.streaming import events as ev


def test_tumbling_stream_equals_batch(spark, sf_dir):
    stream_out = ev.run_to_batch(
        ev.tumbling_daily_counts(ev.events_stream(spark, sf_dir))
    )
    from movie_rankings_spark.catalog import load_table

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
                 "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "sum_value"
            ),
        )
    )
    s = {tuple(r) for r in stream_out.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b


def test_dedup_within_watermark_removes_planted_dups(spark, tmp_path):
    src_dir = str(tmp_path / "dup_stream")
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
        (1, "2024-01-01 10:00:05", 1, "view", 1.0, "{}"),  # dup id, within wm
        (2, "2024-01-01 10:01:00", 1, "click", 2.0, "{}"),
        (3, "2024-01-01 10:02:00", 2, "view", 3.0, "{}"),
        (3, "2024-01-01 10:02:00", 2, "view", 3.0, "{}"),  # exact dup row
        (4, "2024-01-01 10:03:00", 2, "purchase", 4.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts_s string, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.write.mode("overwrite").parquet(src_dir)

    stream = spark.readStream.schema(df.schema).parquet(src_dir)
    deduped = ev.dedup_within_watermark(stream, watermark="1 hour")
    out = ev.run_to_batch(deduped, output_mode="append")
    ids = sorted(r["event_id"] for r in out.collect())
    assert ids == [1, 2, 3, 4]


def test_session_counts_merge_within_gap(spark, tmp_path):
    src_dir = str(tmp_path / "session_stream")
    rows = [
        (1, "2024-01-01 10:00:00", 7, "view", 1.0, "{}"),
        (2, "2024-01-01 10:10:00", 7, "view", 1.0, "{}"),  # same session
        (3, "2024-01-01 11:30:00", 7, "view", 1.0, "{}"),  # gap > 30m → new
        (4, "2024-01-01 10:00:00", 8, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts_s string, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(df.schema).parquet(src_dir)
    out = ev.run_to_batch(ev.session_counts(stream))
    got = {
        (r["user_id"], r["n_events"]) for r in out.collect()
    }
    assert got == {(7, 2), (7, 1), (8, 1)}


def test_user_lifetime_stats_matches_batch_agg(spark, sf_dir):
    """The applyInPandasWithState operator's final emissions must equal
    the plain batch aggregate (count + exact-decimal sum + arg-max)."""
    from pyspark.sql import Window

    out = ev.run_to_batch(
        ev.user_lifetime_stats(ev.events_stream(spark, sf_dir)),
        output_mode="update",
    )
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    got = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 6), r["last_event_type"])
        for r in out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .collect()
    }
    from movie_rankings_spark.catalog import load_table

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("s"),
            F.max_by("event_type", "ts").alias("t"),
        )
    )
    want = {
        r["user_id"]: (r["n"], round(r["s"], 6), r["t"]) for r in batch.collect()
    }
    assert got == want


def test_stream_dedup_exact_distinct(spark, sf_dir):
    out = ev.run_to_batch(
        ev.dedup_user_event_types(ev.events_stream(spark, sf_dir)),
        output_mode="append",
    )
    assert out.count() == out.select("user_id", "event_type").distinct().count()


def test_stream_incremental_dedup_equals_batch_and_is_exactly_once(spark, sf_dir):
    """The streamed pairs table must equal the one-shot batch
    incremental dedup, and re-draining the same checkpoint must not
    duplicate rows (exactly-once file processing)."""
    import os
    import uuid

    from pyspark.sql import functions as F

    from movie_rankings_spark.catalog import load_table
    from movie_rankings_spark.operators.dedup import incremental_neardup_pairs
    from movie_rankings_spark.plans.streaming_queries import _stage_dedup_stream
    from movie_rankings_spark.streaming.dedup_stream import (
        DOCS_SCHEMA,
        stream_incremental_dedup,
    )
    from movie_rankings_spark.streaming.events import _CHECKPOINT_ROOT

    src_dir, idx_dir = _stage_dedup_stream(spark, sf_dir)
    run = os.path.join(
        os.path.dirname(_CHECKPOINT_ROOT), "dedup_stream_t", uuid.uuid4().hex[:8]
    )
    out, ckpt = os.path.join(run, "pairs"), os.path.join(run, "ckpt")

    def drain():
        stream = (
            spark.readStream.schema(DOCS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        stream_incremental_dedup(stream, idx_dir, out, ckpt)

    drain()
    streamed = {
        (r["batch_doc"], r["corpus_doc"], round(r["jaccard"], 12))
        for r in spark.read.parquet(out).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    hb = F.substring(F.md5(F.col("doc_id").cast("string")), 30, 1)
    batch_ans = {
        (r["batch_doc"], r["corpus_doc"], round(r["jaccard"], 12))
        for r in incremental_neardup_pairs(
            docs.filter(hb.isin("0", "1")), docs.filter(~hb.isin("0", "1"))
        ).collect()
    }
    assert streamed == batch_ans and len(streamed) > 0
    n_before = spark.read.parquet(out).count()
    drain()  # same checkpoint: no new files -> no new rows
    assert spark.read.parquet(out).count() == n_before


def test_stream_cms_cells_equal_batch_sketch(spark, sf_dir):
    """After draining 3 micro-batches, the maintained cells table is
    bit-identical to the one-shot sketch; re-draining the checkpoint
    changes nothing."""
    import os
    import uuid

    from pyspark.sql import functions as F

    from movie_rankings_spark.operators.cms import cms_build
    from movie_rankings_spark.plans.streaming_queries import _stage_split_docs
    from movie_rankings_spark.streaming.dedup_stream import DOCS_SCHEMA
    from movie_rankings_spark.streaming.events import _CHECKPOINT_ROOT
    from movie_rankings_spark.streaming.sketch_stream import (
        current_cells,
        stream_cms_maintenance,
    )

    src = _stage_split_docs(spark, sf_dir, n=3)
    run = os.path.join(
        os.path.dirname(_CHECKPOINT_ROOT), "cms_stream_t", uuid.uuid4().hex[:8]
    )
    cells_dir, ckpt = os.path.join(run, "cells"), os.path.join(run, "ckpt")

    def drain():
        stream = (
            spark.readStream.schema(DOCS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        stream_cms_maintenance(stream, cells_dir, ckpt, depth=3, width=64)

    drain()
    maintained = {
        (r["row"], r["bucket"]): r["n"]
        for r in current_cells(spark, cells_dir).collect()
    }
    toks = (
        spark.read.parquet(src)
        .select(F.explode(F.split("text", " ")).alias("word"))
    )
    batch = {
        (r["row"], r["bucket"]): r["n"]
        for r in cms_build(toks, "word", 3, 64).collect()
    }
    assert maintained == batch and len(batch) > 0
    drain()
    again = {
        (r["row"], r["bucket"]): r["n"]
        for r in current_cells(spark, cells_dir).collect()
    }
    assert again == batch


def test_stream_bitmaps_equal_batch_and_or_is_idempotent(spark, sf_dir):
    """Maintained daily bitmaps == batch-built bitmaps cell-for-cell;
    re-draining (idempotent OR) changes nothing."""
    import os
    import uuid

    from pyspark.sql import functions as F

    from movie_rankings_spark.catalog import load_table
    from movie_rankings_spark.plans.streaming_queries import _stage_split_events
    from movie_rankings_spark.streaming import events as ev
    from movie_rankings_spark.streaming.sketch_stream import (
        current_cells,
        stream_bitmap_maintenance,
    )

    src = _stage_split_events(spark, sf_dir, n=4)
    run = os.path.join(
        os.path.dirname(ev._CHECKPOINT_ROOT), "bm_stream_t", uuid.uuid4().hex[:8]
    )
    bm_dir, ckpt = os.path.join(run, "bm"), os.path.join(run, "ckpt")

    def drain():
        stream_bitmap_maintenance(
            ev.read_events_stream(spark, src, maxFilesPerTrigger=1), bm_dir, ckpt
        )

    drain()
    maintained = {
        (r["event_type"], str(r["day"]), r["buck"]): bytes(r["bm"])
        for r in current_cells(spark, bm_dir).collect()
    }
    batch = {
        (r["event_type"], str(r["day"]), r["buck"]): bytes(r["bm"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.to_date("ts").alias("day"),
            F.expr("bitmap_bucket_number(user_id)").alias("buck"),
        )
        .agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"))
        .collect()
    }
    assert maintained == batch and len(batch) > 0
    drain()
    again = {
        (r["event_type"], str(r["day"]), r["buck"]): bytes(r["bm"])
        for r in current_cells(spark, bm_dir).collect()
    }
    assert again == batch


def test_rocksdb_state_store_provider_equals_batch(spark, sf_dir):
    """The RocksDB state-store provider — the backend whose state
    capacity is disk-bounded, i.e. the 100 TB configuration — must
    run the watermarked windowed aggregate and produce exactly the
    in-memory provider's (= batch) result."""
    from pyspark.sql import functions as F

    from movie_rankings_spark.catalog import load_table
    from movie_rankings_spark.streaming import events as ev

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        out = ev.run_to_batch(
            ev.tumbling_daily_counts(ev.events_stream(spark, sf_dir))
        )
        got = {
            (r["day"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in out.collect()
        }
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

    e = load_table(spark, sf_dir, "events")
    want = {
        (r["day"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in e.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_restart_resumes_aggregation_state(spark, sf_dir, tmp_path):
    """Stop-and-restart continuity: drain half the input files, stop,
    let more files arrive, re-drain the SAME checkpoint — the final
    complete-mode aggregate must equal the batch answer over ALL
    files (state restored, early files not reprocessed)."""
    import shutil

    from pyspark.sql import functions as F

    from movie_rankings_spark.plans.streaming_queries import _stage_split_events
    from movie_rankings_spark.streaming.events import read_events_stream

    staged = _stage_split_events(spark, sf_dir, n=4)
    parts = sorted(
        p.name for p in __import__("pathlib").Path(staged).glob("part-*")
    )
    assert len(parts) == 4
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def drain(qname):
        stream = read_events_stream(spark, str(src))
        totals = stream.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
        )
        q = (
            totals.writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["event_type"]): r["n"]
            for r in spark.sql(f"SELECT * FROM {qname}").collect()
        }

    for p in parts[:2]:
        shutil.copy(f"{staged}/{p}", src / p)
    first = drain("restart_t1")

    for p in parts[2:]:
        shutil.copy(f"{staged}/{p}", src / p)
    second = drain("restart_t2")

    full = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(staged)
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert second == full
    partial_total = sum(first.values())
    assert 0 < partial_total < sum(full.values())


def test_stream_histogram_cells_equal_batch_daily(spark, sf_dir):
    """After draining 4 micro-batches, the maintained per-(type, day,
    bin) histogram cells are bit-identical to the one-shot batch daily
    build (cell addition is a commutative monoid); re-draining the
    checkpoint changes nothing."""
    import os
    import uuid

    from pyspark.sql import functions as F

    from movie_rankings_spark.plans.streaming_queries import (
        _stage_split_events,
    )
    from movie_rankings_spark.streaming import events as ev
    from movie_rankings_spark.streaming.events import _CHECKPOINT_ROOT
    from movie_rankings_spark.streaming.sketch_stream import (
        current_cells,
        stream_histogram_maintenance,
    )

    src = _stage_split_events(spark, sf_dir, n=4)
    run = os.path.join(
        os.path.dirname(_CHECKPOINT_ROOT), "hist_stream_t", uuid.uuid4().hex[:8]
    )
    cells_dir, ckpt = os.path.join(run, "cells"), os.path.join(run, "ckpt")

    def drain():
        stream = ev.read_events_stream(spark, src, maxFilesPerTrigger=1)
        stream_histogram_maintenance(
            stream, cells_dir, ckpt, lo=0.0, step=25.0, n_bins=20
        )

    drain()
    maintained = {
        (r["event_type"], str(r["day"]), r["bin"]): r["n"]
        for r in current_cells(spark, cells_dir).collect()
    }
    e = spark.read.parquet(src)
    v = F.col("value")
    bin_ = F.least(
        F.lit(19), F.greatest(F.lit(0), F.floor(v / F.lit(25.0)).cast("int"))
    )
    batch = {
        (r["event_type"], str(r["day"]), r["bin"]): r["n"]
        for r in e.filter(v.isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"), bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert maintained == batch and len(batch) > 0
    drain()
    again = {
        (r["event_type"], str(r["day"]), r["bin"]): r["n"]
        for r in current_cells(spark, cells_dir).collect()
    }
    assert again == batch
