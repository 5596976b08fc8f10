"""Library-scoped persist tracking (movie_rankings_spark/caching.py):
operators' persisted intermediates must be releasable WITHOUT touching
the consumer's own cache (the r5 advice fix — previously the only
remedy for leaked intermediates was catalog-wide clearCache)."""

from __future__ import annotations

import movie_rankings_spark as mrs


def test_release_persisted_scoped_to_library(spark, sf_dir):
    from movie_rankings_spark.operators.hllsketch import hll_pairwise_overlap

    mrs.release_persisted()  # drain anything earlier tests tracked
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = hll_pairwise_overlap(events, key="user_id", group_col="event_type")
    out.collect()
    assert mrs.tracked_count() >= 1

    consumer = spark.range(100).persist()
    consumer.count()
    try:
        released = mrs.release_persisted()
        assert released >= 1
        assert mrs.tracked_count() == 0
        # consumer's own cache untouched
        assert consumer.storageLevel.useMemory
    finally:
        consumer.unpersist()


def test_release_before_materialization_is_safe(spark, sf_dir):
    """Releasing early only forfeits reuse — the returned plan must
    still compute correctly (Spark recomputes the unpersisted frame)."""
    from movie_rankings_spark.operators.skyline import skyline_2d

    mrs.release_persisted()
    parts = spark.read.parquet(f"{sf_dir}/part.parquet")
    plan = skyline_2d(parts, "p_retailprice", "p_size")
    mrs.release_persisted()  # before the action
    rows = plan.collect()
    assert rows  # recomputed fine
