"""Python DataSource V2 front-end (sources/datasource.py, round 3)."""

from __future__ import annotations

import json

from movie_rankings_spark.sources import datasource
from movie_rankings_spark.sources.html import scraped_from_sources
from movie_rankings_spark.sources.scrape_fixtures import (
    FIXTURE_SOURCES,
    FixtureFetcher,
)


def _read(spark, sources):
    datasource.register(spark)
    return (
        spark.read.format("movie_rankings")
        .option("fetcher", "fixture")
        .option(
            "sources",
            json.dumps([{"url": s.url, "dialect": s.dialect} for s in sources]),
        )
        .load()
    )


def test_matches_mapinpandas_ingestion(spark):
    via_ds = {tuple(r) for r in _read(spark, FIXTURE_SOURCES).collect()}
    via_map = {
        tuple(r)
        for r in scraped_from_sources(
            spark, FIXTURE_SOURCES, FixtureFetcher()
        ).collect()
    }
    assert via_ds == via_map and via_ds


def test_one_partition_per_source(spark):
    assert _read(spark, FIXTURE_SOURCES).rdd.getNumPartitions() == 3
    assert _read(spark, FIXTURE_SOURCES[:1]).rdd.getNumPartitions() == 1


def test_dead_source_yields_zero_rows_not_failure(spark):
    from movie_rankings_spark.sources.html import SourceSpec

    dead = FIXTURE_SOURCES + (SourceSpec("fixture://no-such-page", "imdb"),)
    good = _read(spark, FIXTURE_SOURCES).count()
    assert _read(spark, dead).count() == good
