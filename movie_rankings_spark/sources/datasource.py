"""Python DataSource V2 for the ranked-lists HTML source.

SURVEY.md §2a S1 names the end state for the reference's scraper at
scale: "a DataSource V2 / spark.read.format(...) custom source". This
is that source, on Spark 4's Python DataSource API:

    spark.dataSource.register(RankingsDataSource)
    df = (spark.read.format("movie_rankings")
          .option("fetcher", "fixture")        # or "http" (default)
          .option("sources", json.dumps([{"url": ..., "dialect": ...}]))
          .load())

Compared to the mapInPandas ingestion path (sources/html.py,
`scraped_from_sources` — same extractors, same fault model), the
DataSource form gives the engine the source topology: one
InputPartition per URL, so Spark schedules, retries, and speculates
per source like any other scan, and the reader composes with every
`spark.read` feature (schema, unionByName, caching) without helper
functions. Both paths share DIALECTS and the zero-rows-on-failure
contract (reference `top_movies.py:50-67`: source dropout ≠ job
failure).
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from movie_rankings_spark.sources.html import (
    DEFAULT_SOURCES,
    SCRAPED_SCHEMA,
    SourceSpec,
)


class SourcePartition(InputPartition):
    def __init__(self, url: str, dialect: str):
        self.url = url
        self.dialect = dialect


class RankingsDataSource(DataSource):
    """`format("movie_rankings")` — one partition per ranked-list URL."""

    @classmethod
    def name(cls) -> str:
        return "movie_rankings"

    def schema(self) -> str:
        return SCRAPED_SCHEMA

    def reader(self, schema) -> "RankingsReader":
        return RankingsReader(self.options)


class RankingsReader(DataSourceReader):
    def __init__(self, options):
        raw = options.get("sources")
        if raw:
            self.sources = tuple(
                SourceSpec(s["url"], s["dialect"]) for s in json.loads(raw)
            )
        else:
            self.sources = DEFAULT_SOURCES
        self.fetcher = options.get("fetcher", "http")

    def partitions(self):
        # one partition per URL: the engine owns scheduling/retry/
        # speculation per source, the exact topology the mapInPandas
        # path had to fake with a repartition
        return [SourcePartition(s.url, s.dialect) for s in self.sources]

    def read(self, partition: SourcePartition):
        from movie_rankings_spark.sources.html import DIALECTS, http_fetch

        if self.fetcher == "fixture":
            from movie_rankings_spark.sources.scrape_fixtures import FixtureFetcher

            fetch = FixtureFetcher()
        else:
            fetch = http_fetch
        try:
            html = fetch(partition.url)
            for rank, title in DIALECTS[partition.dialect](html):
                yield (partition.url, rank, title)
        except Exception:  # noqa: BLE001 — S2: source dropout ≠ job failure
            return


def register(spark) -> None:
    """Idempotent registration of the format with a session."""
    try:
        spark.dataSource.register(RankingsDataSource)
    except Exception:  # already registered
        pass
