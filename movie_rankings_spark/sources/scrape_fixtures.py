"""Offline scrape fixtures: three static HTML pages (one per dialect,
FIXTURES.md §A 'scraped_html') plus the frozen rows their extraction
must produce. The frozen list feeds both the extraction golden test
and the `flagship_scraped` oracle VALUES, so ingestion is wired into
the same correctness gate as everything else.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from movie_rankings_spark.sources.html import SourceSpec

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
FIXTURE_HTML_DIR = os.path.join(_REPO_ROOT, "tests", "fixtures", "scraped_html")

URL_IMDB = "fixture://imdb"
URL_RANKER = "fixture://ranker"
URL_EMPIRE = "fixture://empire"

FIXTURE_SOURCES: tuple[SourceSpec, ...] = (
    SourceSpec(URL_IMDB, "imdb"),
    SourceSpec(URL_RANKER, "ranker"),
    SourceSpec(URL_EMPIRE, "empire"),
)


@dataclass(frozen=True)
class FixtureFetcher:
    """Picklable url→file fetcher (executors re-read from disk)."""

    base_dir: str = FIXTURE_HTML_DIR

    def __call__(self, url: str) -> str:
        name = url.split("://", 1)[1]
        with open(os.path.join(self.base_dir, f"{name}.html"), encoding="utf-8") as f:
            return f.read()


@dataclass(frozen=True)
class FailingFetcher:
    """Fetcher that fails for matching URLs — exercises S2 source
    dropout semantics."""

    fail_substring: str
    base_dir: str = FIXTURE_HTML_DIR

    def __call__(self, url: str) -> str:
        if self.fail_substring in url:
            raise ConnectionError(f"synthetic outage for {url}")
        return FixtureFetcher(self.base_dir)(url)


#: What extraction of the three fixture pages MUST produce
#: (url, rank, title) — golden-pinned in tests, oracle VALUES in plans.
EXPECTED_SCRAPED: tuple[tuple[str, str, str], ...] = (
    (URL_IMDB, "1", "The Godfather"),
    (URL_IMDB, "2", "Star Wars: Episode IV - A New Hope"),
    (URL_IMDB, "3", "Se7en"),
    (URL_IMDB, "4", "Raiders of the Lost Ark"),
    (URL_IMDB, "5", "The Dark Knight"),
    (URL_IMDB, "6", "Pulp Fiction"),
    (URL_IMDB, "7", "Casablanca"),
    (URL_IMDB, "8", "Goodfellas"),
    (URL_IMDB, "9", "Schindler's List"),
    (URL_RANKER, "1", "The Godfather"),
    (URL_RANKER, "2", "Star Wars"),
    (URL_RANKER, "3", "Se7en"),
    (URL_RANKER, "4", "Indiana Jones and the Raiders of the Lost Ark"),
    (URL_RANKER, "5", "The Dark Knight"),
    (URL_RANKER, "6", "Pulp Fiction"),
    (URL_RANKER, "7", "Casablanca"),
    (URL_RANKER, "8", "Goodfellas"),
    (URL_RANKER, "9", "Schindler's List"),
    (URL_EMPIRE, "1", "The Godfather"),
    (URL_EMPIRE, "2", "Star  Wars: Episode IV — A New Hope"),
    (URL_EMPIRE, "3", "Seven"),
    (URL_EMPIRE, "4", "Raiders of the Lost Ark"),
    (URL_EMPIRE, "5", "The Dark Knight"),
    (URL_EMPIRE, "6", "12 Angry Men"),
    (URL_EMPIRE, "7", "Casablanca"),
    (URL_EMPIRE, "8", "Goodfellas"),
    (URL_EMPIRE, "9", "Schindler's List"),
)
