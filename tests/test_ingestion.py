"""Ingestion layer tests (SURVEY.md §2a, M2): dialect extraction
golden-pinned against the frozen row list, distributed scrape stage,
and S2 fault-tolerance semantics."""

from __future__ import annotations

from movie_rankings_spark.operators.flagship import flagship
from movie_rankings_spark.sources import html as html_src
from movie_rankings_spark.sources.scrape_fixtures import (
    EXPECTED_SCRAPED,
    FIXTURE_SOURCES,
    URL_EMPIRE,
    URL_RANKER,
    FailingFetcher,
    FixtureFetcher,
)


def _expected_for(url: str) -> list[tuple[str, str]]:
    return [(r, t) for u, r, t in EXPECTED_SCRAPED if u == url]


def test_dialect_extractors_golden():
    fetch = FixtureFetcher()
    for spec in FIXTURE_SOURCES:
        got = html_src.DIALECTS[spec.dialect](fetch(spec.url))
        assert got == _expected_for(spec.url), spec.dialect


def test_empire_year_strip_and_split():
    rows = html_src.extract_empire("<h2>12. Some: Movie. Yes (1999)</h2>")
    # split on FIRST '.' only; year stripped by regex not slice
    assert rows == [("12", "Some: Movie. Yes")]


def test_ranker_drops_two_leading_names():
    page = (
        '<meta itemprop="name" content="chrome1">'
        '<meta itemprop="name" content="chrome2">'
        '<meta itemprop="position" content="1">'
        '<meta itemprop="name" content="Real Movie (2000)">'
    )
    assert html_src.extract_ranker(page) == [("1", "Real Movie")]


def test_imdb_rank_without_trailing_dot():
    page = '<td class="titleColumn">7<a href="#">Movie</a></td>'
    assert html_src.extract_imdb(page) == [("7", "Movie")]


def test_distributed_scrape_offline(spark):
    df = html_src.scraped_from_sources(spark, FIXTURE_SOURCES, FixtureFetcher())
    got = {(r["url"], r["rank"], r["title"]) for r in df.collect()}
    assert got == set(EXPECTED_SCRAPED)


def test_source_dropout_yields_partial_table(spark):
    """A dead source contributes zero rows; the job still succeeds
    (top_movies.py:50-67 semantics)."""
    fetch = FailingFetcher(fail_substring="ranker")
    df = html_src.scraped_from_sources(spark, FIXTURE_SOURCES, fetch)
    urls = {r["url"] for r in df.collect()}
    assert URL_RANKER not in urls
    assert URL_EMPIRE in urls


def test_flagship_over_scraped_fixture(spark):
    scraped = html_src.scraped_from_sources(spark, FIXTURE_SOURCES, FixtureFetcher())
    out = flagship(scraped, n_sources=3, k=10)
    titles = {r["title_comp"] for r in out.collect()}
    assert "the godfather" in titles
    assert "se7en" in titles  # Seven/Se7en reconciled via alias
    assert "star wars episode iv a new hope" in titles
    assert "raiders of the lost ark" in titles  # Indiana Jones alias
    assert "pulp fiction" not in titles  # only 2 sources
    assert "12 angry men" not in titles  # only 1 source
