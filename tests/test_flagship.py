"""Golden-output tests for the flagship pipeline (SURVEY.md §5.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from movie_rankings_spark.operators.flagship import (
    aggregate_rankings,
    filter_in_all_lists,
    flagship,
    normalize_scraped,
)
from movie_rankings_spark.sources.fixtures import (
    N_SOURCES,
    scraped_fixture_df,
)


def _rows(df):
    return {r["title_comp"]: r for r in df.collect()}


def test_normalization_golden(spark):
    out = normalize_scraped(scraped_fixture_df(spark))
    got = {(r["url"], r["title"]): (r["rank"], r["title_comp"]) for r in out.collect()}
    # alias fires pre-normalization
    assert got[("src_empire", "Seven")] == (7, "se7en")
    # punctuation + whitespace + case
    assert got[("src_empire", "Star  Wars: Episode IV — A New Hope")][1] == (
        "star wars episode iv a new hope"
    )
    assert got[("src_ranker", "Star Wars")][1] == "star wars episode iv a new hope"
    # year suffix NOT stripped by analytics layer
    assert got[("src_ranker", "Pulp Fiction (1994)")][1] == "pulp fiction 1994"
    # unparseable rank -> 0
    assert got[("src_imdb", "Casablanca")][0] == 0


def test_in_all_lists_row_count_semantics(spark):
    norm = normalize_scraped(scraped_fixture_df(spark))
    surviving = filter_in_all_lists(norm, N_SOURCES)
    titles = {r["title_comp"] for r in surviving.collect()}
    assert "the godfather" in titles
    assert "avengers endgame" not in titles  # only 2 sources
    assert "pulp fiction" not in titles  # 2 + year-variant rows diverge
    # duplicate-within-one-source: 3 rows from 2 sources still passes
    assert "heat" in titles


def test_distinct_sources_variant_drops_heat(spark):
    norm = normalize_scraped(scraped_fixture_df(spark))
    surviving = filter_in_all_lists(norm, N_SOURCES, distinct_sources=True)
    titles = {r["title_comp"] for r in surviving.collect()}
    assert "heat" not in titles
    assert "the godfather" in titles


def test_flagship_golden(spark):
    out = flagship(scraped_fixture_df(spark), n_sources=N_SOURCES, k=10)
    rows = out.collect()
    assert len(rows) == 10  # >10 survivors, limit truncates
    by_title = _rows(out)
    # godfather: 1+3+2
    assert by_title["the godfather"]["rank_sum"] == 6
    assert abs(by_title["the godfather"]["rank_avg"] - 2.0) < 1e-12
    # casablanca: 0+8+6 (coercion pulls it up the list)
    assert by_title["casablanca"]["rank_sum"] == 14
    # tie pins deterministic ordering: alien(36) before jaws(36)
    sums = [(r["rank_sum"], r["title_comp"]) for r in rows]
    assert sums == sorted(sums)


def test_flagship_idempotent_normalization(spark):
    # norm(norm(x)) == norm(x) (SURVEY.md §5.4)
    from movie_rankings_spark.functions.normalize import normalize_title

    df = scraped_fixture_df(spark).select(
        normalize_title(F.col("title")).alias("once")
    )
    df2 = df.select(F.col("once"), normalize_title(F.col("once")).alias("twice"))
    assert df2.filter(F.col("once") != F.col("twice")).count() == 0
