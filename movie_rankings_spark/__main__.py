"""CLI entry — the switch path for users of the reference.

``python top_movies.py`` (reference, /root/reference/top_movies.py:147-157)
becomes ``python -m movie_rankings_spark``: scrape the ranked lists,
time the fetch phase, and print the sum-ordered and mean-ordered
top-10 — the same two lists print_lists emits (top_movies.py:139-143),
computed by the distributed pipeline instead of eager pandas.

Offline by default (frozen fixture pages — no network in CI);
``--live`` fetches the real sources with the same dialect extractors.
"""

from __future__ import annotations

import argparse
import time

from pyspark.sql import functions as F

from movie_rankings_spark.operators.flagship import (
    aggregate_rankings,
    filter_in_all_lists,
    normalize_scraped,
)
from movie_rankings_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="movie_rankings_spark")
    ap.add_argument(
        "--live",
        action="store_true",
        help="scrape the real sources (default: offline fixture pages)",
    )
    ap.add_argument("-k", type=int, default=10, help="top-k size (default 10)")
    args = ap.parse_args(argv)

    spark = get_spark("movie-rankings-cli")

    start = time.perf_counter()
    if args.live:
        from movie_rankings_spark.sources.html import (
            DEFAULT_SOURCES,
            http_fetch,
            scraped_from_sources,
        )

        scraped = scraped_from_sources(spark, DEFAULT_SOURCES, http_fetch)
        n_sources = len({s.url for s in DEFAULT_SOURCES})
    else:
        from movie_rankings_spark.sources.html import scraped_from_sources
        from movie_rankings_spark.sources.scrape_fixtures import (
            FIXTURE_SOURCES,
            FixtureFetcher,
        )

        scraped = scraped_from_sources(spark, FIXTURE_SOURCES, FixtureFetcher())
        n_sources = len({s.url for s in FIXTURE_SOURCES})
    scraped = scraped.localCheckpoint()  # materialize: time the fetch phase
    elapsed = time.perf_counter() - start
    print(f"Scrape portion completed in {elapsed:0.5f} seconds.")

    ranked = aggregate_rankings(
        filter_in_all_lists(normalize_scraped(scraped), n_sources)
    )
    print("\nTop by SUM of ranks (lower = better):")
    ranked.orderBy(F.col("rank_sum").asc(), F.col("title_comp").asc()).limit(
        args.k
    ).show(args.k, truncate=False)
    print("Top by MEAN rank (lower = better):")
    ranked.orderBy(F.col("rank_avg").asc(), F.col("title_comp").asc()).limit(
        args.k
    ).show(args.k, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
