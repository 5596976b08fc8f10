"""Python UDTF front-end for ranked-list extraction (SURVEY §2j F2).

The reference's per-source ``parse()`` branches are "effectively
source-specific UDTFs (HTML → rows)" — Spark 4's Python UDTF API lets
us say that literally:

    SELECT s.url, p.rank, p.title
    FROM sources s, LATERAL parse_ranked_list(s.url, s.dialect, 'fixture') p

Third ingestion front-end over the same extractors (after mapInPandas
and the DataSource V2 format), all three sharing DIALECTS and the
zero-rows-on-failure dropout contract — and all three checked against
the same frozen-extraction oracle, so they are provably
interchangeable.

A UDTF is row-at-a-time Python (one eval() per source row) — the
right tool ONLY because each input row explodes into ~hundreds of
output rows and the per-row work (an HTTP fetch + HTML parse) dwarfs
interpreter overhead; for per-row scalar work the Arrow-batched paths
stay mandatory (see tests/test_plan_shapes.py's allowlist).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="rank string, title string")
class ParseRankedList:
    """(url, dialect, fetcher) → extracted (rank, title) rows; a
    failing source yields nothing rather than failing the job."""

    def eval(self, url: str, dialect: str, fetcher: str):
        from movie_rankings_spark.sources.html import DIALECTS, http_fetch

        if fetcher == "fixture":
            from movie_rankings_spark.sources.scrape_fixtures import FixtureFetcher

            fetch = FixtureFetcher()
        else:
            fetch = http_fetch
        try:
            html = fetch(url)
            yield from DIALECTS[dialect](html)
        except Exception:  # noqa: BLE001 — S2: source dropout ≠ job failure
            return


def register(spark) -> None:
    """Idempotent session registration as `parse_ranked_list`."""
    try:
        spark.udtf.register("parse_ranked_list", ParseRankedList)
    except Exception:
        pass
