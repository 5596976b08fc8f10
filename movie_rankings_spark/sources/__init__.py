"""Ingestion layer: scrape-source registry, HTML dialect extractors,
and offline fixtures. The only Python-resident compute in the engine
lives here (HTML has no JVM parser); it is isolated behind the
``scraped(url string, rank string, title string)`` schema contract.
"""
