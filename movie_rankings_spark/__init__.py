"""movie_rankings_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the query and data-processing
capabilities of ``ewmiears/Movie-rankings`` (reference at
``/root/reference``), extended with the LLM-data-pipeline operator tier
(dedup, similarity search, multimodal columns, text analysis) designed
for 100 TB scale.

Layout:
    session    — SparkSession factory (AQE on, explicit shuffle sizing)
    catalog    — parquet table loading / temp-view registration
    functions/ — scalar expression library (normalization, text, vectors)
    sources/   — ingestion: scrape-source registry, HTML dialect
                 extractors (Arrow-batched), fixtures
    operators/ — relational + LLM-pipeline operators as DataFrame
                 compositions (flagship, relational, dedup, similarity,
                 text analysis, top-k)
    streaming/ — Structured Streaming tier over the events table
"""

__version__ = "0.1.0"

from movie_rankings_spark.caching import (  # noqa: E402,F401 — public hook
    release_persisted,
    tracked_count,
)
