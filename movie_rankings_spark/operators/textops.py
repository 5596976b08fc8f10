"""Text-analysis operators over the documents table (north_star tier).

Thin DataFrame wrappers over functions/text.py — each is a single
codegen'd projection (plus at most one aggregation), so throughput is
scan-bound at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from movie_rankings_spark.functions.text import (
    LANG_ORDER,
    bpe_token_count,
    content_fingerprint,
    lang_predict,
    lang_scores,
    punct_ratio,
    quality_score,
    stopword_hits,
    words,
)


def doc_stats(docs: DataFrame) -> DataFrame:
    """Per-document token statistics."""
    text = F.col("text")
    return docs.select(
        "doc_id",
        F.size(words(text)).alias("n_words"),
        F.length(text).alias("n_chars_computed"),
        bpe_token_count(text).alias("n_bpe_tokens"),
        F.size(F.array_distinct(words(text))).alias("n_distinct_words"),
    )


def doc_quality(docs: DataFrame) -> DataFrame:
    """Quality signals + composite score per document."""
    text = F.col("text")
    return docs.select(
        "doc_id",
        F.size(words(text)).alias("n_words"),
        punct_ratio(text).alias("punct_ratio"),
        (stopword_hits(text, "en").cast("double") / F.size(words(text))).alias(
            "stopword_ratio"
        ),
        quality_score(text).alias("quality"),
    )


def doc_langid(docs: DataFrame) -> DataFrame:
    """Predicted language + per-language scores."""
    text = F.col("text")
    scores = lang_scores(text)
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        lang_predict(text).alias("lang_pred"),
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_ORDER],
    )


def doc_fingerprints(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", content_fingerprint(F.col("text")).alias("fingerprint")
    )


def corpus_summary(docs: DataFrame) -> DataFrame:
    """Corpus-level rollup by (lang, source): the monitoring query a
    training-data pipeline runs per ingest batch."""
    text = F.col("text")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(words(text))).alias("total_words"),
            F.min(F.length(text)).alias("min_chars"),
            F.max(F.length(text)).alias("max_chars"),
        )
        .orderBy("lang", "source")
    )
