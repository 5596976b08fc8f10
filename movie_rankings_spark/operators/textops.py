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


def hash_sample(docs: DataFrame, bucket: str = "0") -> DataFrame:
    """Deterministic 1/16 corpus sample: keep rows whose md5(doc_id)
    ends in ``bucket``. The scale-correct sampling method — stable
    under retries/re-partitioning (unlike RNG-based sample()), cheap
    (no shuffle), and composable into train/test splits by assigning
    disjoint hex buckets. md5 is engine-portable, so the sample is
    reproducible outside Spark too."""
    h = F.md5(F.col("doc_id").cast("string"))
    return docs.filter(F.substring(h, 32, 1) == bucket)


def vocab_top_words(docs: DataFrame, k: int = 50) -> DataFrame:
    """Corpus vocabulary: top-k words by total occurrences (ties by
    word). explode + count is the canonical shape; at 100 TB the
    partial aggregation means the shuffle carries one row per distinct
    word per partition, not per token."""
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("word").asc())
        .limit(k)
    )


def doc_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-k characteristic terms by tf·ridf where
    ridf = (N+1)/(df+1) — the LINEAR idf variant: same ordering
    behavior as log-idf for ranking within a document, but exact
    double arithmetic both engines reproduce bit-for-bit (libm log is
    not guaranteed identically rounded across engines, so the
    conventional ln() form cannot be value-hash checked).

    Two aggregations + one broadcast-joinable df table + one window:
    tf shuffles on (doc, word), df on word, the final top-k on doc."""
    tokens = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    )
    tf = tokens.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.count()
    df_t = tokens.select("doc_id", "word").distinct().groupBy("word").agg(
        F.count(F.lit(1)).alias("df")
    )
    scored = tf.join(df_t, "word").select(
        "doc_id",
        "word",
        (
            F.col("tf").cast("double")
            * (F.lit(float(n_docs + 1)) / (F.col("df") + 1).cast("double"))
        ).alias("tfidf"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("word").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "word", "tfidf", "rk")
    )
