"""Full-text ranked retrieval: BM25 scoring over an inverted index.

The search-engine counterpart of the TF-IDF cosine operator
(operators/tfidf.py): Okapi BM25 with the Lucene-style saturation —
per (doc, term):

    idf_q(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

where idf_q is the same integer-quantized document-frequency weight
the TF-IDF operator uses (floor(N * quant / df) — engine-portable, no
ln), dl is the document length in tokens and avgdl the exact corpus
mean (decimal sum / count).

Exactness contract: every per-term score is a chain of IEEE
correctly-rounded ops on identical inputs (integer tf/dl/idf_q,
double avgdl), ROUNDED TO DECIMAL(18,6) before the per-doc sum — so
the total is order-independent and value-hash identical to the SQL
oracle, the same trick as position-based attribution's credit shares.

Scale: the term filter lands directly above the token explode, so
only postings of the |query| terms survive the first aggregate (the
inverted-index slice, not the full index); document lengths come from
a second column-pruned scan (re-scan beats caching a corpus-sized
exploded frame — the scan_audit-documented trade). df and avgdl are
|terms|-row / 1-row broadcasts; the final top-k is
TakeOrderedAndProject.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from movie_rankings_spark.functions.text import words


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    idf_quant: int = 1000,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under BM25.

    Output: (doc_id, n_terms_matched, score), score descending with
    doc_id tie-break."""
    toks = docs.select("doc_id", F.explode(words(F.col("text"))).alias("tok"))
    tf = (
        toks.filter(F.col("tok").isin(list(terms)))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )

    dl = docs.select(
        "doc_id", F.size(words(F.col("text"))).alias("dl")
    )
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.col("dl").cast("decimal(18,0)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )

    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf_q = F.floor(
        (F.col("n_docs") * idf_quant).cast("double") / F.col("df").cast("double")
    ).cast("long")
    weights = df_t.crossJoin(F.broadcast(corpus)).select(
        "tok", idf_q.alias("idf_q"), "avgdl"
    )

    tf_part = (F.col("tf").cast("double") * (k1 + 1)) / (
        F.col("tf").cast("double")
        + k1
        * (
            F.lit(1.0 - b)
            + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
        )
    )
    term_score = (F.col("idf_q").cast("double") * tf_part).cast(
        "decimal(18,6)"
    )
    return (
        tf.join(F.broadcast(weights), "tok")
        .join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
            F.sum(term_score).cast("double").alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
