"""Sparse lexical similarity: TF-IDF weighted cosine top-k via the
inverted index (SURVEY.md §2c J3 — the sparse complement to the dense
`embeddings` paths in operators/similarity.py; generalizes the
reference's wished-for "better way of matching titles",
`/root/reference/README.md:9`, to whole documents).

The dense tier answers "nearest in embedding space"; this answers
"nearest in vocabulary space" with no model at all — the classic IR
formulation, and the cheap first pass a training-data pipeline runs
before spending GPU time on embeddings.

Scale design — the sparse dot product IS a join:

* cos(a,b) = Σ_t w_at·w_bt / (‖a‖‖b‖): computed by equi-joining the
  (doc, term, weight) inverted index with the query side's postings
  ON TERM — each shared term contributes one joined row, the groupBy
  sums it. No vectors materialize; shuffle volume = postings of the
  query side × avg posting length, linear in the corpus.
* Document-frequency pruning is the standard cap: on a real corpus,
  dropping terms with df > cap from the JOIN (stop-term removal)
  bounds the posting-list blowup; near-identical docs still share
  rare terms, which carry ~all the idf mass anyway. The synthetic
  `documents` table has a ~31-word vocabulary (min df ≈ 5% of docs),
  so the registered query blocks on `lang` instead and keeps every
  term — the degenerate-vocab fallback, noted per query.

Exactness contract: weights are INTEGERS (tf × a quantized idf
floor(N·1000/df) — the floor of one shared double division), dot
products and squared norms are scale-0 decimal sums (single
correctly-rounded cast to double), and the final cosine is
dot/(sqrt(na)·sqrt(nb)) — sqrt is IEEE-correctly-rounded in both
engines, so values hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from movie_rankings_spark.functions.text import words


def doc_term_weights(docs: DataFrame, idf_quant: int = 1000) -> DataFrame:
    """(doc_id, term, weight) inverted index with integer TF-IDF
    weights, plus each document's squared norm broadcast-ready.

    weight = tf · floor(N·idf_quant / df); df counts documents (the
    tf table groups first, so df is COUNT(*) over it). N comes from a
    parquet-metadata count of the base (1-row broadcast), never a
    second data scan.
    """
    tf = (
        docs.select("doc_id", F.explode(words(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idf_q = F.floor(
        (F.col("n_docs") * idf_quant).cast("double") / F.col("df").cast("double")
    )
    return (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "df",
            (F.col("tf") * idf_q).cast("long").alias("weight"),
        )
    )


def doc_norms(weights: DataFrame) -> DataFrame:
    """(doc_id, norm_sq double) — exact scale-0 decimal Σw²."""
    w19 = F.col("weight").cast("decimal(19,0)")
    return weights.groupBy("doc_id").agg(
        F.sum((w19 * F.col("weight")).cast("decimal(38,0)"))
        .cast("double")
        .alias("norm_sq")
    )


def tfidf_topk(
    docs: DataFrame,
    query_pred,
    block_col: str = "lang",
    k: int = 5,
    idf_quant: int = 1000,
) -> DataFrame:
    """Top-k most lexically similar documents per query document,
    cosine over integer TF-IDF weights, candidates restricted to the
    query's ``block_col`` partition.

    ``query_pred`` is a Column predicate over ``docs`` selecting the
    query subset. Ranking: cosine DESC, then neighbor doc_id ASC —
    a total order on exactly-reproducible values.
    """
    weights = doc_term_weights(docs, idf_quant)
    norms = doc_norms(weights)
    blocks = docs.select("doc_id", block_col)
    # persisted: BOTH sides of the term join (query and candidate)
    # read the full weight table — uncached, the tf/df/norm pipeline
    # (several aggregates over the corpus) executes once per side.
    w_full = (
        weights.join(blocks, "doc_id")
        .join(norms, "doc_id")
        .select("doc_id", block_col, "term", "weight", "norm_sq")
        .persist_tracked()
    )
    qw = w_full.filter(query_pred).select(
        F.col("doc_id").alias("q_doc"),
        F.col(block_col).alias("q_block"),
        F.col("term").alias("term"),
        F.col("weight").alias("q_weight"),
        F.col("norm_sq").alias("q_norm_sq"),
    )
    joined = qw.join(
        w_full,
        (qw.term == w_full.term)
        & (qw.q_block == F.col(block_col))
        & (qw.q_doc != w_full.doc_id),
    )
    qw19 = F.col("q_weight").cast("decimal(19,0)")
    dots = joined.groupBy("q_doc", "doc_id").agg(
        F.sum((qw19 * F.col("weight")).cast("decimal(38,0)"))
        .cast("double")
        .alias("dot"),
        F.count(F.lit(1)).alias("n_shared_terms"),
        F.first("q_norm_sq").alias("q_norm_sq"),
        F.first("norm_sq").alias("c_norm_sq"),
    )
    cosine = F.col("dot") / (F.sqrt(F.col("q_norm_sq")) * F.sqrt(F.col("c_norm_sq")))
    ranked = dots.select(
        "q_doc",
        F.col("doc_id").alias("neighbor_doc"),
        "n_shared_terms",
        cosine.alias("cosine"),
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("q_doc").orderBy(
                F.col("cosine").desc(), F.col("neighbor_doc")
            )
        ),
    )
    return ranked.filter(F.col("rank") <= k).select(
        "q_doc", "rank", "neighbor_doc", "n_shared_terms", "cosine"
    )
