"""Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
score every source-domain document by how target-like its token
distribution is.

The pretraining-curation step between heuristic gates and model-based
classifiers: given a small TARGET corpus (the domain you want more
of) and the big SOURCE pool, weight each source document by

    log w(d) = sum_w tf(d, w) * [ln p_target(w) - ln p_source(w)]

with add-one-smoothed unigram estimates over the joint vocabulary,
then keep the top-weighted documents (or sample proportionally).

Exactness contract (the drift-monitor convention): each ln is rounded
to DECIMAL(18,9) — the two engines' ln agree far below 1e-9 — the
per-word ratio is an exact decimal difference, and per-document
contributions accumulate in DECIMAL(28,9), so the score is
order-independent and value-hash identical to the SQL oracle.

Scale shape: the corpus is exploded ONCE into the (doc, word, tf)
table (persisted — it feeds both the vocabulary aggregate and the
scoring join; re-deriving would double the scan, the jaccard-operator
pattern); vocabulary counts reduce map-side to vocab size; the λ
table joins back onto the tf table on the word key (broadcastable for
bounded vocabularies, shuffle join above that — AQE decides); the
final per-doc sum has map-side combine. Top-k is TakeOrdered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from movie_rankings_spark.functions.text import words


def dsir_importance_topk(
    docs: DataFrame, target_filter, k: int = 20
) -> DataFrame:
    """Top-k SOURCE documents by DSIR importance weight against the
    TARGET slice selected by `target_filter` (a boolean Column).

    Output: (doc_id, source, n_tokens, log_weight), weight descending
    with doc_id tie-break."""
    base = docs.select(
        "doc_id", "source", target_filter.alias("_tgt"),
        F.explode(words(F.col("text"))).alias("word"),
    )
    tf = (
        base.groupBy("doc_id", "source", "_tgt", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist_tracked()
    )
    vocab = tf.groupBy("word").agg(
        F.sum(F.when(F.col("_tgt"), F.col("tf")).otherwise(0)).alias("ct"),
        F.sum(F.when(F.col("_tgt"), 0).otherwise(F.col("tf"))).alias("cs"),
    )
    totals = vocab.agg(
        F.sum("ct").alias("tt"),
        F.sum("cs").alias("ts"),
        F.count(F.lit(1)).alias("v"),
    )
    lam = vocab.crossJoin(F.broadcast(totals)).select(
        "word",
        (
            F.log(
                (F.col("ct") + 1).cast("double")
                / (F.col("tt") + F.col("v")).cast("double")
            ).cast("decimal(18,9)")
            - F.log(
                (F.col("cs") + 1).cast("double")
                / (F.col("ts") + F.col("v")).cast("double")
            ).cast("decimal(18,9)")
        ).alias("lam"),
    )
    scored = (
        tf.filter(~F.col("_tgt"))
        .join(lam, "word")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            # tf narrows to DECIMAL(10,0) first: long (=decimal(20,0))
            # times decimal(19,9) exceeds precision 38 and Spark
            # silently REDUCES THE SCALE of the product (seen as 1e-7
            # truncation vs the oracle); 10+19+1 = 30 keeps scale 9.
            F.sum(
                (F.col("tf").cast("decimal(10,0)") * F.col("lam")).cast(
                    "decimal(28,9)"
                )
            )
            .cast("double")
            .alias("log_weight"),
        )
    )
    return scored.orderBy(F.desc("log_weight"), F.asc("doc_id")).limit(k)
