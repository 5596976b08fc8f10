"""Tokenizer-training support: BPE pair statistics.

The inner loop of byte-pair-encoding training (Sennrich et al. 2016)
is "count adjacent symbol pairs across the corpus, weighted by word
frequency; merge the most frequent". The counting step is the
distributed part — and its scale shape matters: pairs are generated
from the DISTINCT-WORD table (vocabulary-sized, with a frequency
weight), never from the raw token stream. The word-frequency groupBy
is a massive map-side combine (corpus tokens → vocab rows), after
which the explode touches each unique word once regardless of how
often it occurs — exactly how single-node BPE trainers pre-aggregate,
re-expressed as two hash aggregates.

Everything is JVM codegen (split / sequence / transform / substring);
no UDF, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from movie_rankings_spark.functions.text import words


def bpe_pair_counts(docs: DataFrame, k: int = 30) -> DataFrame:
    """Top-k adjacent character pairs across the corpus, weighted by
    word frequency — the statistic that picks BPE merge #1 (on the
    initial character vocabulary; subsequent merges re-run the same
    count over the merged symbol sequences).

    Shuffles: tokens → word frequencies (combine reduces to vocab
    size), pair partials → totals (combine reduces to pair-vocab
    size). The explode runs over distinct words only."""
    freq = (
        docs.select(F.explode(words(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    pairs = freq.filter(F.length("word") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
        "wc",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(k)
    )
