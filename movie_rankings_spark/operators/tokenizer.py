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


def _symbol_pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent (left, right) symbol-pair totals over the weighted
    vocabulary — the per-round statistic. Explode runs over distinct
    words only; the groupBy reduces map-side to pair-vocab size."""
    pairs = vocab.filter(F.size("symbols") >= 2).select(
        F.explode(
            F.zip_with(
                F.slice(F.col("symbols"), 1, F.size("symbols") - 1),
                F.slice(F.col("symbols"), 2, F.size("symbols") - 1),
                lambda a, b: F.struct(a.alias("left"), b.alias("right")),
            )
        ).alias("p"),
        "wc",
    )
    return pairs.groupBy("p.left", "p.right").agg(F.sum("wc").alias("n"))


def bpe_train(docs: DataFrame, n_merges: int = 12) -> DataFrame:
    """Full BPE merge-rule training (Sennrich et al. 2016),
    distributed: per round, one pair-count aggregation over the
    weighted DISTINCT-WORD vocabulary picks the most frequent adjacent
    symbol pair (ties broken lexicographically — deterministic), and a
    left-to-right greedy fold rewrites every word's symbol array.

    Output: one row per learned rule — step (1-based), left, right,
    merged, n (the pair's corpus frequency when chosen). Stops early
    when no adjacent pair remains.

    Scale: the corpus is touched ONCE (word-frequency groupBy with
    map-side combine); every round after that runs on the vocab table
    (≈ millions of rows at 100 TB, constant in corpus size). Per round:
    one pair aggregate + a 1-row driver fetch (the argmax — the
    textbook justified collect) + a codegen fold rewrite. Lineage is
    truncated per round with localCheckpoint, the connected-components
    idiom, so the plan does not grow with the merge count."""
    freq = (
        docs.select(F.explode(words(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    vocab = freq.select(
        F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"
               ).alias("symbols"),
        "wc",
    ).localCheckpoint(eager=True)

    rules: list[tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        top = (
            _symbol_pair_counts(vocab)
            .orderBy(F.desc("n"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, n = top[0]["left"], top[0]["right"], top[0]["n"]
        merged = left + right
        rules.append((step, left, right, merged, n))
        # greedy left-to-right merge: the merged symbol becomes the new
        # "previous", so overlapping occurrences ("aaa" under a+a)
        # resolve exactly like the single-node trainer.
        fold = F.aggregate(
            F.col("symbols"),
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(left))
                & (x == F.lit(right)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        vocab = vocab.select(fold.alias("symbols"), "wc").localCheckpoint(
            eager=True
        )

    spark = docs.sparkSession
    return spark.createDataFrame(
        rules, "step int, left string, right string, merged string, n long"
    )


def bpe_apply_rules(vocab: DataFrame, rules: list[tuple[str, str, str]]) -> DataFrame:
    """Apply an ordered list of (left, right, merged) BPE rules to the
    `symbols` arrays of a weighted vocabulary — the ENCODE half of the
    tokenizer. Each rule is the same greedy left-to-right codegen fold
    used during training, chained in rule order; lineage is truncated
    every few rules so the plan stays flat for long rule lists."""
    def _merge_step(left: str, right: str, merged: str):
        def step(acc, x):
            return F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(left))
                & (x == F.lit(right)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
                ),
            ).otherwise(F.concat(acc, F.array(x)))

        return step

    for i, (left, right, merged) in enumerate(rules):
        fold = F.aggregate(
            F.col("symbols"),
            F.array().cast("array<string>"),
            _merge_step(left, right, merged),
        )
        vocab = vocab.select(fold.alias("symbols"), "word", "wc")
        if (i + 1) % 4 == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return vocab


def bpe_encode_token_counts(docs: DataFrame, n_merges: int = 8) -> DataFrame:
    """Train-then-encode: learn `n_merges` BPE rules on the corpus,
    then tokenize every document with them. Output: doc_id, n_words,
    n_bpe_tokens (symbols after merges; pre-merge it equals character
    count of the concatenated words).

    Scale shape: training and encoding both run on the DISTINCT-WORD
    vocabulary (corpus tokens reduce map-side into vocab rows); the
    per-word token count then re-joins the document token stream via a
    BROADCAST of the vocab map — the fact table is scanned twice
    (vocab build + final join) and never carries symbol arrays.
    The rule list itself is n_merges rows — the textbook justified
    driver collect (same as bpe_train's per-round argmax)."""
    trained = bpe_train(docs, n_merges=n_merges)
    rules = [
        (r["left"], r["right"], r["merged"])
        for r in trained.orderBy("step").collect()
    ]
    freq = (
        docs.select(F.explode(words(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    vocab = freq.select(
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("symbols"),
        "word",
        "wc",
    )
    encoded = bpe_apply_rules(vocab, rules).select(
        "word", F.size("symbols").alias("n_tok")
    )
    toks = docs.select("doc_id", F.explode(words(F.col("text"))).alias("word"))
    return (
        toks.join(F.broadcast(encoded), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_tok").cast("long").alias("n_bpe_tokens"),
        )
    )
