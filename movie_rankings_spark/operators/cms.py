"""Count-min sketch word-frequency estimation, oracle-exact.

The mergeable frequency sketch that pairs with the HLL cardinality
rollup: a d×w counter grid answers "how often does token X occur"
within ε·N overestimate using O(d·w) space, regardless of corpus or
vocabulary size — the structure behind streaming heavy-hitter and
frequency services at 100 TB where the exact vocabulary table is
itself huge.

Build: one explode of the token stream over the d hash rows →
groupBy (row, bucket) count with map-side combine — shuffle is
O(d·w), never vocabulary-sized. Partial sketches from different
partitions/days merge by cell-wise addition (same groupBy), which is
what makes it a sketch and not a sample.

Probe: est(x) = min over rows of cell(row, bucket_row(x)) — an
equi-join of the probe set against the sketch, then a MIN aggregate.
Estimates are DETERMINISTIC given the hash family; hashing is the
md5-slice portable hash (the simhash/classifier convention), so DuckDB
reproduces every cell and every estimate bit-for-bit — the registered
query is value-hash checked, unusual for a sketch.

Reference scope: north-star [EXT] sketch tier (reference has none).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from movie_rankings_spark.functions.text import words


def _bucket(col, seed: int, width: int):
    """Portable row hash: first 8 hex digits of md5(key ':' seed)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(col, F.lit(f":{seed}"))), 1, 8), 16, 10
        ).cast("long")
        % width
    )


def cms_build(tokens: DataFrame, col: str, depth: int, width: int) -> DataFrame:
    """The sketch as a (row, bucket, n) table — d·w cells max."""
    counted = tokens.groupBy(col).agg(F.count(F.lit(1)).alias("n"))
    return cms_build_from_counts(counted, col, "n", depth, width)


def cms_build_from_counts(
    counts: DataFrame, col: str, n_col: str, depth: int, width: int
) -> DataFrame:
    """Sketch from a pre-aggregated (key, count) table: the d-way
    explode and d×w cell reduction run over VOCAB rows, not the raw
    stream — the shape that matters when the same counts table feeds
    other consumers (one corpus scan total)."""
    cells = counts.select(
        F.col(n_col).alias("_n"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _bucket(F.col(col), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    )
    return cells.groupBy("c.row", "c.bucket").agg(F.sum("_n").alias("n"))


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, col: str, depth: int, width: int
) -> DataFrame:
    """min-over-rows estimate for each probe key. The probe side
    explodes to d rows/key and equi-joins the sketch on (row,
    bucket); the sketch side is at most d·w rows — broadcastable."""
    pb = probes.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _bucket(F.col(col), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    ).select(col, "c.row", "c.bucket")
    return (
        pb.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(col)
        .agg(F.min("n").alias("cms_est"))
    )


def cms_word_frequency_report(
    docs: DataFrame, depth: int = 4, width: int = 512, min_count: int = 200
) -> DataFrame:
    """Build a CMS over the corpus token stream, probe it with every
    word whose TRUE count ≥ min_count, and report word, true_n,
    cms_est, overestimate (est − true ≥ 0 always; ≤ 2N/w with
    probability 1 − 2^−d per the CMS bound)."""
    # ONE corpus scan: the word-count table (vocab-sized, persisted)
    # feeds the sketch build, the truth side, and the probe — without
    # the cache each branch would rescan the token stream.
    toks = docs.select(F.explode(words(F.col("text"))).alias("word"))
    counted = toks.groupBy("word").agg(F.count(F.lit(1)).alias("true_n")).persist_tracked()
    sketch = cms_build_from_counts(counted, "word", "true_n", depth, width)
    truth = counted.filter(F.col("true_n") >= min_count)
    est = cms_estimate(sketch, truth.select("word"), "word", depth, width)
    return truth.join(est, "word").select(
        "word",
        "true_n",
        "cms_est",
        (F.col("cms_est") - F.col("true_n")).alias("overestimate"),
    )
