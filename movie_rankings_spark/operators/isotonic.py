"""Isotonic regression over binned data — monotone calibration fits.

Reference parity: no calibration surface exists in the reference
(top_movies.py); this extends the classifier tier's calibration-bins
readout (A27) with the actual monotone FIT: isotonic regression is the
standard score-calibration step (Zadrozny & Elkan 2002) and the
classic algorithm (PAVA) is sequential — but over BINNED data the fit
has the Robertson–Wright minimax closed form

    ŷ_i = max_{j ≤ i} min_{k ≥ i} A(j, k)

with A(j, k) the weighted mean of bins j..k, which turns the whole
fit into bounded-grid relational algebra: no iteration, no driver
loop, and an exact SQL twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def isotonic_fit_binned(
    df: DataFrame,
    bin_col: Column,
    y_col: Column,
    n_bins: int,
) -> DataFrame:
    """Weighted isotonic (non-decreasing) regression of a 0/1 (or
    integral) response over ``n_bins`` ordered bins: per bin the raw
    mean and the isotonic fit — the monotone calibration curve.

    Shape: ONE fact scan to the per-bin exact (n, Σy) table — at most
    ``n_bins`` rows — then the minimax closed form materializes the
    j ≤ i ≤ k triple grid (≤ n_bins³/6 rows, a BOUNDED broadcast
    self-join, the A83/A84 domain-grid budget) from prefix sums and
    reduces it with two nested min/max aggregations. Empty bins are
    skipped (they constrain nothing and have no fitted value).

    Exactness: prefix sums are exact longs; every segment mean
    A(j,k) is ONE correctly-rounded division of exact longs, and
    min/max over identical doubles is order-free ⇒ the whole fitted
    curve value-hashes against the closed-form SQL twin.

    Output: one row per non-empty bin — bin, n_rows, sum_y,
    mean_y, isotonic_y — ordered by bin; isotonic_y is
    non-decreasing in bin.
    """
    cells = (
        df.select(
            bin_col.cast("int").alias("b"), y_col.cast("long").alias("y")
        )
        .filter(
            F.col("b").isNotNull()
            & F.col("y").isNotNull()
            & (F.col("b") >= 0)
            & (F.col("b") < n_bins)
        )
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("s"),
        )
        .persist_tracked()  # prefix join sides, bins, and the final
        # readout all branch off this ≤ n_bins-row table
    )
    # prefix sums over the ≤ n_bins cells: per-bin window is bounded
    # by the BIN DOMAIN, but a global ORDER BY window would still plan
    # a SinglePartition exchange — a broadcast theta self-join keeps
    # the audit clean at identical (tiny) cost
    pre = (
        cells.alias("l")
        .join(
            F.broadcast(cells.alias("r")),
            F.col("r.b") <= F.col("l.b"),
        )
        .groupBy(F.col("l.b").alias("b"))
        .agg(
            F.sum("r.n").cast("long").alias("cn"),
            F.sum("r.s").cast("long").alias("cs"),
        )
    )
    zero = F.lit(0).cast("long")
    # A(j,k) for every j ≤ k from prefix differences (the j = first
    # bin case reads a synthetic (-1, 0, 0) prefix row); then the
    # minimax: for each target bin i, min over k ≥ i per start j,
    # max over starts j ≤ i
    segs = (
        pre.select(F.col("b").alias("k"), F.col("cn").alias("nk"), F.col("cs").alias("sk"))
        .join(
            F.broadcast(
                pre.select(
                    F.col("b").alias("jm1"),
                    F.col("cn").alias("nj"),
                    F.col("cs").alias("sj"),
                ).unionByName(
                    df.sparkSession.range(1).select(
                        F.lit(-1).cast("int").alias("jm1"),
                        zero.alias("nj"),
                        zero.alias("sj"),
                    )
                )
            ),
            F.col("jm1") < F.col("k"),
        )
        .select(
            (F.col("jm1") + 1).alias("j"),
            "k",
            (
                (F.col("sk") - F.col("sj")).cast("double")
                / (F.col("nk") - F.col("nj")).cast("double")
            ).alias("avg_jk"),
        )
    )
    bins = cells.select(F.col("b").alias("i"))
    inner = (
        bins.join(
            F.broadcast(segs),
            (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")),
        )
        .groupBy("i", "j")
        .agg(F.min("avg_jk").alias("mn"))
    )
    fit = inner.groupBy("i").agg(F.max("mn").alias("isotonic_y"))
    return (
        cells.join(F.broadcast(fit), cells["b"] == fit["i"])
        .select(
            F.col("b").alias("bin"),
            F.col("n").alias("n_rows"),
            F.col("s").alias("sum_y"),
            (F.col("s").cast("double") / F.col("n").cast("double")).alias(
                "mean_y"
            ),
            "isotonic_y",
        )
        .orderBy("bin")
    )
