"""Categorical feature encoding for ML pipelines.

Reference parity: no feature-engineering surface exists in the
reference (top_movies.py); this supplies the leakage-safe categorical
encoding step a training-data pipeline runs between the raw tables
and a model — the companion to the classifier/DSIR tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def target_encode_loo(
    df: DataFrame,
    key_col: Column,
    category_col: Column,
    target_cents: Column,
    smoothing: float = 10.0,
) -> DataFrame:
    """Leave-one-out target encoding of a categorical column against
    an integral (cents-quantized) target: each row's encoding is the
    mean target of ITS OWN category computed WITHOUT the row itself —

        loo_i      = (Σ_cat y − y_i) / (n_cat − 1)
        smoothed_i = (Σ_cat y − y_i + m·ȳ_global) / (n_cat − 1 + m)

    — the standard leakage guard: encoding a row with a statistic
    that includes its own label lets a model memorize the label
    through the feature (and the smoothing term shrinks rare
    categories toward the global mean, m = ``smoothing``).
    Singleton categories yield NULL for the raw LOO (0/0) and the
    pure global-mean shrinkage for the smoothed form.

    Shape: the fact aggregates ONCE into per-category exact DECIMAL
    (n, Σ) — |categories| rows, broadcast — then joins back to the
    fact row-wise; the global mean folds from the per-category table
    (no extra fact scan). TWO fact scans by design: at 100 TB the
    aggregate + broadcast-join-back plan beats persisting a
    fact-sized projection, and both scans are column-pruned to the
    three encoding columns.

    Exactness: per-category sums are exact DECIMALs; Σ−yᵢ is an
    exact DECIMAL difference cast to double once, and each encoding
    is a closed IEEE form of those exact values, written identically
    in the oracle — every encoded row hashes bit-for-bit.

    Output: one row per input row — key, category, target_cents,
    n_category, loo_mean_cents, loo_smoothed_cents — ordered by key.
    """
    d38 = "decimal(38,0)"
    base = df.select(
        key_col.alias("key"),
        category_col.alias("cat"),
        target_cents.cast("long").alias("y"),
    ).filter(F.col("cat").isNotNull() & F.col("y").isNotNull())
    percat = (
        base.groupBy("cat")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cat"),
            F.sum(F.col("y").cast("decimal(19,0)")).cast(d38).alias("s_cat"),
        )
        .persist_tracked()
    )
    glob = percat.agg(
        F.sum("n_cat").cast("long").alias("n_all"),
        F.sum("s_cat").cast(d38).alias("s_all"),
    )
    m = F.lit(float(smoothing))
    gmean = F.col("s_all").cast("double") / F.col("n_all").cast("double")
    minus_self = (
        F.col("s_cat") - F.col("y").cast("decimal(19,0)")
    ).cast("double")
    n1 = (F.col("n_cat") - 1).cast("double")
    return (
        base.join(F.broadcast(percat), "cat")
        .crossJoin(F.broadcast(glob))
        .select(
            F.col("key"),
            F.col("cat").alias("category"),
            F.col("y").alias("target_cents"),
            "n_cat",
            F.try_divide(minus_self, n1).alias("loo_mean_cents"),
            ((minus_self + m * gmean) / (n1 + m)).alias(
                "loo_smoothed_cents"
            ),
        )
        .withColumnRenamed("n_cat", "n_category")
        .orderBy("key")
    )
