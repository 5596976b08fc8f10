"""In-engine model training: full-batch logistic regression by
gradient descent, one aggregation per iteration.

This is the classic "train on the cluster, no external ML stack"
loop: the training set never leaves the executors — each GD step is a
single d+1-column aggregate (gradient sums + loss), the driver holds
only the O(d) weight vector and re-emits it as literals in the next
step's expressions. The feature DataFrame is persisted once; every
iteration's plan is one partial-aggregated scan of the cache, so cost
is iters × one reduce, and lineage never grows.

At 100 TB this shape is exactly how distributed LR is trained (and is
MLlib's own layout for small d): gradients are associative sums with
map-side combine; the only driver state is the model. Double-precision
sums are order-dependent across runs at the 1e-12 level, so the query
is registered rows-only and the equality test against a single-node
numpy reference uses tolerances.

Reference scope: north-star [EXT] tier — the reference has no
training surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def logreg_train(
    features: DataFrame,
    label_col: str,
    feature_cols: list[str],
    lr: float = 0.5,
    iters: int = 15,
) -> tuple[list[float], list[dict]]:
    """Train w (bias first) on `features`; returns (weights, history)
    where history has one dict per iteration: iter, loss, weights."""
    cols = [F.lit(1.0)] + [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    cached = features.select(
        y.alias("_y"), *[c.alias(f"_x{j}") for j, c in enumerate(cols)]
    ).persist_tracked()
    n = cached.count()  # materializes the cache; n is reused every step

    w = [0.0] * len(cols)
    history: list[dict] = []
    for it in range(1, iters + 1):
        z = sum(
            (F.col(f"_x{j}") * F.lit(wj) for j, wj in enumerate(w)),
            start=F.lit(0.0),
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = p - F.col("_y")
        agg = cached.agg(
            *[F.sum(err * F.col(f"_x{j}")).alias(f"g{j}") for j in range(len(w))],
            F.sum(
                -F.col("_y") * F.log(p)
                - (F.lit(1.0) - F.col("_y")) * F.log(F.lit(1.0) - p)
            ).alias("loss"),
        ).collect()[0]
        w = [wj - lr * agg[f"g{j}"] / n for j, wj in enumerate(w)]
        history.append({"iter": it, "loss": agg["loss"] / n, "weights": list(w)})
    cached.unpersist()
    if any(math.isnan(x) for x in w):
        raise RuntimeError("logreg_train diverged (NaN weights); lower lr")
    return w, history


def logreg_train_history_df(
    features: DataFrame,
    label_col: str,
    feature_cols: list[str],
    lr: float = 0.5,
    iters: int = 15,
) -> DataFrame:
    """Training history as a DataFrame: iter, loss, w0..wd."""
    _, history = logreg_train(features, label_col, feature_cols, lr, iters)
    spark = features.sparkSession
    rows = [
        tuple([h["iter"], h["loss"], *h["weights"]]) for h in history
    ]
    d = len(feature_cols) + 1
    schema = "iter int, loss double, " + ", ".join(
        f"w{j} double" for j in range(d)
    )
    return spark.createDataFrame(rows, schema)
