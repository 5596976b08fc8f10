"""Range (interval) join — pair rows whose timestamps fall within a
bounded window of each other, without a theta-join.

Spark plans a raw ``l.ts - r.ts BETWEEN 0 AND w`` condition as a
nested-loop join (quadratic per key). The scalable form bins time into
``window``-sized buckets: a right row at time t can only match left
rows in its own or the next bucket, so exploding the LEFT side into
{bin, bin+1} (2 rows) turns the range predicate into an equi-join on
(key, bin) followed by an exact residual filter. Shuffle volume is
2×|left| + |right| — linear — and the residual filter removes the
false candidates the coarse bins admit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lookback_range_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    window_seconds: int,
    *,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """All (left, right) pairs with the same keys and
    ``0 < left.ts - right.ts <= window_seconds`` (right strictly
    before left, within the lookback window).

    Output: keys + every non-key left column prefixed ``left_prefix``
    + every non-key right column prefixed ``right_prefix`` +
    ``delta_us`` (microseconds between the two timestamps)."""
    keys = list(keys)
    micros = F.unix_micros(F.col(ts_col))
    window_us = window_seconds * 1_000_000

    l2 = left.select(
        *keys,
        F.floor(micros / window_us).alias("_bin0"),
        micros.alias("_l_us"),
        *[
            F.col(c).alias(f"{left_prefix}{c}")
            for c in left.columns
            if c not in keys
        ],
    ).withColumn("_bin", F.explode(F.array(F.col("_bin0") - 1, F.col("_bin0"))))
    r2 = right.select(
        *keys,
        F.floor(micros / window_us).alias("_bin"),
        micros.alias("_r_us"),
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c not in keys
        ],
    )
    delta = F.col("_l_us") - F.col("_r_us")
    return (
        l2.join(r2, [*keys, "_bin"])
        .filter((delta > 0) & (delta <= window_us))
        .withColumn("delta_us", delta)
        .drop("_bin", "_bin0", "_l_us", "_r_us")
    )
