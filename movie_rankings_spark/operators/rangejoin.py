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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    start_col: str,
    end_col: str,
    max_len_seconds: int,
    *,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """All (left, right) pairs with equal keys whose [start, end]
    intervals overlap (``l.start <= r.end AND r.start <= l.end``).

    CALLER CONTRACT: no interval is longer than ``max_len_seconds``.
    With bin width = max length, two overlapping intervals' START bins
    differ by at most 1, so exploding the left start-bin into
    {b-1, b, b+1} turns the overlap theta-join into an equi-join on
    (keys, bin) + an exact residual filter — 3×|left| + |right|
    shuffle rows, never the nested loop Spark would otherwise plan.
    The right side keeps its single start bin, so no pair can match
    twice (no dedup pass needed). Output adds ``overlap_us``, the
    overlap duration."""
    keys = list(keys)
    width_us = max_len_seconds * 1_000_000
    s_us = F.unix_micros(F.col(start_col))
    e_us = F.unix_micros(F.col(end_col))

    l2 = left.select(
        *keys,
        F.floor(s_us / width_us).alias("_b0"),
        s_us.alias("_ls"),
        e_us.alias("_le"),
        *[
            F.col(c).alias(f"{left_prefix}{c}")
            for c in left.columns
            if c not in keys
        ],
    ).withColumn(
        "_bin",
        F.explode(
            F.array(F.col("_b0") - 1, F.col("_b0"), F.col("_b0") + 1)
        ),
    )
    r2 = right.select(
        *keys,
        F.floor(s_us / width_us).alias("_bin"),
        s_us.alias("_rs"),
        e_us.alias("_re"),
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c not in keys
        ],
    )
    overlap = F.least(F.col("_le"), F.col("_re")) - F.greatest(
        F.col("_ls"), F.col("_rs")
    )
    return (
        l2.join(r2, [*keys, "_bin"])
        .filter(
            (F.col("_ls") <= F.col("_re")) & (F.col("_rs") <= F.col("_le"))
        )
        .withColumn("overlap_us", overlap)
        .drop("_bin", "_b0", "_ls", "_le", "_rs", "_re")
    )
