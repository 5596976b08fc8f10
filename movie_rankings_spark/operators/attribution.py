"""Marketing-style conversion attribution over an event stream.

Last-touch: each conversion event (e.g. ``purchase``) is credited to
the most recent preceding touch event (e.g. ``view``/``click``) by the
same user within a lookback window; conversions with no qualifying
touch are credited to ``direct``.

Implementation is a single user-partitioned window pass — the same
shape as sessionization (operators/sessionize.py): ``last(touch,
ignorenulls=True)`` over ``ROWS UNBOUNDED PRECEDING .. 1 PRECEDING``
carries the latest touch forward with O(1) state per user, then a
plain filter applies the lookback bound and one partial-aggregated
groupBy rolls up revenue per touch type.

Scale: one shuffle on user_id (the window), one on touch_type (the
rollup, pre-reduced map-side to #touch_types rows per partition).
No join — the naive formulation (conversions ⋈ touches, per-pair
range predicate, argmax) shuffles the event table twice and its skew
follows the heaviest user; the window form never materializes pairs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def last_touch_attribution(
    events: DataFrame,
    touch_types: Sequence[str] = ("view", "click"),
    conversion_type: str = "purchase",
    lookback_hours: int = 24,
) -> DataFrame:
    """Revenue rollup per attributed touch type.

    Returns (touch_type, conversions, attributed_revenue) where
    ``touch_type`` is one of ``touch_types`` or ``'direct'``; revenue
    is the exact-decimal sum of the conversion events' ``value``.
    Event order within a user is (ts, event_id) — total because
    event_id is unique — so attribution is deterministic even when a
    touch and a conversion share a timestamp (the touch must sort
    strictly before the conversion to receive credit).
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type").isin(list(touch_types)),
        F.struct(F.col("ts").alias("t_ts"), F.col("event_type").alias("t_type")),
    )
    carried = events.withColumn("_touch", F.last(touch, ignorenulls=True).over(w))
    conv = carried.filter(F.col("event_type") == conversion_type)
    attributed = conv.select(
        F.when(
            F.col("_touch").isNotNull()
            & (
                F.unix_micros("ts") - F.unix_micros(F.col("_touch.t_ts"))
                <= lookback_hours * 3_600_000_000
            ),
            F.col("_touch.t_type"),
        )
        .otherwise(F.lit("direct"))
        .alias("touch_type"),
        F.col("value"),
    )
    return (
        attributed.groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("conversions"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("attributed_revenue"),
        )
        .orderBy("touch_type")
    )
