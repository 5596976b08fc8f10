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


def position_based_attribution(
    events: DataFrame,
    touch_types: Sequence[str] = ("view", "click"),
    conversion_type: str = "purchase",
    lookback_hours: int = 24,
) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: each
    conversion splits its value over every qualifying touch in the
    lookback window — 100% to a lone touch, 50/50 to a pair, else
    40% first / 40% last / 20% spread over the middles. Conversions
    with no touch credit 'direct'.

    Returns (touch_type, credited_conversions, attributed_revenue):
    fractional conversion credit and revenue, each share rounded to
    DECIMAL(18,6) BEFORE summing so the rollup is order-independent
    and bit-identical to the SQL oracle.

    Scale: unlike last-touch (O(1) window state), multi-touch needs
    the touch SET per conversion. The window frame is
    RANGE-bounded to the lookback interval (micros), so per-row state
    is the touches inside the window — bounded by lookback × event
    rate, NOT user history; the naive conversions⋈touches range join
    would shuffle the event table twice. Within-frame order is made
    total by sorting the collected (ts, event_id) structs, so
    first/last credit is deterministic under timestamp ties."""
    mic = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(mic)
        .rangeBetween(-(lookback_hours * 3_600_000_000), -1)
    )
    touch = F.when(
        F.col("event_type").isin(list(touch_types)),
        F.struct(
            F.unix_micros(F.col("ts")).alias("t_mic"),
            F.col("event_id").alias("t_id"),
            F.col("event_type").alias("t_type"),
        ),
    )
    conv = events.withColumn(
        "_touches", F.array_sort(F.collect_list(touch).over(w))
    ).filter(F.col("event_type") == conversion_type)

    n = F.size("_touches")
    weighted = conv.select(
        F.col("value"),
        F.when(
            n == 0,
            F.array(
                F.struct(
                    F.lit("direct").alias("t_type"), F.lit(1.0).alias("wt")
                )
            ),
        )
        .otherwise(
            F.transform(
                "_touches",
                lambda t, i: F.struct(
                    t["t_type"].alias("t_type"),
                    F.when(n == 1, F.lit(1.0))
                    .when(n == 2, F.lit(0.5))
                    .when((i == 0) | (i == n - 1), F.lit(0.4))
                    .otherwise(F.lit(0.2) / (n - 2).cast("double"))
                    .alias("wt"),
                ),
            )
        )
        .alias("credits"),
    ).select(F.col("value"), F.explode("credits").alias("c"))

    share = (F.col("value") * F.col("c.wt")).cast("decimal(18,6)")
    credit = F.col("c.wt").cast("decimal(18,6)")
    return (
        weighted.groupBy(F.col("c.t_type").alias("touch_type"))
        .agg(
            F.sum(credit).cast("double").alias("credited_conversions"),
            F.sum(share).cast("double").alias("attributed_revenue"),
        )
        .orderBy("touch_type")
    )
