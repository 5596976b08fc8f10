"""Cohort retention — the activity-decay matrix of product analytics
([EXT] event tier alongside operators/funnel.py and sessionize.py).

cohort(user) = date_trunc(first event); a user counts in cell
(cohort, offset) when they performed the retention action in the
period ``offset`` periods after their cohort period.

Shape: two user_id-hashed aggregations (first-seen, distinct activity
periods) + one co-partitioned join + a tiny (cohorts × offsets)
aggregate. The distinct-activity relation is at most users × periods
rows — already collapsed before the join, so the join never sees raw
events. At 100 TB all three hash on user_id and AQE reuses one
exchange; the final matrix is broadcast-size by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohort_retention(
    events: DataFrame,
    period: str = "day",
    action_filter: F.Column | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort, period_offset, n_users) retention matrix. ``period`` is
    a date_trunc unit; ``action_filter`` restricts which events count
    as retention activity (cohort assignment always uses ALL events)."""
    days_per = {"day": 1, "week": 7}[period]
    first_seen = events.groupBy(user_col).agg(
        F.min(F.date_trunc(period, F.col(ts_col))).alias("_cohort")
    )
    acted = events if action_filter is None else events.filter(action_filter)
    activity = acted.select(
        user_col, F.date_trunc(period, F.col(ts_col)).alias("_act")
    ).distinct()
    return (
        first_seen.join(activity, user_col)
        .groupBy(
            F.date_format("_cohort", "yyyy-MM-dd").alias("cohort"),
            (
                F.datediff(F.to_date("_act"), F.to_date("_cohort")) / days_per
            )
            .cast("int")
            .alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort", "period_offset")
    )
