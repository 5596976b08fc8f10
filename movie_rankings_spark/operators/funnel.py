"""Funnel analysis — ordered event-sequence matching over an event log
(the conversion-funnel query of product analytics; [EXT] tier like
SURVEY.md §2g's window analytics, which the reference lacks entirely).

Semantics: a user reaches stage k when an event of stage-k type occurs
STRICTLY AFTER their earliest stage-(k-1) match (the classic
"first-touch" funnel). Each stage is min-ts conditional aggregation +
an equi-join back to the event log; every groupBy and join hashes on
user_id, so the whole funnel is co-partitioned after the first shuffle
(AQE reuses the exchange; with a user_id-bucketed layout there is no
shuffle at all). Stage count is a query constant, so the plan depth is
static — no iteration, no window over the full event history.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stage_times(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap_hours: int | None = None,
) -> DataFrame:
    """Per-user earliest completion time of each reached stage:
    (user, stage_1..stage_N ts columns, nulls once the funnel broke).

    ``max_gap_hours`` adds the conversion-window variant: stage k
    counts only if it happens within that many hours AFTER the first
    stage-(k-1) completion (micro-second-exact bound, same predicate
    in the DuckDB oracle) — the "funnel with a deadline" every
    product-analytics engine ships next to the unbounded one."""
    out = None
    prev = None
    for i, stage in enumerate(stages, start=1):
        matched = events.filter(F.col(type_col) == stage)
        if out is not None:
            matched = matched.join(
                out.select(user_col, F.col(prev).alias("_prev_ts")), user_col
            ).filter(F.col(ts_col) > F.col("_prev_ts"))
            if max_gap_hours is not None:
                matched = matched.filter(
                    F.unix_micros(F.col(ts_col))
                    - F.unix_micros(F.col("_prev_ts"))
                    <= max_gap_hours * 3_600_000_000
                )
        t = matched.groupBy(user_col).agg(F.min(ts_col).alias(f"stage{i}_ts"))
        # each stage's table is read twice (the next stage's gating
        # join AND the running left-join chain) and the chain itself
        # is embedded once per later stage — persist per stage so the
        # events scans stay at one pruned scan per stage instead of
        # O(stages²) re-derivations. The cached frames are per-user
        # stage timestamps, tiny next to events.
        out = t if out is None else out.join(t, user_col, "left")
        out = out.persist_tracked()
        prev = f"stage{i}_ts"
    return out


def funnel_counts(
    events: DataFrame,
    stages: Sequence[str],
    max_gap_hours: int | None = None,
) -> DataFrame:
    """The funnel report: (stage, event_type, n_users) with strictly
    non-increasing counts down the stages."""
    times = funnel_stage_times(events, stages, max_gap_hours=max_gap_hours)
    wide = times.agg(
        *[
            F.count(f"stage{i}_ts").alias(f"c{i}")
            for i in range(1, len(stages) + 1)
        ]
    )
    stack_args = ", ".join(
        f"{i}, '{stage}', c{i}" for i, stage in enumerate(stages, start=1)
    )
    # one aggregate pass + an unpivot, instead of one agg per stage
    return wide.selectExpr(
        f"stack({len(stages)}, {stack_args}) AS (stage, event_type, n_users)"
    ).orderBy("stage")
