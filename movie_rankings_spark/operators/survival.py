"""Kaplan–Meier survival estimation over per-subject duration data.

Reference parity: the reference engine (ewmiears/Movie-rankings,
top_movies.py) has no survival surface; this extends the statistical-
inference tier (disttests/bootstrap/infotheory) the way a retention
dashboard extends an analytics engine — churn analysis over the same
per-subject event histories the cohort/LTV operators consume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def kaplan_meier(
    subjects: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
) -> DataFrame:
    """Kaplan–Meier product-limit survival curve from a per-subject
    table of (duration, event): ``duration`` is the integral observed
    time (e.g. days from first to last order), ``event`` is 1 when
    the endpoint (churn) was observed and 0 when the subject was
    right-censored at that duration.

    Estimator: with distinct observed durations t₁ < t₂ < …, deaths
    dᵢ and at-risk counts nᵢ = #{duration ≥ tᵢ},

        S(tᵢ) = Π_{j ≤ i, d_j > 0} (n_j − d_j) / n_j

    Censored subjects leave the risk set at their duration but
    contribute no factor (the standard convention: a subject censored
    exactly at tᵢ is still at risk at tᵢ).

    Shape: the per-subject table shuffles ONCE into the
    (duration, Σevent, Σcensored) risk table — bounded by the TIME
    DOMAIN (≤ |days in the dataset span|, never |subjects|) — then
    the cumulative product runs as one codegen'd `aggregate` left
    fold over the duration-sorted struct array, the exp_smooth_daily
    justification: a sequential product is order-dependent, the fold
    makes the order explicit and engine-portable without a
    global-sort window. At 100 TB the per-subject aggregation
    upstream is the only fact-sized stage.

    Exactness: dᵢ, nᵢ are exact longs; each factor is one correctly-
    rounded IEEE division of exactly-representable longs and the
    running product multiplies in explicit ascending-duration order,
    so every survival value is bit-identical to the oracle's
    recursive-CTE replay of the same recurrence.

    Output: one row per duration WITH at least one event —
    duration, n_at_risk, n_events, n_censored, survival — ordered by
    duration.
    """
    steps = (
        subjects.select(
            F.col(duration_col).cast("long").alias("t"),
            F.col(event_col).cast("int").alias("e"),
        )
        .filter(F.col("t").isNotNull() & F.col("e").isNotNull())
        .groupBy("t")
        .agg(
            F.sum("e").cast("long").alias("d"),
            F.sum(1 - F.col("e")).cast("long").alias("c"),
        )
    )
    arr = steps.agg(
        F.sort_array(F.collect_list(F.struct("t", "d", "c"))).alias("a")
    )
    n_total = F.aggregate(
        "a",
        F.lit(0).cast("long"),
        lambda acc, x: acc + x["d"] + x["c"],
    )
    acc_t = (
        "struct<rem:bigint,surv:double,out:array<struct<"
        "t:bigint,d:bigint,c:bigint,at_risk:bigint,survival:double>>>"
    )

    def step(acc, x):
        at_risk = acc["rem"]
        factor = (at_risk - x["d"]).cast("double") / at_risk.cast("double")
        surv = F.when(x["d"] > 0, acc["surv"] * factor).otherwise(
            acc["surv"]
        )
        return F.struct(
            (at_risk - x["d"] - x["c"]).alias("rem"),
            surv.alias("surv"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        x["t"].alias("t"),
                        x["d"].alias("d"),
                        x["c"].alias("c"),
                        at_risk.alias("at_risk"),
                        surv.alias("survival"),
                    )
                ),
            ).alias("out"),
        )

    init = F.struct(
        n_total.alias("rem"),
        F.lit(1.0).alias("surv"),
        F.array().cast(
            "array<struct<t:bigint,d:bigint,c:bigint,"
            "at_risk:bigint,survival:double>>"
        ).alias("out"),
    ).cast(acc_t)
    folded = arr.select(
        F.explode(F.aggregate("a", init, step)["out"]).alias("s")
    ).select("s.*")
    return (
        folded.filter(F.col("d") > 0)
        .select(
            F.col("t").alias("duration"),
            F.col("at_risk").alias("n_at_risk"),
            F.col("d").alias("n_events"),
            F.col("c").alias("n_censored"),
            "survival",
        )
        .orderBy("duration")
    )
