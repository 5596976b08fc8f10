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


def nelson_aalen(
    subjects: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator H(tᵢ) = Σ_{j≤i} d_j/n_j
    over the same (duration, event) contract as kaplan_meier — the
    additive view of the same risk process (S(t) ≈ exp(−H(t))): the
    hazard INCREMENTS d/n are what a churn model reads per period,
    where KM's product only gives the running survival level.

    Shape: one fact-sized shuffle into the time-domain-bounded
    (duration, deaths, censored) risk table; at-risk counts come from
    a SUFFIX sum (descending-duration window over the bounded table)
    instead of KM's fold — no recursion needed because the hazard is
    a running SUM. Exactness: d, n exact longs; each increment d/n
    and d/n² is DYADIC-floor-quantized — ⌊x·2⁴⁰⌋ as a BIGINT
    (multiplying by 2⁴⁰ only shifts the exponent, and FLOOR truncates
    identically everywhere, unlike fixed-scale decimal casts whose
    half-up/half-even rounding diverged between engines on this very
    column) — then the cumulative sums are exact BIGINTs and every
    output is one exact division by 2⁴⁰ (~9·10⁻¹³ resolution).

    Output: one row per duration with ≥ 1 event — duration,
    n_at_risk, n_events, n_censored, hazard_inc, cum_hazard,
    cum_hazard_var — ordered by duration."""
    from pyspark.sql import Window

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
    w_suffix = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = steps.withColumn(
        "n_at_risk", F.sum(F.col("d") + F.col("c")).over(w_suffix)
    )
    nd = F.col("n_at_risk").cast("double")
    sc = F.lit(float(2**40))
    inc_q = F.floor(F.col("d").cast("double") / nd * sc).cast("long")
    vinc_q = F.floor(
        F.col("d").cast("double") / (nd * nd) * sc
    ).cast("long")
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = risk.select(
        "t",
        "d",
        "c",
        "n_at_risk",
        inc_q.alias("_iq"),
        F.sum(inc_q).over(w_cum).cast("long").alias("_hq"),
        F.sum(vinc_q).over(w_cum).cast("long").alias("_vq"),
    )
    return (
        cum.filter(F.col("d") > 0)
        .select(
            F.col("t").alias("duration"),
            "n_at_risk",
            F.col("d").alias("n_events"),
            F.col("c").alias("n_censored"),
            (F.col("_iq").cast("double") / sc).alias("hazard_inc"),
            (F.col("_hq").cast("double") / sc).alias("cum_hazard"),
            (F.col("_vq").cast("double") / sc).alias("cum_hazard_var"),
        )
        .orderBy("duration")
    )


def logrank_test(
    subjects: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    group_ind: "Column | None" = None,
) -> DataFrame:
    """Two-group log-rank test — do the survival curves differ? The
    inference companion to the kaplan_meier/nelson_aalen estimators:
    at every pooled event time the observed group-1 deaths are
    compared with the hypergeometric expectation given the at-risk
    split, O−E accumulates, and χ² = (O₁−E₁)²/V on 1 df.

    ``group_ind`` is a 0/1 integral column (1 = group 1). Shape: ONE
    fact-sized shuffle into the per-(duration, group) death/censor
    cells; per-group at-risk counts via a suffix-sum window
    PARTITIONED by group over the time-domain-bounded cell table; the
    expectation/variance terms are shared IEEE expressions of exact
    longs quantized DECIMAL(18,9)/(18,12) before ONE exact decimal
    sum. Exactness: every input to every float op is an exact BIGINT.

    Output: ONE row — n_1, n_2, observed_1, observed_2, expected_1,
    variance, chi2."""
    from pyspark.sql import Window

    if group_ind is None:
        raise ValueError(
            "group_ind is required: pass a 0/1 integral Column "
            "marking group-1 membership (e.g. F.col('segment') == 'x')"
        )

    cells = (
        subjects.select(
            F.col(duration_col).cast("long").alias("t"),
            F.col(event_col).cast("int").alias("e"),
            group_ind.cast("int").alias("g"),
        )
        .filter(
            F.col("t").isNotNull()
            & F.col("e").isNotNull()
            & F.col("g").isNotNull()
        )
        .groupBy("t", "g")
        .agg(
            F.sum("e").cast("long").alias("d"),
            F.sum(1 - F.col("e")).cast("long").alias("c"),
        )
        .persist_tracked()  # totals + the dense grid read this
    )
    # dense (t, g) grid: a duration where only one group has rows
    # still changes the OTHER group's at-risk suffix, so both group
    # rows must exist at every pooled duration
    ts = cells.select("t").distinct()
    gs = cells.select("g").distinct()
    dense = (
        ts.crossJoin(F.broadcast(gs))
        .join(cells, ["t", "g"], "left")
        .select(
            "t",
            "g",
            F.coalesce(F.col("d"), F.lit(0)).cast("long").alias("d"),
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c"),
        )
    )
    w_suffix = (
        Window.partitionBy("g")
        .orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = dense.withColumn(
        "n_r", F.sum(F.col("d") + F.col("c")).over(w_suffix)
    )
    pooled = risk.groupBy("t").agg(
        F.sum("d").cast("long").alias("d_tot"),
        F.sum("n_r").cast("long").alias("n_tot"),
        F.sum(F.when(F.col("g") == 1, F.col("d")).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum(F.when(F.col("g") == 1, F.col("n_r")).otherwise(0))
        .cast("long")
        .alias("n1"),
    )
    ev = pooled.filter(F.col("d_tot") > 0)
    ntd = F.col("n_tot").cast("double")
    n1d = F.col("n1").cast("double")
    dtd = F.col("d_tot").cast("double")
    e1 = (dtd * n1d / ntd).cast("decimal(18,9)")
    v = F.when(
        F.col("n_tot") > 1,
        (
            dtd
            * (n1d / ntd)
            * ((ntd - n1d) / ntd)
            * ((ntd - dtd) / (ntd - F.lit(1.0)))
        ),
    ).otherwise(F.lit(0.0)).cast("decimal(18,12)")
    terms = ev.agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum("d_tot").cast("long").alias("o_tot"),
        F.sum(e1).cast("decimal(38,9)").alias("e1"),
        F.sum(v).cast("decimal(38,12)").alias("v"),
    )
    sizes = cells.groupBy().agg(
        F.sum(F.when(F.col("g") == 1, F.col("d") + F.col("c")).otherwise(0))
        .cast("long")
        .alias("n_1"),
        F.sum(F.when(F.col("g") == 0, F.col("d") + F.col("c")).otherwise(0))
        .cast("long")
        .alias("n_2"),
    )
    e1d = F.col("e1").cast("double")
    vd = F.col("v").cast("double")
    o1d = F.col("o1").cast("double")
    return sizes.crossJoin(F.broadcast(terms)).select(
        "n_1",
        "n_2",
        F.col("o1").alias("observed_1"),
        (F.col("o_tot") - F.col("o1")).cast("long").alias("observed_2"),
        e1d.alias("expected_1"),
        vd.alias("variance"),
        F.try_divide((o1d - e1d) * (o1d - e1d), vd).alias("chi2"),
    )
