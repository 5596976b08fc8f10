"""Panel causal-inference estimators over event data.

Reference parity: no causal surface exists in the reference
(top_movies.py); this extends the A/B readout (A78, randomized
contrast) with the OBSERVATIONAL workhorse: difference-in-differences
over a two-period user panel — the estimator an analytics engine runs
when treatment was not randomized but a pre-period exists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cuped_contrast(
    panel: DataFrame,
    arm_col: str = "treated",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """CUPED variance-reduced two-arm contrast (Deng et al., WSDM'13):
    adjust the experiment metric Y by the pre-experiment covariate X,

        θ  = cov(X, Y) / var(X)            (pooled, both arms)
        Δ* = (ȳ_T − ȳ_C) − θ·(x̄_T − x̄_C)

    with variance-reduction factor ρ² = corr(X, Y)² — the fraction of
    metric variance the pre-period explains (Var[Δ*] ≈ (1−ρ²)·Var[Δ]).

    Shape: ONE aggregate of the unit panel (arm 0/1, integral x, y)
    producing exact DECIMAL(38,0) moments — pooled n/Σx/Σy/Σx²/Σy²/Σxy
    plus per-arm n/Σx/Σy — with map-side combine; everything after is
    closed-form IEEE arithmetic on one row.

    Exactness: centered sums n·Σxy − Σx·Σy etc. are exact DECIMAL
    differences cast to double once; shared closed form ⇒ value-hash
    exact. Degenerate inputs (empty arm, zero-variance X) yield NULL
    via try_divide, matching the oracle's x/0 → NULL.

    Output: ONE row — n_c, n_t, mean_y_c, mean_y_t, delta_raw, theta,
    delta_cuped, rho2.
    """
    d38 = "decimal(38,0)"
    zero = F.lit(0).cast(d38)
    rows = panel.select(
        F.col(arm_col).cast("int").alias("_t"),
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
    ).filter(
        F.col("_t").isNotNull()
        & F.col("_x").isNotNull()
        & F.col("_y").isNotNull()
    )
    xd = F.col("_x").cast("decimal(19,0)")
    yd = F.col("_y").cast("decimal(19,0)")

    def arm(t, expr):
        return F.sum(
            F.when(F.col("_t") == t, expr).otherwise(zero)
        ).cast(d38)

    m = rows.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(xd).cast(d38).alias("sx"),
        F.sum(yd).cast(d38).alias("sy"),
        F.sum((xd * xd).cast(d38)).cast(d38).alias("sxx"),
        F.sum((yd * yd).cast(d38)).cast(d38).alias("syy"),
        F.sum((xd * yd).cast(d38)).cast(d38).alias("sxy"),
        arm(0, F.lit(1).cast(d38)).alias("n0"),
        arm(1, F.lit(1).cast(d38)).alias("n1"),
        arm(0, xd.cast(d38)).alias("sx0"),
        arm(1, xd.cast(d38)).alias("sx1"),
        arm(0, yd.cast(d38)).alias("sy0"),
        arm(1, yd.cast(d38)).alias("sy1"),
    )
    n = F.col("n")
    cxy = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    cxx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    cyy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    theta = F.try_divide(cxy, cxx)
    rho2 = F.try_divide(cxy * cxy, cxx * cyy)
    n0d, n1d = F.col("n0").cast("double"), F.col("n1").cast("double")
    mean_y_c = F.try_divide(F.col("sy0").cast("double"), n0d)
    mean_y_t = F.try_divide(F.col("sy1").cast("double"), n1d)
    mean_x_c = F.try_divide(F.col("sx0").cast("double"), n0d)
    mean_x_t = F.try_divide(F.col("sx1").cast("double"), n1d)
    delta_raw = mean_y_t - mean_y_c
    delta_cuped = delta_raw - theta * (mean_x_t - mean_x_c)
    return m.select(
        F.col("n0").cast("long").alias("n_c"),
        F.col("n1").cast("long").alias("n_t"),
        mean_y_c.alias("mean_y_c"),
        mean_y_t.alias("mean_y_t"),
        delta_raw.alias("delta_raw"),
        theta.alias("theta"),
        delta_cuped.alias("delta_cuped"),
        rho2.alias("rho2"),
    )


def mantel_haenszel(
    df: DataFrame,
    stratum_col: Column,
    exposed_col: Column,
    outcome_col: Column,
) -> DataFrame:
    """Mantel–Haenszel stratified 2×2 analysis: the common odds ratio

        OR_MH = Σᵢ aᵢdᵢ/nᵢ  /  Σᵢ bᵢcᵢ/nᵢ

    plus the Cochran–Mantel–Haenszel statistic
    (Σaᵢ − ΣEᵢ)²/ΣVᵢ with Eᵢ = r1ᵢc1ᵢ/nᵢ and
    Vᵢ = r1ᵢr0ᵢc1ᵢc0ᵢ/(nᵢ²(nᵢ−1)) — exposure↔outcome association
    adjusted for a confounding stratum, the stratified companion to
    diff_in_diff (which adjusts by differencing, not stratifying).

    Shape: ONE conditional-aggregate fact scan to the per-stratum 2×2
    (a,b,c,d — exact longs, map-side combine), per-stratum terms on
    that bounded table, ONE re-aggregate to a single row.

    Exactness: cross-stratum sums of the double-valued terms would be
    partial-agg-order-dependent, so each per-stratum term is quantized
    to DECIMAL(28,6) first (the psi_feature_drift convention) and the
    decimal sums are exact; the closed forms on the one-row result are
    shared IEEE expressions ⇒ value-hash exact. Degenerate strata
    (n ≤ 1) contribute NULL-as-zero via coalesce, identically in both
    engines.

    Output: ONE row — k_strata, n_total, sum_a, sum_e, sum_v,
    or_mh, cmh_stat.
    """
    e = exposed_col.cast("int")
    o = outcome_col.cast("int")
    rows = df.select(
        stratum_col.alias("_s"), e.alias("_e"), o.alias("_o")
    ).filter(
        F.col("_s").isNotNull()
        & F.col("_e").isNotNull()
        & F.col("_o").isNotNull()
    )

    def cnt(ev, ov):
        w = (F.col("_e") == ev) & (F.col("_o") == ov)
        return F.sum(F.when(w, 1).otherwise(0)).cast("long")

    cells = rows.groupBy("_s").agg(
        cnt(1, 1).alias("a"),
        cnt(1, 0).alias("b"),
        cnt(0, 1).alias("c"),
        cnt(0, 0).alias("d"),
    )
    n = (F.col("a") + F.col("b") + F.col("c") + F.col("d")).cast(
        "double"
    )
    r1 = (F.col("a") + F.col("b")).cast("double")  # exposed total
    r0 = (F.col("c") + F.col("d")).cast("double")
    c1 = (F.col("a") + F.col("c")).cast("double")  # outcome total
    c0 = (F.col("b") + F.col("d")).cast("double")
    q = "decimal(28,6)"
    t_ad = F.try_divide(
        (F.col("a") * F.col("d")).cast("double"), n
    ).cast(q)
    t_bc = F.try_divide(
        (F.col("b") * F.col("c")).cast("double"), n
    ).cast(q)
    t_e = F.try_divide(r1 * c1, n).cast(q)
    t_v = F.try_divide(
        ((r1 * r0) * c1) * c0, (n * n) * (n - F.lit(1.0))
    ).cast(q)
    zero = F.lit(0).cast(q)
    terms = cells.select(
        F.col("a"),
        (F.col("a") + F.col("b") + F.col("c") + F.col("d")).alias("_n"),
        F.coalesce(t_ad, zero).alias("t_ad"),
        F.coalesce(t_bc, zero).alias("t_bc"),
        F.coalesce(t_e, zero).alias("t_e"),
        F.coalesce(t_v, zero).alias("t_v"),
    )
    out = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k_strata"),
        F.sum("_n").cast("long").alias("n_total"),
        F.sum("a").cast("long").alias("sum_a"),
        F.sum("t_ad").cast("decimal(38,6)").alias("_sad"),
        F.sum("t_bc").cast("decimal(38,6)").alias("_sbc"),
        F.sum("t_e").cast("decimal(38,6)").alias("_se"),
        F.sum("t_v").cast("decimal(38,6)").alias("_sv"),
    )
    diff = F.col("sum_a").cast("double") - F.col("_se").cast("double")
    return out.select(
        "k_strata",
        "n_total",
        "sum_a",
        F.col("_se").cast("double").alias("sum_e"),
        F.col("_sv").cast("double").alias("sum_v"),
        F.try_divide(
            F.col("_sad").cast("double"), F.col("_sbc").cast("double")
        ).alias("or_mh"),
        F.try_divide(
            diff * diff, F.col("_sv").cast("double")
        ).alias("cmh_stat"),
    )


def diff_in_diff(
    panel: DataFrame,
    treated_col: str = "treated",
    post_col: str = "post",
    y_col: str = "y",
) -> DataFrame:
    """Two-period, two-group difference-in-differences from a
    user-period panel of (treated 0/1, post 0/1, integral outcome):

        DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre)

    with the large-sample standard error √(Σ_cells s²_cell/n_cell)
    (independent cell means; the classic 2×2 delta-method SE).

    Shape: ONE aggregate of the panel into the four (treated, post)
    cells — exact DECIMAL moments per cell with map-side combine —
    then closed-form IEEE arithmetic on the 4-row table. The panel
    itself is the caller's one-scan groupBy of the fact.

    Exactness: the welch_t_test convention — exact DECIMAL(38,0)
    n/Σy/Σy² per cell, centered sums as exact DECIMAL differences,
    one double cast each, shared closed form ⇒ value-hash exact.

    Output: ONE row — n and mean for each of the four cells
    (n_t_pre, mean_t_pre, …), did, se, z = did/se.
    """
    d38 = "decimal(38,0)"
    vd = F.col("_y").cast("decimal(19,0)")
    zero = F.lit(0).cast(d38)
    rows = panel.select(
        F.col(treated_col).cast("int").alias("_t"),
        F.col(post_col).cast("int").alias("_p"),
        F.col(y_col).cast("long").alias("_y"),
    ).filter(
        F.col("_t").isNotNull()
        & F.col("_p").isNotNull()
        & F.col("_y").isNotNull()
    )

    def cell(t, p, expr):
        w = (F.col("_t") == t) & (F.col("_p") == p)
        return F.sum(F.when(w, expr).otherwise(zero)).cast(d38)

    aggs = []
    for t in (0, 1):
        for p in (0, 1):
            tag = f"{'t' if t else 'c'}_{'post' if p else 'pre'}"
            aggs += [
                cell(t, p, F.lit(1).cast(d38)).alias(f"n_{tag}"),
                cell(t, p, vd.cast(d38)).alias(f"s_{tag}"),
                cell(t, p, (vd * vd).cast(d38)).alias(f"ss_{tag}"),
            ]
    m = rows.agg(*aggs)

    def stats(tag):
        n = F.col(f"n_{tag}")
        mean = F.col(f"s_{tag}").cast("double") / n.cast("double")
        # sample variance of the cell mean: s²/n with exact centered sum
        var_num = (
            n * F.col(f"ss_{tag}") - F.col(f"s_{tag}") * F.col(f"s_{tag}")
        ).cast("double")
        se2 = F.try_divide(
            var_num,
            n.cast("double")
            * (n.cast("double") - F.lit(1.0))
            * n.cast("double"),
        )
        return n.cast("long"), mean, se2

    cols, se2s, means = [], [], {}
    for tag in ("c_pre", "c_post", "t_pre", "t_post"):
        n, mean, se2 = stats(tag)
        means[tag] = mean
        se2s.append(se2)
        cols += [n.alias(f"n_{tag}"), mean.alias(f"mean_{tag}")]
    did = (means["t_post"] - means["t_pre"]) - (
        means["c_post"] - means["c_pre"]
    )
    se = F.sqrt(se2s[0] + se2s[1] + se2s[2] + se2s[3])
    return m.select(
        *cols,
        did.alias("did"),
        se.alias("se"),
        F.try_divide(did, se).alias("z"),  # NULL, not error, on 0-var cells
    )


def ab_equivalence_mde(
    panel: DataFrame,
    arm_col: str = "treated",
    y_col: str = "y",
    margin: int = 500,
) -> DataFrame:
    """Equivalence (TOST) + sensitivity (MDE) readout for a two-arm
    contrast — the two numbers a null A/B result actually needs:

      * TOST (Schuirmann 1987): two one-sided t's against ±margin —
        t_low = (Δ+m)/se, t_high = (Δ−m)/se; "statistically
        equivalent within ±m" iff t_low > 1.645 AND t_high < −1.645
        (one-sided 5 %, large-sample normal critical value);
      * MDE: the minimum true effect an α=5 %/power=80 % two-sided
        test would detect at these ns and variances,
        (1.96 + 0.8416)·se — "what this experiment could have seen".

    Shape/exactness: the welch_t_test moment discipline — ONE
    conditional aggregate to exact DECIMAL (n, Σy, Σy²) per arm,
    closed-form IEEE on one row (z constants are shared literals;
    documented normal approximations) ⇒ value-hash exact. Degenerate
    arms yield NULL via try_divide.

    Output: ONE row — n_c, n_t, mean_c, mean_t, delta, se, t_low,
    t_high, equivalent (within ±margin), mde_abs, mde_rel.
    """
    d38 = "decimal(38,0)"
    zero = F.lit(0).cast(d38)
    rows = panel.select(
        F.col(arm_col).cast("int").alias("_t"),
        F.col(y_col).cast("long").alias("_y"),
    ).filter(F.col("_t").isNotNull() & F.col("_y").isNotNull())
    vd = F.col("_y").cast("decimal(19,0)")

    def arm(t, expr):
        return F.sum(
            F.when(F.col("_t") == t, expr).otherwise(zero)
        ).cast(d38)

    m = rows.agg(
        arm(0, F.lit(1).cast(d38)).alias("n0"),
        arm(1, F.lit(1).cast(d38)).alias("n1"),
        arm(0, vd.cast(d38)).alias("s0"),
        arm(1, vd.cast(d38)).alias("s1"),
        arm(0, (vd * vd).cast(d38)).alias("ss0"),
        arm(1, (vd * vd).cast(d38)).alias("ss1"),
    )
    n0d, n1d = F.col("n0").cast("double"), F.col("n1").cast("double")
    mean0 = F.try_divide(F.col("s0").cast("double"), n0d)
    mean1 = F.try_divide(F.col("s1").cast("double"), n1d)
    var0 = F.try_divide(
        (F.col("n0") * F.col("ss0") - F.col("s0") * F.col("s0")).cast(
            "double"
        ),
        n0d * (n0d - F.lit(1.0)) * n0d,
    )
    var1 = F.try_divide(
        (F.col("n1") * F.col("ss1") - F.col("s1") * F.col("s1")).cast(
            "double"
        ),
        n1d * (n1d - F.lit(1.0)) * n1d,
    )
    se = F.sqrt(var0 + var1)
    delta = mean1 - mean0
    md = F.lit(float(margin))
    t_low = F.try_divide(delta + md, se)
    t_high = F.try_divide(delta - md, se)
    # one-sided z_{0.95}; 1.96/0.8416 = z_{0.975}/z_{0.80} — shared
    # literal normal approximations, documented
    zc = F.lit(1.645)
    mde = (F.lit(1.96) + F.lit(0.8416)) * se
    return m.select(
        F.col("n0").cast("long").alias("n_c"),
        F.col("n1").cast("long").alias("n_t"),
        mean0.alias("mean_c"),
        mean1.alias("mean_t"),
        delta.alias("delta"),
        se.alias("se"),
        t_low.alias("t_low"),
        t_high.alias("t_high"),
        ((t_low > zc) & (t_high < -zc)).alias("equivalent"),
        mde.alias("mde_abs"),
        F.try_divide(mde, mean0).alias("mde_rel"),
    )


def smd_balance(
    df: DataFrame,
    treat_ind: Column,
    covariates: "dict[str, Column]",
) -> DataFrame:
    """Standardized-mean-difference covariate balance table — the
    screen every observational contrast in this tier (DiD, CUPED,
    Mantel–Haenszel) should run FIRST: for each covariate,
    SMD = (mean_T − mean_C)/√((var_T + var_C)/2); |SMD| > 0.1 is the
    conventional imbalance flag that says "stratify or reweight
    before you difference".

    Shape: covariates are STACKED (name, value) via one in-row
    explode, then ONE map-side-combined conditional aggregate per
    covariate name — a single fact pass for the whole table, never a
    pass per covariate. Exactness: the welch_t_test moment contract
    (integral values; n, Σv, Σv² per arm through DECIMAL(38,0));
    means/variances/SMD are shared closed-form IEEE expressions of
    exact integers. Output: one row per covariate — covariate, n_t,
    n_c, mean_t, mean_c, var_t, var_c, smd — ordered by covariate."""
    d38 = "decimal(38,0)"
    names = sorted(covariates)
    stacked = df.select(
        treat_ind.cast("int").alias("_t"),
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(n) for n in names]),
                F.array(
                    *[covariates[n].cast("long") for n in names]
                ),
            )
        ).alias("covariate", "v"),
    ).filter(F.col("_t").isNotNull() & F.col("v").isNotNull())
    vd = F.col("v").cast("decimal(19,0)")
    zero = F.lit(0).cast("decimal(19,0)")
    zero38 = F.lit(0).cast(d38)
    m = stacked.groupBy("covariate").agg(
        F.sum(F.when(F.col("_t") == 1, 1).otherwise(0))
        .cast("long")
        .alias("nt"),
        F.sum(F.when(F.col("_t") == 0, 1).otherwise(0))
        .cast("long")
        .alias("nc"),
        F.sum(F.when(F.col("_t") == 1, vd).otherwise(zero))
        .cast(d38)
        .alias("st"),
        F.sum(F.when(F.col("_t") == 0, vd).otherwise(zero))
        .cast(d38)
        .alias("sc"),
        F.sum(F.when(F.col("_t") == 1, (vd * vd).cast(d38)).otherwise(zero38))
        .cast(d38)
        .alias("sst"),
        F.sum(F.when(F.col("_t") == 0, (vd * vd).cast(d38)).otherwise(zero38))
        .cast(d38)
        .alias("ssc"),
    )
    ntd, ncd = F.col("nt").cast("double"), F.col("nc").cast("double")
    mean_t = F.try_divide(F.col("st").cast("double"), ntd)
    mean_c = F.try_divide(F.col("sc").cast("double"), ncd)
    var_t = F.try_divide(
        (F.col("nt").cast(d38) * F.col("sst") - F.col("st") * F.col("st"))
        .cast("double"),
        ntd * (ntd - F.lit(1.0)),
    )
    var_c = F.try_divide(
        (F.col("nc").cast(d38) * F.col("ssc") - F.col("sc") * F.col("sc"))
        .cast("double"),
        ncd * (ncd - F.lit(1.0)),
    )
    smd = F.try_divide(
        mean_t - mean_c,
        F.sqrt((var_t + var_c) / F.lit(2.0)),
    )
    return m.select(
        "covariate",
        F.col("nt").alias("n_t"),
        F.col("nc").alias("n_c"),
        mean_t.alias("mean_t"),
        mean_c.alias("mean_c"),
        var_t.alias("var_t"),
        var_c.alias("var_c"),
        smd.alias("smd"),
    ).orderBy("covariate")


def mahalanobis_2d(
    df: DataFrame,
    treat_ind: Column,
    cov_a: Column,
    cov_b: Column,
) -> DataFrame:
    """Mahalanobis distance between two group centroids over TWO
    integral covariates — the correlation-aware upgrade of
    smd_balance's per-covariate screen: two covariates can each show
    |SMD| < 0.1 while their JOINT profile separates cleanly (or vice
    versa — a shared correlation inflates marginal SMDs), and D² is
    what the 2-D view reports. Pooled within-group covariance,
    closed-form 2×2 inverse:
    D² = (S_bb·Δa² − 2·S_ab·Δa·Δb + S_aa·Δb²)/(S_aa·S_bb − S_ab²).

    Exactness: ONE conditional moment aggregate (per arm: n, Σa, Σb,
    Σa², Σb², Σab — all exact DECIMAL(38,0)); per-arm (co)variances
    are the shared centered-difference IEEE expressions; pooling and
    the quadratic form are further shared double arithmetic, written
    identically in the oracle. Output: ONE row — n_t, n_c, delta_a,
    delta_b, pooled_var_a, pooled_var_b, pooled_cov_ab, d2, d."""
    d38 = "decimal(38,0)"
    d19 = "decimal(19,0)"
    rows = df.select(
        treat_ind.cast("int").alias("_t"),
        cov_a.cast("long").alias("_a"),
        cov_b.cast("long").alias("_b"),
    ).filter(
        F.col("_t").isNotNull()
        & F.col("_a").isNotNull()
        & F.col("_b").isNotNull()
    )
    ad, bd = F.col("_a").cast(d19), F.col("_b").cast(d19)

    def arm(tag, cond):
        z19 = F.lit(0).cast(d19)
        z38 = F.lit(0).cast(d38)
        return [
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"n{tag}"),
            F.sum(F.when(cond, ad).otherwise(z19)).cast(d38).alias(f"sa{tag}"),
            F.sum(F.when(cond, bd).otherwise(z19)).cast(d38).alias(f"sb{tag}"),
            F.sum(F.when(cond, (ad * ad).cast(d38)).otherwise(z38))
            .cast(d38)
            .alias(f"saa{tag}"),
            F.sum(F.when(cond, (bd * bd).cast(d38)).otherwise(z38))
            .cast(d38)
            .alias(f"sbb{tag}"),
            F.sum(F.when(cond, (ad * bd).cast(d38)).otherwise(z38))
            .cast(d38)
            .alias(f"sab{tag}"),
        ]

    m = rows.agg(
        *arm("t", F.col("_t") == 1), *arm("c", F.col("_t") == 0)
    )

    def moments(tag):
        n = F.col(f"n{tag}").cast("double")
        nd38 = F.col(f"n{tag}").cast(d38)
        mean_a = F.col(f"sa{tag}").cast("double") / n
        mean_b = F.col(f"sb{tag}").cast("double") / n
        den = n * (n - F.lit(1.0))
        var_a = (
            (nd38 * F.col(f"saa{tag}") - F.col(f"sa{tag}") * F.col(f"sa{tag}"))
            .cast("double")
            / den
        )
        var_b = (
            (nd38 * F.col(f"sbb{tag}") - F.col(f"sb{tag}") * F.col(f"sb{tag}"))
            .cast("double")
            / den
        )
        cov = (
            (nd38 * F.col(f"sab{tag}") - F.col(f"sa{tag}") * F.col(f"sb{tag}"))
            .cast("double")
            / den
        )
        return n, mean_a, mean_b, var_a, var_b, cov

    nt, mat, mbt, vat, vbt, cabt = moments("t")
    nc, mac, mbc, vac, vbc, cabc = moments("c")
    wsum = nt + nc - F.lit(2.0)
    p_va = ((nt - F.lit(1.0)) * vat + (nc - F.lit(1.0)) * vac) / wsum
    p_vb = ((nt - F.lit(1.0)) * vbt + (nc - F.lit(1.0)) * vbc) / wsum
    p_cab = ((nt - F.lit(1.0)) * cabt + (nc - F.lit(1.0)) * cabc) / wsum
    da = mat - mac
    db = mbt - mbc
    det = p_va * p_vb - p_cab * p_cab
    d2 = F.try_divide(
        p_vb * da * da - F.lit(2.0) * p_cab * da * db + p_va * db * db,
        det,
    )
    return m.select(
        F.col("nt").alias("n_t"),
        F.col("nc").alias("n_c"),
        da.alias("delta_a"),
        db.alias("delta_b"),
        p_va.alias("pooled_var_a"),
        p_vb.alias("pooled_var_b"),
        p_cab.alias("pooled_cov_ab"),
        d2.alias("d2"),
        F.sqrt(d2).alias("d"),
    )
